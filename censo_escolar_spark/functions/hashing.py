"""Deterministic seeded hash streams for LSH families.

No RNG objects: every constant is a pure function of (seed, index) via
the public splitmix64 mixer, so plans are reproducible across runs,
executors, and Python versions, and nothing stateful is serialized into
tasks.
"""

from __future__ import annotations

import numpy as np


def splitmix64(seed: int, n: int) -> np.ndarray:
    """n 64-bit values from the splitmix64 sequence starting at ``seed``.

    Value i depends only on seed + (i+1)·golden — no loop-carried state —
    so the whole stream vectorizes (~10× over the sequential loop, which
    matters when a decoder calls this per row)."""
    with np.errstate(over="ignore"):
        z = np.uint64(seed) + np.arange(1, n + 1, dtype=np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
