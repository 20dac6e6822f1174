"""Deterministic seeded hash streams for LSH families.

No RNG objects: every constant is a pure function of (seed, index) via
the public splitmix64 mixer, so plans are reproducible across runs,
executors, and Python versions, and nothing stateful is serialized into
tasks.
"""

from __future__ import annotations

import numpy as np


def splitmix64(seed: int, n: int) -> np.ndarray:
    """n 64-bit values from the splitmix64 sequence starting at ``seed``."""
    out = np.empty(n, dtype=np.uint64)
    x = np.uint64(seed)
    with np.errstate(over="ignore"):
        for i in range(n):
            x = x + np.uint64(0x9E3779B97F4A7C15)
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = z ^ (z >> np.uint64(31))
    return out
