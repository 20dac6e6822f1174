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


_M64 = (1 << 64) - 1
_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 over ``data``, SIGNED 64-bit result.

    Bit-identical to Spark's ``xxhash64()`` SQL function on a
    string/binary column at the same seed (Spark's default seed is 42);
    asserted against the JVM implementation over unicode/empty/long
    inputs in tests/test_sketches.py. Lets bounded driver-side key
    lists (partition-prune bucket sets, state-bucket manifests) be
    hashed without a createDataFrame+collect round trip per call —
    each of those is a full tiny Spark job (guide §5: the driver
    should not launch jobs to hash a dozen strings).
    """
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            v1 = (
                _rotl64((v1 + int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            v2 = (
                _rotl64((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            v3 = (
                _rotl64((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            v4 = (
                _rotl64((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = ((h * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl64((int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((_rotl64(h ^ k, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h = (
            (_rotl64(h ^ ((int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64), 23) * _XXP2)
            + _XXP3
        ) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _XXP5) & _M64), 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark-parity xxhash64 of a STRING value (UTF-8 bytes, seed 42)."""
    return xxhash64(s.encode("utf-8"), seed)
