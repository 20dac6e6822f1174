"""Perceptual-hash operators (operators/multimodal.phash64/phash_pairs):
exact-integer DCT sign bits cross-checked against an independent numpy
implementation; pigeonhole band join recall/precision on crafted images."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.operators import multimodal as M


def _np_phash(pixels64: np.ndarray) -> int:
    """Independent reference: same fixed integer DCT basis, pure numpy."""
    t = np.array(M.DCT8, dtype=np.int64)  # (u, x)
    img = pixels64.reshape(8, 8).astype(np.int64)  # (y, x)
    coef = t @ img.T @ t.T  # C[u, v] = sum_x sum_y T[u,x] * p[y,x] * T[v,y]
    h = 0
    for u in range(8):
        for v in range(8):
            if (u, v) == (0, 0):
                continue
            if coef[u, v] > 0:
                h |= 1 << (u * 8 + v - 1)
    return h


def _decoded_df(spark, rows):
    return spark.createDataFrame(
        [(i, 8, 8, [int(p) for p in px]) for i, px in rows],
        "id long, h int, w int, pixels array<long>",
    )


def test_phash_matches_numpy_reference(spark):
    rng = np.random.default_rng(42)
    rows = [(i, rng.integers(0, 256, 64)) for i in range(5)]
    got = {r.id: r.phash for r in M.phash64(_decoded_df(spark, rows)).collect()}
    for i, px in rows:
        assert got[i] == _np_phash(px), f"doc {i}"
        assert got[i] > 0  # 63-bit pack stays positive


def test_phash_small_edit_small_hamming(spark):
    """pHash's defining property: a small pixel edit flips few sign
    bits; an unrelated image differs in ~half. Verified against the
    numpy reference so the thresholds aren't luck."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, 64)
    edited = base.copy()
    edited[27] = (int(edited[27]) + 8) % 256  # one-pixel nudge
    other = rng.integers(0, 256, 64)
    h = {r.id: r.phash for r in M.phash64(
        _decoded_df(spark, [(0, base), (1, edited), (2, other)])
    ).collect()}
    d_edit = bin(h[0] ^ h[1]).count("1")
    d_other = bin(h[0] ^ h[2]).count("1")
    assert d_edit == bin(_np_phash(base) ^ _np_phash(edited)).count("1")
    assert d_edit < d_other
    assert d_other > 15  # uncorrelated images: ~31 expected


def test_phash_pairs_pigeonhole_recall_and_precision(spark):
    """Every pair within max_hamming=3 is found (pigeonhole over 4
    bands is exact), nothing beyond it survives verification."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, 64)
    rows = [(0, base), (1, base.copy()), (2, rng.integers(0, 256, 64))]
    hashes = M.phash64(_decoded_df(spark, rows)).localCheckpoint(eager=True)
    pairs = {(r.id_a, r.id_b): r.hamming for r in M.phash_pairs(hashes, "id").collect()}
    assert pairs.get((0, 1)) == 0  # identical images: hamming 0, found
    assert all(h <= 3 for h in pairs.values())
    hs = {r.id: r.phash for r in hashes.collect()}
    assert bin(hs[0] ^ hs[2]).count("1") > 3  # and the far pair was excluded


def test_phash_pairs_requires_pigeonhole_margin(spark):
    hashes = _decoded_df(spark, []).sparkSession.createDataFrame(
        [], "id long, phash long"
    )
    with pytest.raises(AssertionError, match="pigeonhole"):
        M.phash_pairs(hashes, "id", max_hamming=4, n_bands=4)


def test_phash_partitioning_invariance(spark):
    rng = np.random.default_rng(11)
    rows = [(i, rng.integers(0, 256, 64)) for i in range(12)]
    df = _decoded_df(spark, rows)
    a = {r.id: r.phash for r in M.phash64(df.repartition(1)).collect()}
    b = {r.id: r.phash for r in M.phash64(df.repartition(7, "id")).collect()}
    assert a == b  # exact integer DCT: no fold-order dependence
