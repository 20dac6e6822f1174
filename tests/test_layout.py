"""Z-order layout: Morton values and file-level clustering quality."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.sources.layout import write_zordered, zorder_value


def test_morton_values_2bit_grid(spark):
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_value(["x", "y"], bits=2).alias("z")).collect()
    }
    # canonical Morton codes: x bits land in even positions, y in odd
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(2, 0)] == 4
    assert got[(2, 2)] == 12
    assert got[(3, 3)] == 15


def test_zorder_value_masks_to_bits(spark):
    df = spark.createDataFrame([(257, 1)], "x int, y int")
    # x masked to 8 bits -> 1
    z = df.select(zorder_value(["x", "y"], bits=8).alias("z")).first().z
    assert z == 0b11  # x bit0 at pos0, y bit0 at pos1


def test_zorder_value_rejects_overflow(spark):
    with pytest.raises(ValueError):
        zorder_value(["a", "b", "c", "d"], bits=16)


def test_zordered_write_skips_files_on_both_columns(spark, tmp_path):
    # The point of z-order: file min/max stats prune on EVERY clustered
    # column. On a 64x64 grid in 4 z-range files, a corner predicate on x
    # OR on y must skip files; a single-column x-sort would bound only x
    # (every file spans all of y). A file may straddle one top-level
    # z-boundary (sampled range bounds), so we assert pruning counts,
    # not per-file spans.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int")
    path = str(tmp_path / "zordered")
    write_zordered(df, path, ["x", "y"], bits=6, n_files=4)
    assert glob.glob(os.path.join(path, "part-*.parquet"))

    stats = (
        spark.read.parquet(path)
        .withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(
            F.min("x").alias("xmin"), F.max("x").alias("xmax"),
            F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        )
        .collect()
    )
    assert len(stats) == 4

    def files_matching(lo, hi, mn, mx):
        return sum(1 for r in stats if r[mx] >= lo and r[mn] <= hi)

    # Every corner predicate must skip at least one file in BOTH
    # dimensions — impossible for a single-column sort (its unsorted
    # dimension spans 0..63 in every file: 4/4 match). Ideal quadrants
    # give 2; one file may straddle a top-level z-boundary, giving 3.
    preds = [
        files_matching(0, 7, "xmin", "xmax"),
        files_matching(56, 63, "xmin", "xmax"),
        files_matching(0, 7, "ymin", "ymax"),
        files_matching(56, 63, "ymin", "ymax"),
    ]
    assert all(p <= 3 for p in preds), preds
    assert sum(preds) <= 10, preds
