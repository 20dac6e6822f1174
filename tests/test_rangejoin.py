"""Bounded range join edge cases beyond the e05 oracle: boundary
inclusivity, pairs straddling a bucket edge, key isolation, exactly-once
pair emission, and the guard rails."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from censo_escolar_spark.operators.rangejoin import bounded_range_join


def _t(s: float) -> datetime:
    return datetime(2024, 1, 1, 0, 0) + timedelta(seconds=s)


@pytest.fixture()
def sides(spark):
    # window: right_ts in [left_ts - 300, left_ts]
    left = spark.createDataFrame(
        [
            (1, _t(600), "a"),  # window [300, 600]
            (1, _t(1000), "b"),  # window [700, 1000]
            (2, _t(600), "c"),  # other key, same times as "a"
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _t(299.999999), 0.0),  # 1 us before "a" lower bound -> excluded
            (1, _t(300), 1.0),  # exactly on "a" lower bound -> included
            (1, _t(450), 2.0),  # inside "a" (and straddles W=300 bucket edge logic)
            (1, _t(600), 3.0),  # exactly on "a" upper bound -> included
            (1, _t(601), 4.0),  # past "a", before "b" window -> excluded
            (1, _t(700), 5.0),  # on "b" lower bound -> included
            (2, _t(450), 6.0),  # key 2 only
        ],
        "user_id long, rts timestamp, rval double",
    )
    return left, right


def _pairs(left, right):
    out = bounded_range_join(
        left, right, on="user_id", left_ts="ts", right_ts="rts", lower=-300, upper=0
    )
    return sorted((r.tag, r.rval) for r in out.collect())


def test_inclusive_bounds_and_bucket_straddle(spark, sides):
    left, right = sides
    assert _pairs(left, right) == [
        ("a", 1.0),
        ("a", 2.0),
        ("a", 3.0),
        ("b", 5.0),
        ("c", 6.0),
    ]


def test_each_pair_emitted_exactly_once(spark, sides):
    left, right = sides
    pairs = _pairs(left, right)
    assert len(pairs) == len(set(pairs))


def test_key_isolation(spark, sides):
    left, right = sides
    by_tag: dict[str, list[float]] = {}
    for tag, rval in _pairs(left, right):
        by_tag.setdefault(tag, []).append(rval)
    assert by_tag["c"] == [6.0]  # key 2 never sees key 1 rows


def test_bad_bounds_rejected(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="lower < upper"):
        bounded_range_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts", lower=0, upper=0
        )


def test_collision_guard(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collide"):
        bounded_range_join(
            left,
            right.withColumnRenamed("rval", "tag"),
            on="user_id",
            left_ts="ts",
            right_ts="rts",
            lower=-300,
            upper=0,
        )
