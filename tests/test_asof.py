"""as-of join edge cases beyond the e04 oracle: ties, unmatched left
rows, multi-column keys, and the collision guard."""

from __future__ import annotations

from datetime import datetime

import pytest

from censo_escolar_spark.operators.asof import asof_join


def _t(m):
    return datetime(2024, 1, 1, 12, m)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _t(10), "c1"),   # matches r@10 (tie, inclusive)
            (1, _t(15), "c2"),   # matches r@12 (latest <= 15)
            (1, _t(1), "c3"),    # before any right row -> NULL
            (2, _t(30), "c4"),   # key with no right rows at all -> NULL
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t(5), 50.0), (1, _t(10), 100.0), (1, _t(12), 120.0), (1, _t(20), 200.0)],
        "user_id long, rts timestamp, rval double",
    )
    return left, right


def test_backward_asof_semantics(spark, sides):
    left, right = sides
    out = {
        r.tag: (r.rts, r.rval)
        for r in asof_join(left, right, on="user_id", left_ts="ts", right_ts="rts").collect()
    }
    assert out["c1"] == (_t(10), 100.0)  # tie at equal ts matches
    assert out["c2"] == (_t(12), 120.0)  # latest prior, not first
    assert out["c3"] == (None, None)     # nothing at-or-before
    assert out["c4"] == (None, None)     # key absent on right
    assert len(out) == 4                 # left join: every left row kept


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [("a", 1, _t(10)), ("b", 1, _t(10))], "k1 string, k2 long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", 1, _t(5), 1.0), ("b", 1, _t(6), 2.0), ("a", 2, _t(7), 3.0)],
        "k1 string, k2 long, rts timestamp, rval double",
    )
    out = {
        (r.k1, r.k2): r.rval
        for r in asof_join(
            left, right, on=["k1", "k2"], left_ts="ts", right_ts="rts"
        ).collect()
    }
    assert out == {("a", 1): 1.0, ("b", 1): 2.0}  # (a,2) never leaks across keys


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL ts must be invisible: DuckDB/pandas ASOF
    (l.ts >= r.ts) never matches NULL. Regression: NULLS-FIRST ordering
    used to carry the NULL row's payload onto left rows preceding all
    real right rows."""
    left = spark.createDataFrame(
        [(1, _t(3), "early"), (1, _t(15), "late")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, 666.0), (1, _t(10), 100.0)],
        "user_id long, rts timestamp, rval double",
    )
    out = {
        r.tag: (r.rts, r.rval)
        for r in asof_join(left, right, on="user_id", left_ts="ts", right_ts="rts").collect()
    }
    assert out["early"] == (None, None)   # NOT the NULL-ts row's 666.0
    assert out["late"] == (_t(10), 100.0)


def test_asof_null_left_ts_gets_no_match(spark):
    left = spark.createDataFrame(
        [(1, None, "nul")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _t(5), 50.0)], "user_id long, rts timestamp, rval double"
    )
    row = asof_join(left, right, on="user_id", left_ts="ts", right_ts="rts").first()
    assert (row.rts, row.rval) == (None, None)


def test_asof_collision_guard(spark, sides):
    left, right = sides
    bad_right = right.withColumnRenamed("rval", "tag")  # collides with left
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, bad_right, on="user_id", left_ts="ts", right_ts="rts")


def test_tolerance_bounds_lookback(spark):
    from censo_escolar_spark.operators.asof import asof_join
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (2, "2024-01-20 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-08 00:00:00", "recent"), (2, "2024-01-01 00:00:00", "stale")],
        "id long, rts string, tag string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = {
        r.id: r.tag
        for r in asof_join(
            left, right, on="id", left_ts="ts", right_ts="rts", tolerance="7 days"
        ).collect()
    }
    assert out[1] == "recent"      # 2 days back: inside the window
    assert out[2] is None          # 19 days back: stale -> no match


def test_tolerance_none_keeps_unbounded(spark):
    from censo_escolar_spark.operators.asof import asof_join
    import pyspark.sql.functions as F

    left = spark.createDataFrame([(1, "2024-01-20 00:00:00")], "id long, ts string")
    left = left.withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2023-01-01 00:00:00", "ancient")], "id long, rts string, tag string"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    row = asof_join(left, right, on="id", left_ts="ts", right_ts="rts").collect()[0]
    assert row.tag == "ancient"


# ---------------------------------------------------------------------------
# point_in_time_join (SCD2 lookup on the as-of plan)
# ---------------------------------------------------------------------------
def _pit_dim(spark):
    rows = [
        # contiguous history for key 1
        (1, "v1", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
        (1, "v2", "2024-01-10 00:00:00", None),
        # GAPPED history for key 2: nothing valid in [01-05, 01-20)
        (2, "w1", "2024-01-01 00:00:00", "2024-01-05 00:00:00"),
        (2, "w2", "2024-01-20 00:00:00", None),
        # key 3: empty interval at the same instant a real one starts
        (3, "dead", "2024-01-02 00:00:00", "2024-01-02 00:00:00"),
        (3, "live", "2024-01-02 00:00:00", None),
    ]
    import pyspark.sql.functions as F

    return (
        spark.createDataFrame(
            rows, "id long, ver string, valid_from string, valid_to string"
        )
        .withColumn("valid_from", F.col("valid_from").cast("timestamp"))
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    )


def _pit_facts(spark, rows):
    import pyspark.sql.functions as F

    return spark.createDataFrame(rows, "fid long, id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_point_in_time_basic_and_boundaries(spark):
    from censo_escolar_spark.operators.asof import point_in_time_join

    facts = _pit_facts(
        spark,
        [
            (1, 1, "2024-01-05 00:00:00"),  # inside v1
            (2, 1, "2024-01-10 00:00:00"),  # boundary: [from, to) -> v2
            (3, 1, "2024-02-01 00:00:00"),  # open-ended current -> v2
        ],
    )
    out = {
        r.fid: r.ver
        for r in point_in_time_join(
            facts, _pit_dim(spark), on="id", ts_col="ts"
        ).collect()
    }
    assert out == {1: "v1", 2: "v2", 3: "v2"}


def test_point_in_time_gap_yields_null(spark):
    from censo_escolar_spark.operators.asof import point_in_time_join

    facts = _pit_facts(spark, [(1, 2, "2024-01-07 00:00:00")])
    row = point_in_time_join(
        facts, _pit_dim(spark), on="id", ts_col="ts"
    ).collect()[0]
    assert row.ver is None and row.valid_from is None


def test_point_in_time_empty_interval_never_matches(spark):
    from censo_escolar_spark.operators.asof import point_in_time_join

    facts = _pit_facts(spark, [(1, 3, "2024-01-02 00:00:00")])
    row = point_in_time_join(
        facts, _pit_dim(spark), on="id", ts_col="ts"
    ).collect()[0]
    assert row.ver == "live"


def test_point_in_time_before_first_version(spark):
    from censo_escolar_spark.operators.asof import point_in_time_join

    facts = _pit_facts(spark, [(1, 1, "2023-12-01 00:00:00")])
    row = point_in_time_join(
        facts, _pit_dim(spark), on="id", ts_col="ts"
    ).collect()[0]
    assert row.ver is None
