"""Edge semantics for merge_intervals (e21) and priority_sample (t27).

Oracle parity at fixture scale is covered by test_oracle_parity; these
tests pin the operator semantics on crafted inputs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from censo_escolar_spark.operators.intervals import merge_intervals
from censo_escolar_spark.operators.sampling import priority_sample

TS = Ty.StructType(
    [
        Ty.StructField("k", Ty.LongType()),
        Ty.StructField("rid", Ty.LongType()),
        Ty.StructField("s", Ty.TimestampNTZType()),
        Ty.StructField("e", Ty.TimestampNTZType()),
    ]
)


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, i, _t(s), _t(e)) for i, (k, s, e) in enumerate(rows)], TS
    )


def _islands(spark, rows):
    df = merge_intervals(_mk(spark, rows), "k", "s", "e", "rid")
    return sorted(
        (r["k"], r["island_start"].minute, r["island_end"].minute, r["n_rows"])
        for r in df.collect()
    )


def test_overlap_and_touching_merge(spark):
    # [0,10] overlaps [5,15]; [15,20] touches (end==start) -> one island
    assert _islands(spark, [(1, 0, 10), (1, 5, 15), (1, 15, 20)]) == [
        (1, 0, 20, 3)
    ]


def test_disjoint_split(spark):
    assert _islands(spark, [(1, 0, 5), (1, 6, 8)]) == [(1, 0, 5, 1), (1, 6, 8, 1)]


def test_nested_interval_absorbed(spark):
    # [0,30] swallows [5,10] and bridges to [25,40]
    assert _islands(spark, [(1, 0, 30), (1, 5, 10), (1, 25, 40)]) == [
        (1, 0, 40, 3)
    ]


def test_duplicate_intervals_one_island(spark):
    assert _islands(spark, [(1, 3, 7), (1, 3, 7), (1, 3, 7)]) == [(1, 3, 7, 3)]


def test_keys_independent(spark):
    assert _islands(spark, [(1, 0, 10), (2, 5, 15)]) == [
        (1, 0, 10, 1),
        (2, 5, 15, 1),
    ]


def test_out_of_order_input_same_islands(spark):
    rows = [(1, 25, 40), (1, 5, 10), (1, 0, 30), (1, 50, 55)]
    assert _islands(spark, rows) == [(1, 0, 40, 3), (1, 50, 55, 1)]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "stratum string, id long, w long")


def test_priority_sample_deterministic_and_partition_invariant(spark):
    rows = [("a", i, (i % 7) + 1) for i in range(200)]
    df = _docs(spark, rows)
    got1 = sorted(
        (r["id"], r["rank"])
        for r in priority_sample(
            df, stratum_col="stratum", id_col="id", weight_col="w", k=20
        ).collect()
    )
    got2 = sorted(
        (r["id"], r["rank"])
        for r in priority_sample(
            df.repartition(7), stratum_col="stratum", id_col="id", weight_col="w", k=20
        ).collect()
    )
    assert got1 == got2
    assert len(got1) == 20
    assert sorted(rank for _, rank in got1) == list(range(1, 21))


def test_priority_sample_heavy_row_always_in(spark):
    # one row a million times heavier than the rest: priority w/u with
    # u <= 1 means its priority >= 1e6 > any light row's max (7/u_min
    # is unbounded in theory but u is bounded below by 1/2^52 only for
    # OTHER hashes; practically the heavy row wins any k>=1 draw here)
    rows = [("a", i, 7) for i in range(100)] + [("a", 999, 7_000_000_000)]
    got = {
        r["id"]
        for r in priority_sample(
            _docs(spark, rows), stratum_col="stratum", id_col="id", weight_col="w", k=5
        ).collect()
    }
    assert 999 in got


def test_priority_sample_weight_bias(spark):
    # two strata with identical ids: heavy weights (x100) must select a
    # (mostly) different, heavier-biased set than uniform weights
    light = [("u", i, 1) for i in range(400)]
    heavy = [("h", i, 100 if i < 40 else 1) for i in range(400)]
    df = _docs(spark, light + heavy)
    picked = priority_sample(
        df, stratum_col="stratum", id_col="id", weight_col="w", k=30
    )
    h_sel = [r["id"] for r in picked.filter(F.col("stratum") == "h").collect()]
    # of the 30 drawn from stratum h, most should be among the 40 heavy ids
    assert sum(1 for i in h_sel if i < 40) >= 20


def test_priority_sample_drops_nonpositive_weights(spark):
    rows = [("a", 1, 10), ("a", 2, 0), ("a", 3, None)]
    got = {
        r["id"]
        for r in priority_sample(
            _docs(spark, rows), stratum_col="stratum", id_col="id", weight_col="w", k=10
        ).collect()
    }
    assert got == {1}
