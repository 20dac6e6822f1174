"""Grouped two-phase ranking + stratified sampling + containment pairs.

These operators exist so low-cardinality strata never become
single-task windows; the tests pin exactness against the plain window
formulation on fixtures small enough to compare directly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from censo_escolar_spark.operators import dedup
from censo_escolar_spark.operators.ranking import (
    grouped_row_number,
    stratified_sample,
)


def _strata_df(spark, n=500, n_groups=3):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % n_groups).cast("string").alias("grp"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )


def test_grouped_row_number_matches_plain_window(spark):
    df = _strata_df(spark)
    two_phase = grouped_row_number(
        df, "grp", [F.col("h"), F.col("id")], out_col="rn", num_partitions=7
    )
    w = Window.partitionBy("grp").orderBy("h", "id")
    plain = df.withColumn("rn", F.row_number().over(w).cast("long"))
    cols = ["id", "grp", "rn"]
    assert sorted(two_phase.select(*cols).collect()) == sorted(
        plain.select(*cols).collect()
    )


def test_grouped_row_number_single_partition_and_empty(spark):
    df = _strata_df(spark, n=10)
    one = grouped_row_number(df, "grp", [F.col("id")], num_partitions=1)
    assert one.count() == 10
    empty = grouped_row_number(
        df.filter(F.lit(False)), "grp", [F.col("id")], num_partitions=4
    )
    assert empty.count() == 0


def test_stratified_sample_exact_quota_and_determinism(spark):
    df = _strata_df(spark, n=600, n_groups=4)
    s1 = stratified_sample(df, "grp", [F.col("h"), F.col("id")], quota=25)
    per_group = {
        r["grp"]: r["n"]
        for r in s1.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert per_group == {"0": 25, "1": 25, "2": 25, "3": 25}
    s2 = stratified_sample(df, "grp", [F.col("h"), F.col("id")], quota=25)
    assert sorted(r["id"] for r in s1.collect()) == sorted(
        r["id"] for r in s2.collect()
    )


def test_stratified_sample_quota_above_group_size_keeps_all(spark):
    df = _strata_df(spark, n=30, n_groups=3)
    s = stratified_sample(df, "grp", [F.col("id")], quota=1000)
    assert s.count() == 30


def test_containment_pairs_subset_detection(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            # doc 2 CONTAINS doc 1 plus much more: Jaccard low,
            # containment(1->2) = 1.0
            (2, base + " " + " ".join(f"w{i}" for i in range(40))),
            (3, "completely different words only here now"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.containment_pairs(docs, "doc_id", "text", threshold=0.9)
    rows = {(r["id_a"], r["id_b"]): r for r in pairs.collect()}
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert r["containment_a"] == 1.0 and r["containment_b"] < 0.5
    # the same pair is BELOW a 0.5 Jaccard threshold — the asymmetry
    # containment exists to catch
    j = dedup.jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    assert (1, 2) not in {(r["id_a"], r["id_b"]) for r in j.collect()}


def test_containment_pairs_hot_cut_rescores_exactly(spark):
    rows = [
        (i, "shared common prefix tokens here " + f"unique{i} tail{i}")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = dedup.containment_pairs(docs, "doc_id", "text", threshold=0.5)
    cut = dedup.containment_pairs(
        docs, "doc_id", "text", threshold=0.5, max_doc_freq=100
    )
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, cut.collect())
    )
