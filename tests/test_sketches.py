"""Sketch aggregates beyond the exact regime (q60/q61 cover exactness).

The oracle queries run where HLL/KLL are exact; these tests pin the
APPROXIMATE regime: published error bounds hold, and partial sketches
merged across partitions estimate the same population as one global
sketch (the mergeable-rollup property that makes them usable at scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_error_bound_beyond_exact_mode(spark):
    # 200k distincts >> exact-mode capacity at lgK=12; bound is
    # 1.04/sqrt(2^12) ~ 1.6% rsd — assert 3 sigma
    df = spark.range(200_000)
    est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert abs(est - 200_000) / 200_000 < 0.05


def test_hll_partials_union_equals_global(spark):
    df = spark.range(100_000).withColumn("part", F.col("id") % 16)
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    merged = (
        df.groupBy("part")
        .agg(F.hll_sketch_agg("id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    # identical input set -> identical sketch state regardless of
    # partial/merge structure (HLL registers are max-merged)
    assert merged == direct


def test_hll_overlapping_partials_dedupe(spark):
    # union of two sketches over OVERLAPPING halves counts each id once
    a = spark.range(0, 60_000)
    b = spark.range(30_000, 90_000)
    ska = a.agg(F.hll_sketch_agg("id", F.lit(12)).alias("sk"))
    skb = b.agg(F.hll_sketch_agg("id", F.lit(12)).alias("sk"))
    est = (
        ska.unionByName(skb)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - 90_000) / 90_000 < 0.05


def test_kll_rank_error_beyond_buffer(spark):
    # 100k uniform values with k=200: normalized rank error ~1.7%/sqrt
    # regime — median must land within a few percent of true rank 0.5
    df = spark.range(100_000).select(F.col("id").cast("double").alias("v"))
    med = df.agg(
        F.expr(
            "kll_sketch_get_quantile_double("
            "kll_sketch_agg_double(v, 200), 0.5)"
        ).alias("m")
    ).collect()[0]["m"]
    assert abs(med - 50_000) / 100_000 < 0.05


def test_kll_merge_estimates_population(spark):
    df = spark.range(50_000).select(
        (F.col("id") % 10).alias("part"), F.col("id").cast("double").alias("v")
    )
    partials = df.groupBy("part").agg(
        F.kll_sketch_agg_double("v", F.lit(200)).alias("sk")
    )
    merged_med = partials.agg(F.collect_list("sk").alias("sks")).select(
        F.expr(
            "kll_sketch_get_quantile_double("
            "aggregate(slice(sks, 2, greatest(size(sks) - 1, 0)),"
            " element_at(sks, 1),"
            " (acc, x) -> kll_sketch_merge_double(acc, x)), 0.5)"
        ).alias("m")
    ).collect()[0]["m"]
    assert abs(merged_med - 25_000) / 50_000 < 0.05


def test_python_xxhash64_matches_spark(spark):
    """The driver-side XXH64 (functions/hashing.xxhash64_str) must be
    bit-identical to Spark's xxhash64() on strings at the default seed
    42 — it replaces a per-probe createDataFrame+collect in the lexical
    index's partition-prune bucket computation, so a mismatch would
    silently prune the WRONG buckets (missing postings, not an error)."""
    from censo_escolar_spark.functions.hashing import xxhash64_str
    from censo_escolar_spark.streaming.dedup import N_BUCKETS

    cases = [
        "",
        "a",
        "the",
        "censo",
        "ação-escolar",  # multi-byte UTF-8
        "日本語のテキスト",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "v" * 33,
        "mixed × unicode ∑ tail" + "t" * 100,
    ]
    rows = (
        spark.createDataFrame([(s,) for s in cases], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert xxhash64_str(r["s"]) == r["h"], r["s"]
        assert xxhash64_str(r["s"]) % N_BUCKETS == (r["h"] % N_BUCKETS)
