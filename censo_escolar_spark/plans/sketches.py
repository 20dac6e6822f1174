"""Mergeable-sketch aggregates (Apache DataSketches via Spark 4 built-ins).

The OLAP-engine capability the reference's stack gets from Druid/Trino
sketch extensions: pre-aggregable APPROXIMATE distinct counts and
quantiles whose per-group state can be stored, merged across partitions
/ days / shards, and re-estimated — the only shape that works at 100 TB
(exact distinct/quantile over raw data would reshuffle the full fact
table every query; sketches reduce each partition to KB-sized state).

Both queries deliberately run the TWO-LEVEL form — partial sketches per
fine group, then a sketch-merge rollup to the coarse group — because
the merge step is the whole point (it is what a materialized daily
rollup replays at query time).

Oracle note: at grading scale the sketches are in their EXACT regimes
(HLL in coupon/list-set mode — empirically exact through the low
thousands of distincts per group, with ±1 coupon-collision drift
appearing around ~7k regardless of lgK; a KLL with k buffer holds
every item while n ≤ k), so the estimates hash-match exact SQL
answers; beyond those sizes they degrade to the published error
bounds (HLL ±1.04/√(2^lgK); KLL ~1.7%/√k rank error) — documented
here rather than hidden. Group granularities are chosen so the exact
regime holds through sf0.1 (10× grading scale) with margin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.plans.registry import register
from censo_escolar_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# q60 — HLL distinct-customer rollup: per-(nation, segment) partial HLL
# sketches union-merged to per-nation estimates. lgK=14 keeps the
# sketch in its exact (coupon) regime through the low thousands of
# distincts per group (measured: ±1 drift appears around ~7k — the
# coupon store is itself a hash set); per-nation groups here are ≤600
# at sf0.1. 16 KB/group worst-case at 100 TB — the mergeable-rollup
# sweet spot.
# ---------------------------------------------------------------------------
@register(
    "q60_hll_distinct",
    oracle="""
    SELECT n_name,
      CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
      CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q60_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    partials = j.groupBy("n_name", "c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sk")
    )
    return (
        partials.groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")))
            .cast("bigint")
            .alias("n_customers"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q61 — KLL quantile rollup: per-(nation, segment) partial KLL sketches
# of account balances, merged per nation, then median + p90 + rank of 0
# read from the merged sketch. k=2000 holds every item exactly up to
# 2000 rows/group (grading scale ≤600); beyond that the KLL bound
# (~1.7%/√k normalized rank error) takes over. The merge is the
# production path: daily per-shard sketches roll up without re-reading
# the raw column.
# ---------------------------------------------------------------------------
@register(
    "q61_kll_quantiles",
    oracle="""
    SELECT n_name,
      quantile_disc(c_acctbal, 0.5) AS median_acctbal,
      quantile_disc(c_acctbal, 0.9) AS p90_acctbal,
      CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q61_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    partials = j.groupBy("n_name", "c_mktsegment").agg(
        F.kll_sketch_agg_double("c_acctbal", F.lit(2000)).alias("sk"),
        F.count("*").cast("bigint").alias("n"),
    )
    # kll_sketch_merge_double is a binary scalar (no union-agg built-in):
    # collect the per-segment partials (a handful of KB blobs per nation)
    # and fold them — the same pairwise merge a rollup job would run.
    merged = partials.groupBy("n_name").agg(
        F.collect_list("sk").alias("sks"),
        F.sum("n").cast("bigint").alias("n_customers"),
    ).select(
        "n_name",
        "n_customers",
        F.expr(
            "aggregate(slice(sks, 2, greatest(size(sks) - 1, 0)),"
            " element_at(sks, 1),"
            " (acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("sk"),
    )
    return merged.select(
        "n_name",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias(
            "median_acctbal"
        ),
        F.expr("kll_sketch_get_quantile_double(sk, 0.9)").alias(
            "p90_acctbal"
        ),
        "n_customers",
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# q69 — sketch set algebra: customer-audience overlap between URGENT
# and HIGH priority orders, per customer nation, via inclusion–
# exclusion on HLL sketches (|A∩B| = |A| + |B| − |A∪B|). The
# audience-overlap / cross-device reach primitive: per-arm sketches
# are built in ONE conditional-aggregation scan, can be stored per day
# and merged later, and never reshuffle raw ids to answer an
# intersection. Granularity is chosen for the exactness contract: HLL
# set-mode is a coupon HASH set, so "estimate == exact" only holds to
# ~low thousands of distincts per arm regardless of lgK (empirically
# ±1 drift appears by ~7k even at lgK=21); per-nation arms stay in the
# low hundreds at sf0.1, with the ±1.04/√2^14 bound taking over
# beyond. The inclusion–exclusion caveat stands at any scale: relative
# error grows with |A∪B|/|A∩B|.
# ---------------------------------------------------------------------------
@register(
    "q69_hll_overlap",
    oracle="""
    WITH j AS (
      SELECT n.n_name, o.o_orderpriority, o.o_custkey
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name,
      CAST(COUNT(DISTINCT o_custkey)
           FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
      CAST(COUNT(DISTINCT o_custkey)
           FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
      CAST(COUNT(DISTINCT o_custkey)
           FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS BIGINT) AS n_union,
      CAST(COUNT(DISTINCT o_custkey)
             FILTER (WHERE o_orderpriority = '1-URGENT')
           + COUNT(DISTINCT o_custkey)
             FILTER (WHERE o_orderpriority = '2-HIGH')
           - COUNT(DISTINCT o_custkey)
             FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS BIGINT) AS n_overlap
    FROM j
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q69_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    j = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    )
    urgent = F.col("o_orderpriority") == "1-URGENT"
    high = F.col("o_orderpriority") == "2-HIGH"
    sk = j.groupBy("n_name").agg(
        F.hll_sketch_agg(F.when(urgent, F.col("o_custkey")), F.lit(14)).alias("sk_u"),
        F.hll_sketch_agg(F.when(high, F.col("o_custkey")), F.lit(14)).alias("sk_h"),
        F.hll_sketch_agg(
            F.when(urgent | high, F.col("o_custkey")), F.lit(14)
        ).alias("sk_uh"),
    )

    # an arm with zero rows aggregates to a NULL sketch; its distinct
    # count is 0 (DuckDB's COUNT DISTINCT FILTER convention)
    def est(c):
        return F.coalesce(
            F.round(F.hll_sketch_estimate(c)).cast("bigint"), F.lit(0).cast("bigint")
        )

    n_u = est("sk_u")
    n_h = est("sk_h")
    n_union = est("sk_uh")
    return sk.select(
        F.col("n_name"),
        n_u.alias("n_urgent"),
        n_h.alias("n_high"),
        n_union.alias("n_union"),
        (n_u + n_h - n_union).alias("n_overlap"),
    ).orderBy("n_name")
