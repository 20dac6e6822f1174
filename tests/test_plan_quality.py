"""Physical-plan quality gates — the properties that make these plans
survive a 100 TB / 1000-executor scale-up, asserted so a refactor can't
silently regress them:

- predicate pushdown + column pruning reach the parquet scan;
- dimension joins broadcast (no shuffle of the fact side);
- the relational/text hot paths contain NO Python eval nodes — every
  expression stays inside whole-stage codegen (the allowed exceptions
  are the deliberately Arrow-batched operators: GEMM cosine, minhash
  signatures, IVF assignment, media decode).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

#: Queries allowed to cross into Python (Arrow-vectorized by design).
ARROW_OK = {
    "d03_minhash_lsh_pairs",
    "d04_simhash_fingerprints",
    "d05_simhash_pairs",
    "m02_image_features",
    "m03_frame_samples",  # per-frame decode via mapInPandas
    "s02_cosine_pairs",
    "s03_lsh_bucketed_pairs",
    "s04_ivf_topk",
    "s05_ivf_bucketed_pairs",  # ivf_assign GEMM + _verify_exact prescore
    "s10_pq_topk",  # PQ encode GEMM + ADC table-lookup scan
    "s13_ivfpq_topk",  # IVF assign + PQ encode GEMMs + ADC gather
    "s07_cluster_profile",  # ivf_assign GEMM against fixed centroids
    "t16_lang_zscores",  # grouped-map applyInPandas standardization
    "t03_fingerprints",
    "s15_knn_join",  # blocked-GEMM candidate pass (cosine_pairs shape)
    "s17_ivf_knn_join",  # ivf_assign + probe GEMMs (s04 shape, corpus-wide)
    "m09_perceptual_hash",  # Arrow decode + in-Arrow exact-int64 DCT pack
    # (m10 reuses the same decode but behind an eager checkpoint, so its
    # final plan has no Python boundary to allowlist)
}


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _iter_physical_nodes(jplan):
    """Depth-first walk of a JVM SparkPlan tree (pre-AQE, so Window nodes
    are directly visible, not hidden inside AdaptiveSparkPlan)."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_plan_quality_gates(spark, sf_dir, name):
    """ONE registry sweep asserting all three per-query plan gates on a
    SINGLE DataFrame build — building a query is the expensive part for
    the fixture-backed parity rows (a build replays live batch applies),
    so the previously separate Python-boundary / unpartitioned-window /
    nested-loop sweeps tripled that cost for no extra coverage
    (round-12 pytest-wall-time fix; assertions unchanged).

    Gate 1 — Python boundary: row-at-a-time Python UDFs
    (BatchEvalPython) are banned everywhere; Arrow nodes only in the
    operators designed around them (ARROW_OK).

    Gate 2 — unpartitioned window: a Window with an empty partitionSpec
    serializes EVERY row through one task ("No Partition Defined for
    Window operation!") — correct at sf0.01, fatal at 100 TB. Global
    rankings must go through operators/ranking.py (range-repartition
    two-phase) instead.

    Gate 3 — nested-loop joins: a BroadcastNestedLoopJoin or
    CartesianProduct outside the bounded-side allowlist (BNL_OK) is a
    plan regression: some join lost its equi-key (or a cross join crept
    in) and would replicate — or pairwise-expand — a data-sized side at
    scale."""
    df = entrymod.queries()[name](spark, sf_dir)

    plan = _formatted_plan(spark, df)
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF in plan"
    if name not in ARROW_OK:
        assert (
            "ArrowEvalPython" not in plan
            and "MapInPandas" not in plan
            and "FlatMapGroupsInPandas" not in plan
        ), f"{name}: unexpected Python boundary in a JVM-native operator"

    jplan = df._jdf.queryExecution().sparkPlan()
    for node in _iter_physical_nodes(jplan):
        if node.nodeName() in ("Window", "WindowGroupLimit"):
            assert not node.partitionSpec().isEmpty(), (
                f"{name}: unpartitioned {node.nodeName()} — single-task "
                "window; use operators.ranking.global_row_number/global_ntile"
            )

    if name not in BNL_OK:
        assert "BroadcastNestedLoop" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — a join lost its "
            "equi-key, or add a justified allowlist entry"
        )
        assert "CartesianProduct" not in plan, (
            f"{name}: CartesianProduct — neither side broadcastable; a "
            "join lost its equi-key"
        )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _formatted_plan(
        spark, entrymod.queries()["q01_pricing_summary"](spark, sf_dir)
    )
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed to scan"


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _formatted_plan(
        spark, entrymod.queries()["q02_top_revenue_customers"](spark, sf_dir)
    )
    # lineitem is 16 columns; the scan must read only the 3 used.
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _formatted_plan(
        spark, entrymod.queries()["q03_acctbal_by_region"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dim join fell back to sort-merge"


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """approx_count_distinct (HLL++) can't hash-match an oracle; assert
    its documented error bound against the exact count instead."""
    from pyspark.sql import functions as F

    from censo_escolar_spark.sources.readers import load_table

    l = load_table(spark, sf_dir, "lineitem")
    row = l.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.count_distinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= max(2, 0.05 * row.exact)


def test_approx_percentile_error_bound(spark, sf_dir):
    """percentile_approx (GK sketch) can't hash-match an oracle; assert
    its accuracy-parameter bound against the exact percentile instead
    (same policy as approx_count_distinct above)."""
    from pyspark.sql import functions as F

    from censo_escolar_spark.sources.readers import load_table

    l = load_table(spark, sf_dir, "lineitem")
    row = l.agg(
        F.percentile_approx("l_extendedprice", 0.5, 100).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.count("*").alias("n"),
    ).first()
    # GK guarantee: rank error <= n/accuracy; translate to a generous
    # value-tolerance via the observed spread
    spread = l.agg(
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("s")
    ).first().s
    assert abs(row.approx - row.exact) <= 0.05 * spread


# Queries allowed to plan a BroadcastNestedLoopJoin. BNL is the classic
# scale-killer when either side is data-sized; each entry here
# broadcasts a BOUNDED side by construction:
#   q17  — 5×5 region cross join (deliberate, tiny dims)
#   q47  — 1-row global min/max bounds broadcast into the bucket formula
#   q48  — 1-row expectation-report gate stacked over per-check rows
#   s01/s02/s08 — bounded query set / block-id pairs broadcast against
#          the corpus scan (the corpus side is never replicated)
#   t25  — checkpoint-sized bucket triangle (rows = corpus checkpoints,
#          independent of data volume)
BNL_OK = {
    "q17_region_pairs",
    "q47_price_histogram",
    "q48_data_quality_report",
    "q65_chisquare_cells",  # 1-row grand-total broadcast into the cells
    "s01_cosine_topk",
    "s02_cosine_pairs",
    "s08_matryoshka_topk",
    "s11_range_search",  # bounded query set broadcast, corpus scanned once
    "s12_knn_classify",  # bounded unlabeled-query set broadcast (s01 shape)
    "s14_hard_negatives",  # bounded anchor batch broadcast (s01 shape)
    "t25_vocab_growth",
    "s15_knn_join",  # B×B packed-block pairs (blocks, never rows, replicate)
    "t31_vocab_drift",  # 1-row corpus-totals broadcast (q47/q65 pattern)
    "t33_mixture_reweighting",  # two 1-row totals broadcasts (q65 pattern)
    "t36_epoch_plan",  # same two 1-row totals broadcasts as t33 (q65 pattern)
    "s19_random_projection_topk",  # bounded query set broadcast (s01 shape)
    "d20_cluster_size_histogram",  # 1-row corpus-total broadcast (q65 pattern)
    "s20_binary_hamming_topk",  # bounded query set broadcast (s01 shape)
    "s24_hybrid_rrf",  # dense half is cosine_topk's bounded query broadcast (s01 shape)
    "s25_maxsim_rerank",  # candidate stage is cosine_topk's bounded query broadcast (s01 shape)
}


# (the per-query BNL/CartesianProduct gate is Gate 3 of
# test_plan_quality_gates above — one DataFrame build per query serves
# all three plan gates)
