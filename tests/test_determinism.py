"""Partitioning-independence: the reproducibility contract, executed.

SCALE.md promises results independent of executor count / partitioning
(content-hash splits instead of rand(), scaled-integer PageRank,
deterministic tie-breaks, two-phase rankings). Re-running a query under
a different shuffle-partition count is the cheapest local proxy for "a
different cluster" — any hidden dependence on partition boundaries
(spark_partition_id leaking into results, rand(), first() without
order, float fold order) shows up as a diff.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Representative determinism-sensitive queries: hash splits/samples,
# min-label closure, scaled-integer pagerank, two-phase rankings,
# mode/median tie-breaks, interval sweeps, stratified quotas.
CASES = [
    "t06_quality_sample",
    "t15_dataset_split",
    "t24_stratified_sample",
    "g01_pagerank_dedup_graph",
    "d09_corpus_dedup",
    "q46_median_mode",
    "q57_rfm_segments",
    "e16_peak_concurrency",
    # round-3 additions: weighted-sample top-k, quality-keep winners,
    # pointer-doubling paths, IVF-PQ pre-pruned re-rank, interval islands
    "t27_weighted_sample",
    "d15_quality_dedup",
    "q63_hierarchy_paths",
    "s13_ivfpq_topk",
    "e21_active_intervals",
    # second round-3 batch: greedy MMR picks, contracted-graph triangle
    # counts, blocked-GEMM kNN ranks
    "s16_mmr_rerank",
    "g02_triangle_counts",
    "s15_knn_join",
    # round-4: discrete-rank winsorization (two-phase ranking), streaming
    # maintenance replays (versioned snapshots), pointer-jump closure
    # histogram, projected-space ranks
    "q58_winsorized_stats",
    "q72_streaming_merge_parity",
    "d19_streaming_dedup_parity",
    "e33_streaming_scd2_parity",
    "d20_cluster_size_histogram",
    "s19_random_projection_topk",
    # round-5 reshapes: integer cent*ms TWAP, decimal CUSUM runs,
    # exact-fold centroid argmax
    "e18_time_weighted_avg",
    "e23_cusum_alerts",
    "s07_cluster_profile",
    # round-6 additions: exact-integer DCT sign packs + Hamming-band
    # pairs (Arrow decode feeding a two-scan self-join)
    "m09_perceptual_hash",
    "m10_phash_near_dup_pairs",
    # round-10 additions: the stateful-timeout segment machine (per-key
    # state folds must not depend on partition routing) and the
    # incremental IVF-PQ ADC + two-phase exact re-rank
    "e45_stateful_timeout_segments",
    "s30_ivfpq_incremental",
    # round-12: t10 runs through spread_small_input (a partition-count-
    # sensitive repartition guard), so its result must be invariant to
    # the shuffle-partition setting like every other spread caller
    "t10_repetition_stats",
]


def _rows(spark, name, sf_dir):
    df = entrymod.queries()[name](spark, sf_dir)
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partitioning(spark, sf_dir, name):
    conf = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "32")
        a = _rows(spark, name, sf_dir)
        spark.conf.set(conf, "7")
        b = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set(conf, prev)
    assert a == b, f"{name}: result depends on shuffle partitioning"
