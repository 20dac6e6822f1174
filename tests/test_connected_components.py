"""connected_components / dedup_clusters — transitivity, singletons,
multi-component graphs, and the bounded-iteration failure mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.operators.dedup import connected_components, dedup_clusters


def _labels(df):
    return {r.node: r.component for r in df.collect()}


def test_chain_is_transitive(spark):
    # 1-2, 2-3, 3-4: one component labeled 1, despite 1 and 4 never pairing
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    assert _labels(connected_components(edges)) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components_and_min_label(spark):
    edges = spark.createDataFrame(
        [(10, 7), (7, 12), (100, 101), (5, 5)], "id_a long, id_b long"
    )
    got = _labels(connected_components(edges))
    assert got == {7: 7, 10: 7, 12: 7, 100: 100, 101: 100, 5: 5}


def test_max_iter_raises_instead_of_wrong_labels(spark):
    # a 20-chain can't finish in one propagate+jump round; max_iter=1
    # must raise (small_graph_edges=0 forces the distributed loop —
    # the default driver union-find has no iteration bound to hit)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 21)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1, small_graph_edges=0)


def test_long_path_converges_logarithmically(spark):
    # 1,000-node path graph: plain propagation needs ~999 rounds (the
    # adversarial worst case the pointer-jump step exists for); with
    # path compression the DISTRIBUTED loop must converge within 12
    # rounds (forced past the small-graph fast path).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 1000)], "id_a long, id_b long"
    )
    got = _labels(connected_components(edges, max_iter=12, small_graph_edges=0))
    assert set(got.values()) == {1}
    assert len(got) == 1000


def test_fast_path_equals_distributed_loop(spark):
    # the driver union-find fast path (default for graphs under the
    # edge bound) must label identically to the distributed loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9), (4, 3)], "id_a long, id_b long"
    )
    fast = _labels(connected_components(edges))
    dist = _labels(connected_components(edges, small_graph_edges=0))
    assert fast == dist == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 9: 9}


def test_dedup_clusters_singletons_keep_own_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
            (3, "completely different text with no overlap at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(docs, "doc_id", "text").collect()}
    assert got == {1: 1, 2: 1, 3: 3}


# --- property: agrees with union-find on arbitrary graphs ---------------

from hypothesis import given, settings, strategies as st


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=12,
    )
)
def test_matches_union_find_on_arbitrary_graphs(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _labels(connected_components(df, max_iter=30))
    # the distributed loop must agree with the default fast path too
    assert got == _labels(
        connected_components(df, max_iter=30, small_graph_edges=0)
    )
    want = _union_find(edges)
    # min-label propagation labels every component by its minimum node id;
    # union-find with min-root merging yields the same canonical labels
    assert got == want
