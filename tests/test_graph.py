"""PageRank operator: hand-computed values + numpy-reference property."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from censo_escolar_spark.operators.graph import SCALE, pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_star_one_iteration_exact(spark):
    # 1 -> 2 <- 3 : node 2 gathers both full ranks
    out = {
        r.node: r.rank
        for r in pagerank(_edges(spark, [(1, 2), (3, 2)]), iters=1).collect()
    }
    base = 15 * SCALE // 100
    s = 2 * SCALE
    assert out[2] == base + 85 * (s // 100) + (85 * (s % 100)) // 100
    assert out[1] == base and out[3] == base  # no in-edges: base mass only


def _numpy_integer_pagerank(edges, iters, damping_pct=85):
    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    rank = {n: SCALE for n in nodes}
    base = (100 - damping_pct) * SCALE // 100
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // deg[u]
        rank = {
            n: base
            + (damping_pct * (s[n] // 100) + (damping_pct * (s[n] % 100)) // 100 if s[n] else 0)
            for n in nodes
        }
    return rank


def test_pagerank_matches_reference_recursion(spark):
    rng = np.random.RandomState(7)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.randint(0, 30, 200), rng.randint(0, 30, 200))
            if a != b
        }
    )
    expected = _numpy_integer_pagerank(edges, iters=3)
    got = {
        r.node: r.rank for r in pagerank(_edges(spark, edges), iters=3).collect()
    }
    assert got == expected


def test_pagerank_total_mass_conserved_on_regular_graph(spark):
    # directed cycle: every node has out-degree 1, no dangling leakage;
    # uniform start stays the exact fixed point
    n = 10
    edges = [(i, (i + 1) % n) for i in range(n)]
    out = pagerank(_edges(spark, edges), iters=4).collect()
    assert {r.rank for r in out} == {
        15 * SCALE // 100 + 85 * (SCALE // 100)
    }


def test_pagerank_empty_edges(spark):
    out = pagerank(
        _edges(spark, []).filter(F.lit(False)), iters=2
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _tri_counts(spark, rows):
    from censo_escolar_spark.operators.graph import triangle_counts

    return {
        r.node: r.n_triangles
        for r in triangle_counts(_pairs(spark, rows)).collect()
    }


def test_triangle_single(spark):
    out = _tri_counts(spark, [(1, 2), (2, 3), (1, 3)])
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangle_none_in_path_graph(spark):
    assert _tri_counts(spark, [(1, 2), (2, 3), (3, 4)]) == {}


def test_triangle_k4_counts(spark):
    # K4: 4 triangles total, each node in exactly 3
    rows = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri_counts(spark, rows) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_dedup_selfloops_and_direction(spark):
    # duplicates, reversed duplicates, and self-loops must not inflate
    rows = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (1, 2)]
    assert _tri_counts(spark, rows) == {1: 1, 2: 1, 3: 1}


def test_triangle_hub_with_pendant_edges(spark):
    # hub 0 touches 1..5 but only (1,2) closes a triangle
    rows = [(0, i) for i in range(1, 6)] + [(1, 2)]
    assert _tri_counts(spark, rows) == {0: 1, 1: 1, 2: 1}


def test_triangle_matches_bruteforce_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(7)
    nodes = range(12)
    rows = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.4
    ]
    eset = set(rows)
    expect = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= eset:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    assert _tri_counts(spark, rows) == expect
