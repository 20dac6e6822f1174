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
