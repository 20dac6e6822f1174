"""flatten_hierarchy edge semantics (q63 oracle covers fixture parity)."""

from __future__ import annotations

from censo_escolar_spark.operators.hierarchy import flatten_hierarchy


def _mk(spark, rows):
    return spark.createDataFrame(rows, "node long, parent long")


def _flat(spark, rows, **kw):
    out = flatten_hierarchy(_mk(spark, rows), **kw).collect()
    return {r["node"]: (r["root"], r["depth"], r["path"]) for r in out}


def test_deep_chain_resolves_in_log_rounds(spark):
    # a 12-deep chain: 1 <- 2 <- ... <- 13; max_depth=16 -> 4 doublings
    rows = [(1, None)] + [(i, i - 1) for i in range(2, 14)]
    got = _flat(spark, rows, max_depth=16)
    assert got[13] == (1, 12, "/".join(str(i) for i in range(1, 14)))
    assert got[1] == (1, 0, "1")


def test_multi_root_forest(spark):
    rows = [(1, None), (2, 1), (10, None), (11, 10), (12, 11)]
    got = _flat(spark, rows)
    assert got[2] == (1, 1, "1/2")
    assert got[12] == (10, 2, "10/11/12")
    assert len(got) == 5


def test_branching_tree_paths(spark):
    rows = [(1, None), (2, 1), (3, 1), (4, 2), (5, 2)]
    got = _flat(spark, rows)
    assert got[4] == (1, 2, "1/2/4")
    assert got[5] == (1, 2, "1/2/5")
    assert got[3] == (1, 1, "1/3")


def test_single_root_only(spark):
    assert _flat(spark, [(7, None)]) == {7: (7, 0, "7")}
