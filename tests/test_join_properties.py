"""Property tests: custom join operators == naive reference joins.

bounded_range_join and asof_join replace Catalyst's degenerate plans
with bucketized / carry-forward shapes; these properties pin that the
optimization NEVER changes semantics, on arbitrary generated inputs
(ties, duplicates, empty sides, boundary-exact timestamps included).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from censo_escolar_spark.operators.asof import asof_join
from censo_escolar_spark.operators.rangejoin import bounded_range_join

_T0 = datetime(2024, 1, 1)

#: (key, seconds-offset) event rows; tight key/offset ranges force
#: collisions, ties, and boundary hits.
_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 120)), min_size=0, max_size=12
)


def _df(spark, rows, ts_name):
    data = [(k, _T0 + timedelta(seconds=s), i) for i, (k, s) in enumerate(rows)]
    return spark.createDataFrame(
        data, f"k long, {ts_name} timestamp, rid_{ts_name} long"
    )


@settings(max_examples=10, deadline=None)
@given(left=_rows, right=_rows)
def test_range_join_equals_naive(spark, left, right):
    l = _df(spark, left, "lts")
    r = _df(spark, right, "rts")
    got = bounded_range_join(
        l, r, on="k", left_ts="lts", right_ts="rts", lower=-30.0, upper=30.0
    )
    naive = l.join(
        r,
        (l.k == r.k)
        & (F.col("rts") >= F.col("lts") - F.expr("interval 30 seconds"))
        & (F.col("rts") <= F.col("lts") + F.expr("interval 30 seconds")),
    ).drop(r.k)
    a = sorted(map(tuple, got.select("rid_lts", "rid_rts").collect()))
    b = sorted(map(tuple, naive.select("rid_lts", "rid_rts").collect()))
    assert a == b


@settings(max_examples=10, deadline=None)
@given(left=_rows, right=_rows)
def test_asof_join_equals_pandas(spark, left, right):
    l = _df(spark, left, "lts")
    r = _df(spark, right, "rts").withColumnRenamed("k", "k2")
    got = asof_join(
        l,
        r.withColumnRenamed("k2", "k"),
        on="k",
        left_ts="lts",
        right_ts="rts",
    )
    lp = l.toPandas().sort_values(["lts", "rid_lts"]).reset_index(drop=True)
    rp = (
        r.toPandas()
        .rename(columns={"k2": "k"})
        .sort_values(["rts", "rid_rts"])
        .reset_index(drop=True)
    )
    if len(rp):
        want = pd.merge_asof(
            lp, rp, left_on="lts", right_on="rts", by="k", direction="backward"
        )
    else:
        want = lp.assign(rid_rts=pd.NA)
    got_map = {
        r.rid_lts: r.rid_rts for r in got.select("rid_lts", "rid_rts").collect()
    }
    for row in want.itertuples(index=False):
        exp = None if pd.isna(row.rid_rts) else int(row.rid_rts)
        assert got_map[row.rid_lts] == exp, (
            f"left {row.rid_lts}: got {got_map[row.rid_lts]}, want {exp}"
        )


_words = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=5), min_size=0, max_size=10
)


@settings(max_examples=10, deadline=None)
@given(words=_words)
def test_fuzzy_blocking_is_lossless(spark, words):
    """PassJoin segment filtering + levenshtein == naive quadratic filter."""
    from censo_escolar_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, s string"
    )
    got = sorted(
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_self_pairs(df, "id", "s", max_distance=2).collect()
    )
    def lev(x, y):
        m, n = len(x), len(y)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (x[i - 1] != y[j - 1]),
                )
            prev = cur
        return prev[n]

    want = sorted(
        (i, j, lev(words[i], words[j]))
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if lev(words[i], words[j]) <= 2
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(words=_words)
@pytest.mark.parametrize("k", [0, 1])
def test_fuzzy_segment_filter_lossless_at_k01(spark, words, k):
    """The production distances: k=1 (q49) and the degenerate exact-match
    k=0 (whole-string segment, zero shift window). Same naive-quadratic
    equivalence as the k=2 property above."""
    from censo_escolar_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, s string"
    )
    got = sorted(
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_self_pairs(df, "id", "s", max_distance=k).collect()
    )

    def lev(x, y):
        m, n = len(x), len(y)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (x[i - 1] != y[j - 1]),
                )
            prev = cur
        return prev[n]

    want = sorted(
        (i, j, lev(words[i], words[j]))
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if lev(words[i], words[j]) <= k
    )
    assert got == want


def test_fuzzy_block_cols_scope_candidates(spark):
    """Pairs never cross a block-key boundary, and within a block the
    result matches the unblocked run on that block alone."""
    from censo_escolar_spark.operators.fuzzy import fuzzy_self_pairs

    rows = [
        (0, "cat", "g1"), (1, "cut", "g1"), (2, "cat", "g2"),
        (3, "cats", "g2"), (4, "dog", "g1"), (5, "dogs", "g2"),
    ]
    df = spark.createDataFrame(rows, "id long, s string, g string")
    got = sorted(
        (r.id_a, r.id_b, r.g, r.distance)
        for r in fuzzy_self_pairs(
            df, "id", "s", block_cols=["g"], max_distance=1
        ).collect()
    )
    # g1: (cat, cut) d1; g2: (cat, cats) d1 — dog/dogs split across
    # blocks must NOT pair
    assert got == [(0, 1, "g1", 1), (2, 3, "g2", 1)]
