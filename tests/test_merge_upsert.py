"""merge_upsert edge semantics (q62 oracle covers fixture parity)."""

from __future__ import annotations

from censo_escolar_spark.operators.merge import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)],
        "k long, s string, v double",
    )


def _cdc(spark, rows):
    return spark.createDataFrame(rows, "k long, op string, s string, v double")


def _merged(spark, rows):
    cdc = _cdc(spark, rows).select("k", "s", "v", "op")
    out = merge_upsert(_base(spark), cdc, "k").collect()
    return {r["k"]: (r["s"], r["v"]) for r in out}


def test_update_matched_row(spark):
    got = _merged(spark, [(2, "U", "B2", 99.0)])
    assert got == {1: ("a", 10.0), 2: ("B2", 99.0), 3: (None, 30.0)}


def test_insert_new_key(spark):
    got = _merged(spark, [(9, "I", "new", 1.0)])
    assert got[9] == ("new", 1.0) and len(got) == 4


def test_delete_matched_and_unmatched(spark):
    # delete of key 2 removes it; delete of absent key 42 is a no-op
    got = _merged(spark, [(2, "D", None, None), (42, "D", None, None)])
    assert set(got) == {1, 3}


def test_update_can_set_null_payload(spark):
    got = _merged(spark, [(1, "U", None, 5.0)])
    assert got[1] == (None, 5.0)


def test_base_null_payload_survives_untouched(spark):
    got = _merged(spark, [(2, "U", "x", 0.0)])
    assert got[3] == (None, 30.0)


def test_mixed_batch(spark):
    got = _merged(
        spark,
        [(1, "D", None, None), (2, "U", "u", 2.5), (7, "I", "i", 7.0)],
    )
    assert set(got) == {2, 3, 7}
    assert got[2] == ("u", 2.5) and got[7] == ("i", 7.0)


# ---------------------------------------------------------------------------
# Property: merge_upsert == the naive three-way spec (base-minus-touched
# ∪ upserts) on arbitrary generated batches — ties to the base keyspace,
# op mixes, and disjoint inserts included.
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

_base_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-5, 5)),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)
_cdc_rows = st.lists(
    st.tuples(
        st.integers(0, 14), st.sampled_from(["U", "I", "D"]), st.integers(-5, 5)
    ),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=25, deadline=None)
@given(base=_base_rows, cdc=_cdc_rows)
def test_merge_upsert_equals_naive_spec(spark, base, cdc):
    bdf = spark.createDataFrame(base, "k long, v long") if base else (
        spark.createDataFrame([], "k long, v long")
    )
    cdf = spark.createDataFrame(
        [(k, v, op) for k, op, v in cdc], "k long, v long, op string"
    ) if cdc else spark.createDataFrame([], "k long, v long, op string")

    got = {
        (r["k"], r["v"]) for r in merge_upsert(bdf, cdf, "k").collect()
    }

    bmap = dict(base)
    touched = {k for k, _, _ in cdc}
    expect = {(k, v) for k, v in bmap.items() if k not in touched}
    expect |= {(k, v) for k, op, v in cdc if op in ("U", "I")}
    assert got == expect


# ---------------------------------------------------------------------------
# IVM delta rule: maintained join view == full recompute, on arbitrary
# generated base/delta splits (duplicate keys and empty sides included).
# ---------------------------------------------------------------------------
from censo_escolar_spark.operators.ivm import join_view_delta  # noqa: E402

_side = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 20), st.booleans()),
    min_size=0,
    max_size=10,
)


@settings(max_examples=20, deadline=None)
@given(a=_side, b=_side)
def test_join_view_delta_equals_full_recompute(spark, a, b):
    adf = spark.createDataFrame(
        [(k, v) for k, v, _ in a] or [], "k long, av long"
    )
    bdf = spark.createDataFrame(
        [(k, v) for k, v, _ in b] or [], "k long, bv long"
    )
    base_a = spark.createDataFrame(
        [(k, v) for k, v, d in a if not d] or [], "k long, av long"
    )
    delta_a = spark.createDataFrame(
        [(k, v) for k, v, d in a if d] or [], "k long, av long"
    )
    base_b = spark.createDataFrame(
        [(k, v) for k, v, d in b if not d] or [], "k long, bv long"
    )
    delta_b = spark.createDataFrame(
        [(k, v) for k, v, d in b if d] or [], "k long, bv long"
    )
    maintained = base_a.join(base_b, "k").unionByName(
        join_view_delta(base_a, base_b, delta_a, delta_b, "k")
    )
    full = adf.join(bdf, "k")
    got = sorted(map(tuple, maintained.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want
