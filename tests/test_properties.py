"""Property tests (SURVEY §5 item 3) — the convention engine's rules hold
for arbitrary inputs, not just the curated fixtures. One Spark job per
property: hypothesis generates the corpus, a single DataFrame pass
checks every example (per-example Spark jobs would be minutes, not
seconds)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from censo_escolar_spark.etl.pipeline import apply_conventions, union_shards

# Census cells: printable-ish strings incl. numerics, blanks, unicode.
cell = st.one_of(
    st.none(),
    st.integers(-(10**10), 10**10).map(str),
    st.text(max_size=12),
    st.sampled_from(["0", "1", "2", "01", " 1", "1 ", "", "true", "NaN", "-", "1.5"]),
)

MAP = {"1": "um", "2": "dois"}


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(cell, cell, cell), min_size=1, max_size=30))
def test_convention_rules_hold_for_arbitrary_cells(spark, rows):
    df = spark.createDataFrame(
        rows, "TP_X string, IN_X string, NU_X string"
    )
    out = apply_conventions(df, table="t", year=2020, maps={"TP_X": MAP}).collect()
    for (tp, in_, nu), r in zip(rows, out):
        assert r["TP_X"] == MAP.get(tp), f"dict.get semantics broke for {tp!r}"
        assert r["IN_X"] == ({"1": True, "0": False}.get(in_)), f"bool rule broke for {in_!r}"
        # try_cast int semantics: python int() on the trimmed literal,
        # else NULL. Spark's string->int cast trims EVERY char <= 0x20
        # (UTF8String.trimAll — control chars included, e.g. '0\x1b'
        # casts to 0), not just Python str.strip()'s whitespace set.
        # (and only ASCII digits count: python int() would also accept
        # unicode decimal digits, Spark's toInt does not)
        import re as _re

        _spark_trim = "".join(chr(c) for c in range(0x21))
        trimmed = nu.strip(_spark_trim) if nu is not None else None
        if trimmed and _re.fullmatch(r"[+-]?[0-9]+", trimmed):
            expected_nu = int(trimmed)
            if not (-(2**31) <= expected_nu < 2**31):
                expected_nu = None
        else:
            expected_nu = None
        assert r["NU_X"] == expected_nu, f"int rule broke for {nu!r}"


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.tuples(st.integers(0, 10**6), st.text(max_size=8)), max_size=20),
        min_size=1,
        max_size=5,
    )
)
def test_union_shards_preserves_all_rows(spark, shards):
    dfs = [
        spark.createDataFrame(shard or [(0, "")], "id long, v string")
        for shard in shards
    ]
    expected = sum(max(len(s), 1) for s in shards)
    assert union_shards(dfs).count() == expected
