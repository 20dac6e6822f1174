"""Edge cases: data-quality report and span stripping."""

from __future__ import annotations

from pyspark.sql import functions as F

from censo_escolar_spark.operators import quality as Q
from censo_escolar_spark.operators.dedup import strip_spans


def test_quality_report_flags(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (1, "O", 20.0), (2, None, -5.0), (3, "X", 30.0)],
        "k long, status string, v double",
    )
    rep = {
        r.check: r
        for r in Q.report(
            Q.row_checks(
                df,
                [
                    Q.null_check("status"),
                    Q.range_check("v", 0, 100),
                    Q.accepted_values("status", ["O", "F"]),
                ],
            ),
            Q.unique_check(df, ["k"], "k_unique"),
        ).collect()
    }
    assert rep["status_not_null"].violations == 1 and not rep["status_not_null"].ok
    assert rep["v_in_range"].violations == 1
    # NULL status is not an accepted value but is reported by the null
    # check; isin(NULL) yields NULL -> ~NULL is NULL -> not counted here
    assert rep["status_accepted"].violations == 1
    assert rep["k_unique"].violations == 1
    assert all(r.total == 4 for c, r in rep.items() if c != "k_unique")


def test_referential_check_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = Q.referential_check(child, parent, [("fk", "pk")], "ref").collect()[0]
    assert (row.violations, row.total, row.check) == (1, 3, "ref")


def test_strip_spans_full_and_none(spark):
    shared = " ".join(f"w{i}" for i in range(10))  # 10-token verbatim overlap
    docs = spark.createDataFrame(
        [
            (1, shared),                       # fully duplicated -> stripped empty
            (2, shared + " unique tail here"),  # prefix stripped, tail kept
            (3, "completely different text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_spans(docs, "doc_id", "text", min_len=8).collect()}
    assert out[1].n_tokens_after == 0 and out[1].stripped_text == ""
    assert out[2].stripped_text == "unique tail here"
    assert out[3].n_tokens_after == out[3].n_tokens_before  # untouched


def test_diff_tables_null_safety(spark):
    from censo_escolar_spark.operators.diff import diff_tables

    a = spark.createDataFrame(
        [(1, None, "x"), (2, 5.0, "y"), (3, 1.0, "z"), (4, 2.0, "w")],
        "k long, v double, s string",
    )
    b = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y"), (3, 1.0, "z2"), (5, 9.0, "new")],
        "k long, v double, s string",
    )
    out = {r.k: r for r in diff_tables(a, b, ["k"]).collect()}
    assert out[1].change_type == "unchanged"        # NULL == NULL
    assert out[2].change_type == "changed" and out[2].changed_cols == ["v"]
    assert out[3].change_type == "changed" and out[3].changed_cols == ["s"]
    assert out[4].change_type == "removed"
    assert out[5].change_type == "added"
