"""PII redaction + repetition stats unit tests (edge cases the t09/t10
oracles' synthetic planting doesn't reach)."""

from __future__ import annotations

from pyspark.sql import functions as F

from censo_escolar_spark.functions import text as T


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], "t string").select(expr.alias("v")).first().v


def test_redact_pii_all_kinds(spark):
    s = "mail a.b+c@x-y.co.uk ip 192.168.001.254 tel 555-0199 end"
    out = _one(spark, s, T.redact_pii("t"))
    assert out == "mail <EMAIL> ip <IP> tel <PHONE> end"


def test_redact_pii_order_email_before_numbers(spark):
    # the email's digits must be eaten by <EMAIL>, not by the number rules
    out = _one(spark, "u123-4567@h.io", T.redact_pii("t"))
    assert out == "<EMAIL>"


def test_pii_counts(spark):
    s = "a@b.cc c@d.ee 10.1.2.3 none 555-12345"  # 5-digit tail: no phone match
    assert _one(spark, s, T.pii_count("t", "email")) == 2
    assert _one(spark, s, T.pii_count("t", "ipv4")) == 1
    assert _one(spark, s, T.pii_count("t", "phone")) == 0


def test_no_pii_is_identity(spark):
    s = "perfectly clean text with numbers 12 and words"
    assert _one(spark, s, T.redact_pii("t")) == s
    assert _one(spark, s, T.pii_count("t", "email")) == 0


def test_repetition_stats_closed_forms(spark):
    stats = T.repetition_stats("t")
    # 4 tokens, 2 distinct -> dup_token_frac 0.5;
    # bigrams: [a a, a b, b a] distinct=3 of 3 -> 0.0... actually "a a","a b","b a" all distinct
    row = (
        spark.createDataFrame([("a a b a",)], "t string")
        .select(
            stats["dup_token_frac"].alias("dt"), stats["dup_bigram_frac"].alias("db")
        )
        .first()
    )
    assert abs(row.dt - 0.5) < 1e-12
    assert abs(row.db - 0.0) < 1e-12
    # "x y x y x y": 6 tokens 2 distinct -> 2/3; bigrams 5 total 2 distinct -> 0.6
    row = (
        spark.createDataFrame([("x y x y x y",)], "t string")
        .select(
            stats["dup_token_frac"].alias("dt"), stats["dup_bigram_frac"].alias("db")
        )
        .first()
    )
    assert abs(row.dt - (1 - 2 / 6)) < 1e-12
    assert abs(row.db - (1 - 2 / 5)) < 1e-12


def test_repetition_stats_single_token_doc(spark):
    stats = T.repetition_stats("t")
    row = (
        spark.createDataFrame([("solo",)], "t string")
        .select(
            stats["dup_token_frac"].alias("dt"), stats["dup_bigram_frac"].alias("db")
        )
        .first()
    )
    assert row.dt == 0.0 and row.db == 0.0  # no bigrams -> defined as 0


# ---------------------------------------------------------------------------
# canonical_url (d16's key)
# ---------------------------------------------------------------------------


def _canon(spark, texts):
    from censo_escolar_spark.functions.text import canonical_url

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.c for r in df.select(canonical_url("text").alias("c")).collect()]


def test_canonical_url_normalizes_variants(spark):
    variants = [
        "see http://www.Example.com/a/b?utm=1 now",
        "see https://example.com/a/b now",
        "see https://EXAMPLE.com/a/b/ now",
        "see http://example.com/a/b#frag now",
    ]
    assert set(_canon(spark, variants)) == {"example.com/a/b"}


def test_canonical_url_host_only_and_missing(spark):
    got = _canon(
        spark,
        [
            "visit https://www.site.org today",
            "visit https://site.org/ today",
            "no links here at all",
            "ftp://site.org/not-http",
        ],
    )
    assert got == ["site.org", "site.org", "", ""]


def test_canonical_url_first_url_wins(spark):
    got = _canon(spark, ["a http://first.com/x then https://second.com/y"])
    assert got == ["first.com/x"]
