"""Every registered query must match its DuckDB oracle (driver-mirror)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from censo_escolar_spark.testing import assert_hash_types_match, assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema) > 0


def test_every_oracle_key_has_query():
    assert set(_ORACLE) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    """Value parity AND typed-hash parity on ONE DataFrame build —
    building a query is the expensive part for the fixture-backed
    parity rows (a build replays live batch applies), so the previously
    separate hash-type sweep doubled that cost for no extra coverage
    (round-12 pytest-wall-time fix; assertions unchanged).

    The typed-hash lint runs FIRST (DESCRIBE-only, no execution): the
    driver hashes TYPED values, so DuckDB's result types must land in
    the same hash family as Spark's output schema (q13/q20 went red
    twice on bare SUM(int) -> HUGEINT vs BIGINT before this gate
    existed)."""
    df = _QUERIES[name](spark, sf_dir)
    assert_hash_types_match(df, _ORACLE[name], sf_dir)
    assert_matches_oracle(df, _ORACLE[name], sf_dir)


def test_hash_type_lint_catches_bare_sum(spark, sf_dir):
    """The lint must go RED on the exact defect class that shipped q13/q20
    red twice: DuckDB types a bare SUM(int) as HUGEINT (int128) while
    Spark emits BIGINT, and the driver hash is typed."""
    import pyspark.sql.functions as F

    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n"))
    )
    bare = "SELECT SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS n FROM orders"
    with pytest.raises(AssertionError, match="typed-hash mismatch"):
        assert_hash_types_match(df, bare, sf_dir)
    fixed = (
        "SELECT CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n FROM orders"
    )
    assert_hash_types_match(df, fixed, sf_dir)


def test_every_query_has_oracle():
    """100% oracle coverage, asserted: t19 (the last rows-only entry)
    gained an unrolled-SQL oracle in round 4 — every registered query
    is now hash-compared, none is graded rows-only. A future rows-only
    registration must be a deliberate decision: shrink this set here
    with a justification, don't let it regress silently."""
    assert set(_QUERIES) == set(_ORACLE), (
        f"queries without oracle: {sorted(set(_QUERIES) - set(_ORACLE))}"
    )


def test_e47_construction_nonvacuous(sf_dir):
    """The e47 dedup-within-watermark construction must actually populate
    every behavior class it claims to exercise: batch-2 duplicates all
    suppressed (dup-A), batch-3 duplicates split across the eviction
    boundary (dup-B suppressed AND re-emitted both non-empty), and
    near-original-time batch-3 duplicates hitting the late filter
    (dup-C). Counts derive from the same integer-seconds front model the
    oracle uses; at sf0.001 the split is 69/36/33/45."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    )
    na, nb_sup, nb_re, nc_late = con.execute(
        """
        WITH e AS (
          SELECT event_id,
            epoch_ms(date_trunc('second', ts)) // 1000 AS tss
          FROM events
        ),
        p AS (
          SELECT min(tss) + (max(tss) - min(tss)) // 3 AS c1,
            (max(tss) - min(tss)) // 12 AS dly,
            (max(tss) - min(tss)) // 2 AS half
          FROM e
        ),
        f AS (
          SELECT COALESCE(max(CASE WHEN e.tss < p.c1 THEN e.tss END), 0)
              - any_value(p.dly) AS wm2,
            any_value(p.c1) AS c1, any_value(p.dly) AS dly,
            any_value(p.half) AS half
          FROM e, p
        ),
        orig AS (SELECT e.*, f.wm2, f.dly, f.half FROM e, f WHERE e.tss < f.c1)
        SELECT
          SUM(CASE WHEN event_id % 5 = 2 THEN 1 ELSE 0 END),
          SUM(CASE WHEN event_id % 5 = 0 AND tss + half > wm2
                        AND tss + dly > wm2 THEN 1 ELSE 0 END),
          SUM(CASE WHEN event_id % 5 = 0 AND tss + half > wm2
                        AND tss + dly <= wm2 THEN 1 ELSE 0 END),
          SUM(CASE WHEN event_id % 5 = 1 AND tss + dly // 2 <= wm2
                   THEN 1 ELSE 0 END)
        FROM orig
        """
    ).fetchone()
    assert na > 0, "no batch-2 (within-horizon) suppressed duplicates"
    assert nb_sup > 0, "no batch-3 duplicates on the suppressed side"
    assert nb_re > 0, "no batch-3 duplicates on the re-emitted side"
    assert nc_late > 0, "no late-dropped duplicates"


def test_m15_construction_nonvacuous(spark, sf_dir):
    """The m15 delete + re-ingest wave must populate every class it
    claims: tombstoned originals gone from the live view, surviving
    originals present, SOME re-ingested copies re-published (their
    classes' only representatives were forgotten) and most suppressed
    (their classes still have live representatives)."""
    rows = _QUERIES["m15_image_forget"](spark, sf_dir).collect()
    republished = [r for r in rows if r.batch == 6]
    originals = [r for r in rows if r.batch != 6]
    assert originals, "no original survivors"
    assert all(r.doc_id % 5 != 0 for r in originals), "tombstoned id live"
    assert republished, "no forgotten class re-published"
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(republished) < n_docs, (
        "every re-ingested copy published — the live probe suppressed nothing"
    )
