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
    df = _QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, _ORACLE[name], sf_dir)


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_hash_types(spark, sf_dir, name):
    """Typed-hash lint: the driver hashes TYPED values, so DuckDB's
    result types must land in the same hash family as Spark's output
    schema (q13/q20 went red twice on bare SUM(int) -> HUGEINT vs
    BIGINT before this gate existed). Binds the oracle via DESCRIBE —
    no execution — and compares column-by-column."""
    df = _QUERIES[name](spark, sf_dir)
    assert_hash_types_match(df, _ORACLE[name], sf_dir)


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
