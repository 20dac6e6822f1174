"""Every registered query must match its DuckDB oracle (driver-mirror)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from censo_escolar_spark.testing import assert_matches_oracle

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


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_query_without_oracle_runs(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
