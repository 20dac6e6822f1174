"""Local mirror of the driver's oracle harness.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet, then asserts row-count, column-name, and value equality
(order-insensitive). Used by tests/ so oracle mismatches are caught
before the driver runs.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from censo_escolar_spark.sources.readers import TEST_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with each test table registered as a view."""
    con = duckdb.connect()
    for name in TEST_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize_cell(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, Decimal):
        # Engine policy: no decimal-typed OUTPUT columns (the driver's hash
        # would see Decimal vs float64). Normalized here anyway for safety.
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        # pandas transports SQL DATE as midnight Timestamp; align.
        return datetime(v.year, v.month, v.day)
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_normalize_cell(v) for v in row))
    return sorted(out, key=repr)


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duckdb_connection(sf_dir)
    try:
        expected = con.execute(oracle_sql).fetch_df()
    finally:
        con.close()
    actual = spark_df.toPandas()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    a_rows = _normalize(actual)
    e_rows = _normalize(expected)
    for i, (ar, er) in enumerate(zip(a_rows, e_rows)):
        assert len(ar) == len(er)
        for j, (av, ev) in enumerate(zip(ar, er)):
            assert _cells_equal(av, ev), (
                f"value mismatch at sorted-row {i} col {sorted(actual.columns)[j]}: "
                f"spark={av!r} oracle={ev!r}"
            )
