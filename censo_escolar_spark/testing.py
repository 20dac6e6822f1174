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


# ---------------------------------------------------------------------------
# Typed-hash lint: the real driver hash-compares TYPED values, so a
# DuckDB result column whose storage type differs from Spark's output
# type (DuckDB HUGEINT from SUM(int) vs Spark BIGINT; BIGINT year() vs
# Spark INT; DOUBLE vs DECIMAL) breaks the hash even when every value is
# equal.  q13/q20 shipped red twice on exactly this class before the
# gate below existed.  Each engine type is reduced to a "hash family"
# and the families must match column-by-column.
# Decimal PRECISION is deliberately ignored (scale is checked): DuckDB
# SUM(DECIMAL(p,s)) widens to DECIMAL(38,s) and Spark to (p+10,s), and
# driver-green decimal queries (q40, q63 family) prove the driver
# tolerates it.
# ---------------------------------------------------------------------------

_DUCK_INT_WIDTH = {
    "TINYINT": 8, "SMALLINT": 16, "INTEGER": 32, "BIGINT": 64,
    "HUGEINT": 128, "UTINYINT": 8, "USMALLINT": 16, "UINTEGER": 32,
    "UBIGINT": 64, "UHUGEINT": 128,
}


def _duck_hash_family(type_str: str):
    t = type_str.strip().upper()
    if t.endswith("[]"):
        return ("list", _duck_hash_family(t[:-2]))
    if t in _DUCK_INT_WIDTH:
        return ("int", _DUCK_INT_WIDTH[t])
    if t == "DOUBLE":
        return ("float", 64)
    if t in ("FLOAT", "REAL"):
        return ("float", 32)
    if t.startswith("DECIMAL"):
        scale = int(t.rstrip(")").split(",")[1]) if "," in t else 0
        return ("decimal", scale)
    if t in ("VARCHAR", "TEXT", "STRING", "BPCHAR"):
        return ("str",)
    # DATE and TIMESTAMP share a family: the driver's pandas transport
    # coerces both to datetime64[ns] (driver-GREEN evidence: e09, e25,
    # q64, q68 all pair Spark date_trunc TIMESTAMP with DuckDB DATE).
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return ("datetime",)
    if t == "BOOLEAN":
        return ("bool",)
    if t == "BLOB":
        return ("binary",)
    return ("other", t)


def _spark_hash_family(dt):
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return ("list", _spark_hash_family(dt.elementType))
    if isinstance(dt, T.ByteType):
        return ("int", 8)
    if isinstance(dt, T.ShortType):
        return ("int", 16)
    if isinstance(dt, T.IntegerType):
        return ("int", 32)
    if isinstance(dt, T.LongType):
        return ("int", 64)
    if isinstance(dt, T.DoubleType):
        return ("float", 64)
    if isinstance(dt, T.FloatType):
        return ("float", 32)
    if isinstance(dt, T.DecimalType):
        return ("decimal", dt.scale)
    if isinstance(dt, T.StringType):
        return ("str",)
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return ("datetime",)
    if isinstance(dt, T.BooleanType):
        return ("bool",)
    if isinstance(dt, T.BinaryType):
        return ("binary",)
    return ("other", dt.simpleString().upper())


def assert_hash_types_match(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Bind (not execute) the oracle in DuckDB and assert each result
    column's hash family equals the Spark output column's."""
    con = duckdb_connection(sf_dir)
    try:
        duck = {
            row[0]: row[1]
            for row in con.execute(f"DESCRIBE {oracle_sql}").fetchall()
        }
    finally:
        con.close()
    mine = {f.name: f.dataType for f in spark_df.schema.fields}
    assert sorted(mine) == sorted(duck), (
        f"column mismatch: spark={sorted(mine)} oracle={sorted(duck)}"
    )
    bad = []
    for name in sorted(mine):
        sf_fam = _spark_hash_family(mine[name])
        dk_fam = _duck_hash_family(duck[name])
        if sf_fam != dk_fam:
            bad.append(
                f"{name}: spark {mine[name].simpleString()} -> {sf_fam} "
                f"vs duckdb {duck[name]} -> {dk_fam}"
            )
    assert not bad, "typed-hash mismatch (driver hash would diverge):\n" + "\n".join(bad)


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
