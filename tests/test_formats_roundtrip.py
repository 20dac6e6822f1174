"""Source/sink format matrix: parquet, ORC, JSON, CSV round-trips
preserve schema + values (text formats read back under the explicit
schema — the engine never relies on inference)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.sources.readers import load_table, read_table
from censo_escolar_spark.sources.writers import write_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .limit(200)
    )
    path = str(tmp_path / fmt)
    write_table(src, path, format=fmt)
    back = read_table(spark, path, format=fmt, schema=src.schema)
    assert back.schema == src.schema
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
