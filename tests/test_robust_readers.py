"""Corrupt-record quarantine + schema-evolution reads."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from censo_escolar_spark.sources.readers import (
    read_parquet_evolving,
    read_with_quarantine,
)

CSV = """a|b|c
1|x|2.5
2|y|3.5
not_an_int|z|oops
3|w|4.5
"""

JSONL = """{"a": 1, "b": "x"}
{"a": 2, "b": "y"}
{this is not json
{"a": 3, "b": "z"}
"""


def _schema(ddl: str) -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(CSV)
    good, bad = read_with_quarantine(
        spark, str(p), _schema("a int, b string, c double"), format="csv", delimiter="|"
    )
    assert good.columns == ["a", "b", "c"]
    assert sorted(r.a for r in good.collect()) == [1, 2, 3]
    raw = [r.raw_record for r in bad.collect()]
    assert raw == ["not_an_int|z|oops"]


def test_json_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(JSONL)
    good, bad = read_with_quarantine(
        spark, str(p), _schema("a int, b string"), format="json"
    )
    assert sorted(r.a for r in good.collect()) == [1, 2, 3]
    assert [r.raw_record for r in bad.collect()] == ["{this is not json"]


def test_quarantine_never_drops_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(CSV)
    good, bad = read_with_quarantine(
        spark, str(p), _schema("a int, b string, c double"), format="csv", delimiter="|"
    )
    assert good.count() + bad.count() == 4  # auditability: nothing vanishes


def test_parquet_schema_evolution(spark, tmp_path):
    base = str(tmp_path / "t")
    spark.range(3).select(F.col("id").alias("a")).write.parquet(base + "/y=1")
    spark.range(3).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    ).write.parquet(base + "/y=2")
    df = read_parquet_evolving(spark, base)
    assert {f.name for f in df.schema} >= {"a", "b"}
    # files lacking b read as NULL (reference-style null-padding)
    assert df.filter(F.col("b").isNull()).count() == 3
    assert df.count() == 6


def test_parquet_corrupt_file_skipped(spark, tmp_path):
    from censo_escolar_spark.sources.readers import read_parquet_robust

    base = str(tmp_path / "t")
    spark.range(5).write.parquet(base)
    # a half-uploaded object: valid name, garbage bytes
    (tmp_path / "t" / "part-corrupt.parquet").write_bytes(b"not a parquet file")
    df = read_parquet_robust(spark, base)
    assert df.count() == 5

    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import CapturedException

    with pytest.raises((Py4JJavaError, CapturedException)):
        read_parquet_robust(spark, base, ignore_corrupt=False).count()
