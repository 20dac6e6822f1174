"""binaryFile ingestion source → multimodal operator plumbing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from censo_escolar_spark.operators.multimodal import media_metadata, sniff_format
from censo_escolar_spark.sources.readers import load_binary_files

# Real magic bytes so sniff_format classifies ingested files.
PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 24
JPG = b"\xff\xd8\xff\xe0" + b"\x00" * 40
TXT = b"plain text, not media"


def _write_fixture(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(PNG)
    (d / "b.jpg").write_bytes(JPG)
    (d / "notes.txt").write_bytes(TXT)
    return str(d)


def test_binary_source_schema_and_contents(spark, tmp_path):
    d = _write_fixture(tmp_path)
    df = load_binary_files(spark, d)
    assert [f.name for f in df.schema.fields] == [
        "path", "modificationTime", "length", "content",
    ]
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == {"a.png", "b.jpg", "notes.txt"}
    assert rows["a.png"].length == len(PNG)
    assert bytes(rows["b.jpg"].content) == JPG


def test_binary_source_glob_filters_to_media(spark, tmp_path):
    d = _write_fixture(tmp_path)
    df = load_binary_files(spark, d, glob="*.{png,jpg}")
    assert {os.path.basename(r.path) for r in df.select("path").collect()} == {
        "a.png", "b.jpg",
    }


def test_binary_source_feeds_multimodal_operators(spark, tmp_path):
    d = _write_fixture(tmp_path)
    meta = (
        load_binary_files(spark, d)
        .select(
            F.col("path"),
            sniff_format("content").alias("fmt"),
            media_metadata("content").alias("meta"),
        )
        .collect()
    )
    fmts = {os.path.basename(r.path): r.fmt for r in meta}
    assert fmts["a.png"] == "png" and fmts["b.jpg"] == "jpeg"
