"""Streaming corpus dedup maintenance (streaming/dedup.py): micro-batches
dedup against the published snapshot; near-dups of published docs drop,
within-batch clusters keep one winner; retries converge."""

from __future__ import annotations

import os

from censo_escolar_spark.streaming.dedup import (
    apply_dedup_batch,
    maintain_deduped_corpus,
    read_published,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
VARIANT = "the quick brown fox jumps over the lazy dog near the river bank tonight"
OTHER = "completely different content about weather patterns in mountain regions"
THIRD = "yet another unrelated document covering maritime navigation techniques"


def _published_ids(spark, state):
    return sorted(r.doc_id for r in read_published(spark, state).collect())


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_streaming_dedup_batches(spark, tmp_path):
    state = str(tmp_path / "state")
    # batch 0: doc 1 and its near-dup 2 -> only min-id 1 publishes; 3 unique
    apply_dedup_batch(
        _batch(spark, [(1, BASE), (2, VARIANT), (3, OTHER)]), 0, state_dir=state
    )
    assert _published_ids(spark, state) == [1, 3]
    # batch 1: doc 4 is a near-dup of PUBLISHED doc 1 -> dropped;
    # doc 5 is new -> kept
    apply_dedup_batch(
        _batch(spark, [(4, VARIANT), (5, THIRD)]), 1, state_dir=state
    )
    assert _published_ids(spark, state) == [1, 3, 5]


def test_streaming_dedup_retry_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE)]), 0, state_dir=state)
    b1 = _batch(spark, [(2, VARIANT), (3, OTHER)])
    apply_dedup_batch(b1, 1, state_dir=state)
    first = _published_ids(spark, state)
    # retried micro-batch: same batch id re-reads version 0, overwrites
    # its own version 1 -> identical outcome, no duplicates
    apply_dedup_batch(b1, 1, state_dir=state)
    assert _published_ids(spark, state) == first == [1, 3]


def test_streaming_dedup_end_to_end(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [(1, BASE), (2, VARIANT), (3, OTHER), (4, THIRD)]
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    docs = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    maintain_deduped_corpus(docs, state_dir=state, checkpoint=ckpt)
    assert _published_ids(spark, state) == [1, 3, 4]
    assert any(d.startswith("version=") for d in os.listdir(state))
