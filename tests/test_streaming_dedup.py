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
    # state components are per-batch partitions of the signature index
    assert sorted(os.listdir(state)) == ["bands", "corpus", "sketches"]
    for comp in ("bands", "corpus", "sketches"):
        assert any(
            d.startswith("batch=") for d in os.listdir(os.path.join(state, comp))
        )


def test_increment_probes_stored_index_not_text(spark, tmp_path):
    """The published side of an increment is the STORED signature index;
    its text is never re-read. Proven behaviorally: after publishing,
    corrupt every published text to garbage — a new near-dup of the
    ORIGINAL published text must still be dropped (only the stored
    sketches/bands can know the original content)."""
    import glob

    from pyspark.sql import functions as F

    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE), (3, OTHER)]), 0, state_dir=state)
    # vandalize the published corpus text in place (dedup must not care)
    corrupt = str(tmp_path / "corrupt")
    spark.createDataFrame(
        [(1, "zz"), (3, "zz")], "doc_id bigint, text string"
    ).write.parquet(corrupt)
    batch0 = os.path.join(state, "corpus", "batch=0")
    for f in glob.glob(os.path.join(batch0, "*.parquet")):
        os.remove(f)
    for i, f in enumerate(glob.glob(os.path.join(corrupt, "*.parquet"))):
        os.rename(f, os.path.join(batch0, f"part-corrupt-{i}.parquet"))
    # doc 4 near-dups the ORIGINAL text of published doc 1 -> dropped,
    # which is only possible if the increment probed the stored index
    apply_dedup_batch(
        _batch(spark, [(4, VARIANT), (5, THIRD)]), 1, state_dir=state
    )
    pub = read_published(spark, state)
    assert sorted(r.doc_id for r in pub.collect()) == [1, 3, 5]
    assert (
        pub.filter(F.col("doc_id") == 5).select("text").first()[0] == THIRD
    )


def test_dedup_state_append_only_batches(spark, tmp_path):
    """Each micro-batch writes ONLY its own batch partition: prior
    batches' files are byte-identical after later increments (O(batch)
    write amplification, never O(corpus))."""
    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE), (3, OTHER)]), 0, state_dir=state)

    def snapshot(batch_dirname):
        files = {}
        for comp in ("bands", "corpus", "sketches"):
            root = os.path.join(state, comp, batch_dirname)
            for dirpath, _, names in os.walk(root):
                for n in names:
                    p = os.path.join(dirpath, n)
                    with open(p, "rb") as fh:
                        files[os.path.relpath(p, state)] = fh.read()
        return files

    before = snapshot("batch=0")
    apply_dedup_batch(_batch(spark, [(5, THIRD)]), 1, state_dir=state)
    assert snapshot("batch=0") == before
    assert _published_ids(spark, state) == [1, 3, 5]
