"""Streaming MERGE maintenance (streaming/merge.py): CDC batches keep a
keyed snapshot current; retries converge (exactly-once); intra-batch
op sequences collapse to the last image per key."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from censo_escolar_spark.streaming.merge import (
    apply_merge_batch,
    maintain_merged_table,
    read_merged_state,
)

STATE_SCHEMA = "id bigint, val string"
CDC_SCHEMA = "id bigint, op string, seq bigint, val string"


def _snapshot(spark, state_dir):
    return {
        r.id: r.val
        for r in read_merged_state(spark, state_dir, schema=STATE_SCHEMA).collect()
    }


def _batch(spark, rows):
    return spark.createDataFrame(rows, CDC_SCHEMA)


def test_merge_batches_apply_in_sequence(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _batch(spark, [(1, "I", 1, "a"), (2, "I", 1, "b"), (3, "I", 1, "c")])
    apply_merge_batch(b0, 0, state_dir=state, key_col="id", seq_col="seq",
                      schema=STATE_SCHEMA)
    assert _snapshot(spark, state) == {1: "a", 2: "b", 3: "c"}

    # update 2, delete 3, insert 4 — and key 4 has an intra-batch
    # history (I then U): the highest-seq image must win
    b1 = _batch(spark, [
        (2, "U", 1, "b2"),
        (3, "D", 1, None),
        (4, "I", 1, "d0"),
        (4, "U", 2, "d1"),
    ])
    apply_merge_batch(b1, 1, state_dir=state, key_col="id", seq_col="seq",
                      schema=STATE_SCHEMA)
    assert _snapshot(spark, state) == {1: "a", 2: "b2", 4: "d1"}


def test_merge_batch_retry_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _batch(spark, [(1, "I", 1, "a"), (2, "I", 1, "b")])
    b1 = _batch(spark, [(1, "D", 1, None), (2, "U", 1, "b2")])
    apply_merge_batch(b0, 0, state_dir=state, key_col="id", seq_col="seq",
                      schema=STATE_SCHEMA)
    apply_merge_batch(b1, 1, state_dir=state, key_col="id", seq_col="seq",
                      schema=STATE_SCHEMA)
    first = _snapshot(spark, state)
    # a retried micro-batch re-runs with the SAME batch id: it must
    # re-read version 0 (not its own half-written version 1) and
    # converge to the identical snapshot
    apply_merge_batch(b1, 1, state_dir=state, key_col="id", seq_col="seq",
                      schema=STATE_SCHEMA)
    assert _snapshot(spark, state) == first == {2: "b2"}


def test_maintain_merged_table_end_to_end(spark, tmp_path):
    src = str(tmp_path / "cdc_src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, "I", 1, "a"),
        (2, "I", 2, "b"),
        (1, "U", 3, "a2"),
        (2, "D", 4, None),
        (5, "I", 5, "e"),
    ]
    spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    cdc = spark.readStream.schema(CDC_SCHEMA).parquet(src)
    maintain_merged_table(
        cdc, state_dir=state, checkpoint=ckpt, key_col="id", seq_col="seq",
        schema=STATE_SCHEMA,
    )
    assert _snapshot(spark, state) == {1: "a2", 5: "e"}
    # versions directory carries replay provenance
    assert any(d.startswith("version=") for d in os.listdir(state))


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """O(touched-buckets) write amplification: a batch updating ONE key
    writes a version containing only that key's bucket, and every prior
    version's files stay byte-identical (immutable)."""
    from censo_escolar_spark.streaming.bucketstate import (
        N_BUCKETS,
        bucket_of,
    )

    state = str(tmp_path / "state")
    # seed enough keys that several buckets are populated
    seed = [(k, "I", 1, f"v{k}") for k in range(1, 21)]
    apply_merge_batch(_batch(spark, seed), 0, state_dir=state, key_col="id",
                      seq_col="seq", schema=STATE_SCHEMA)
    v0_buckets = sorted(os.listdir(os.path.join(state, "version=0")))
    assert sum(d.startswith("bucket=") for d in v0_buckets) > 1

    def files(root):
        out = {}
        for dirpath, _, names in os.walk(root):
            for n in names:
                p = os.path.join(dirpath, n)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = fh.read()
        return out

    v0_before = files(os.path.join(state, "version=0"))
    # update a single key -> exactly one touched bucket
    apply_merge_batch(_batch(spark, [(7, "U", 1, "v7b")]), 1, state_dir=state,
                      key_col="id", seq_col="seq", schema=STATE_SCHEMA)
    b7 = spark.createDataFrame([(7,)], "id bigint").select(
        bucket_of("id", n_buckets=N_BUCKETS).alias("b")
    ).first()[0]
    v1 = os.path.join(state, "version=1")
    touched = [d for d in os.listdir(v1) if d.startswith("bucket=")]
    assert touched == [f"bucket={b7}"]
    # version 0 untouched: every file byte-identical
    assert files(os.path.join(state, "version=0")) == v0_before
    # and the merged view is correct: key 7 updated, all others intact
    snap = _snapshot(spark, state)
    assert snap[7] == "v7b" and snap[1] == "v1" and len(snap) == 20


def test_compact_state_folds_versions_and_preserves_state(spark, tmp_path):
    """Compaction bounds manifest depth: folding at version K leaves one
    checkpoint version with every bucket, deletes older versions, and
    the readable state is unchanged; later batches keep applying."""
    from censo_escolar_spark.streaming.bucketstate import compact_state

    state = str(tmp_path / "state")
    apply_merge_batch(
        _batch(spark, [(k, "I", 1, f"v{k}") for k in range(1, 11)]),
        0, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    apply_merge_batch(
        _batch(spark, [(3, "U", 1, "v3b"), (11, "I", 1, "v11")]),
        1, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    before = _snapshot(spark, state)
    compact_state(spark, state, schema=STATE_SCHEMA, key_col="id", upto=1)
    assert sorted(os.listdir(state)) == ["version=1"]
    assert _snapshot(spark, state) == before
    # maintenance continues on top of the checkpoint
    apply_merge_batch(
        _batch(spark, [(3, "D", 1, None)]),
        2, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    after = _snapshot(spark, state)
    assert 3 not in after and after[11] == "v11" and len(after) == 10
