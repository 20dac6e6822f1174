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


def test_compaction_cadence_bounds_version_depth(spark, tmp_path):
    """The maintainer invokes compaction on its own cadence: across ~50
    micro-batches with compact_every=8 the version-directory count (the
    manifest's listing depth — the state read cost) never exceeds
    compact_every + 1, and the final snapshot equals the uncompacted
    ground truth."""
    state = str(tmp_path / "state")
    expected = {}
    max_dirs = 0
    for bid in range(50):
        key = bid % 13 + 1
        val = f"v{key}b{bid}"
        expected[key] = val
        apply_merge_batch(
            _batch(spark, [(key, "U", 1, val)]),  # 'U' upserts unmatched keys
            bid, state_dir=state, key_col="id", seq_col="seq",
            schema=STATE_SCHEMA, compact_every=8,
        )
        n_dirs = sum(d.startswith("version=") for d in os.listdir(state))
        max_dirs = max(max_dirs, n_dirs)
    assert max_dirs <= 8 + 1
    # depth actually shrank at the checkpoints (compaction really ran)
    assert sum(d.startswith("version=") for d in os.listdir(state)) <= 3
    assert _snapshot(spark, state) == expected


def test_compact_crash_before_marker_leaves_state_untouched(spark, tmp_path):
    """Phase 1 (temp write) with no commit marker is invisible: reads
    resolve the original versions, and the next compaction cleans the
    stale temp and completes."""
    from censo_escolar_spark.streaming.bucketstate import compact_state

    state = str(tmp_path / "state")
    apply_merge_batch(
        _batch(spark, [(k, "I", 1, f"v{k}") for k in range(1, 9)]),
        0, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    apply_merge_batch(
        _batch(spark, [(3, "U", 1, "v3b")]),
        1, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    before = _snapshot(spark, state)
    # simulate a crash mid-phase-1: a half-written temp dir, NO marker
    os.makedirs(os.path.join(state, "_compact_tmp_1", "bucket=0"))
    assert _snapshot(spark, state) == before  # read ignores the temp
    compact_state(spark, state, schema=STATE_SCHEMA, key_col="id", upto=1)
    assert sorted(d for d in os.listdir(state)) == ["version=1"]
    assert _snapshot(spark, state) == before


def test_compact_crash_after_marker_is_recovered_on_read(spark, tmp_path):
    """A crash after the commit marker (phase 2 not yet run) must NOT
    lose committed bucket contents: the next state read finishes the
    swap and resolves the folded state."""
    from censo_escolar_spark.streaming.bucketstate import (
        _write_version_dir,
        N_BUCKETS,
        read_bucketed_state,
    )

    state = str(tmp_path / "state")
    apply_merge_batch(
        _batch(spark, [(k, "I", 1, f"v{k}") for k in range(1, 9)]),
        0, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    apply_merge_batch(
        _batch(spark, [(3, "U", 1, "v3b"), (9, "I", 1, "v9")]),
        1, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    before = _snapshot(spark, state)
    # phase 1 by hand: fold the state into the temp dir + commit marker,
    # then "crash" (skip phase 2) — old versions still on disk
    folded = read_bucketed_state(spark, state, schema=STATE_SCHEMA, below=2)
    _write_version_dir(
        folded, os.path.join(state, "_compact_tmp_1"), key_col="id",
        touched=list(range(N_BUCKETS)), n_buckets=N_BUCKETS,
    )
    open(os.path.join(state, "_compact_commit_1"), "w").close()
    # the next read recovers: swap finished, state identical
    assert _snapshot(spark, state) == before
    assert sorted(os.listdir(state)) == ["version=1"]
    # maintenance continues on the recovered checkpoint
    apply_merge_batch(
        _batch(spark, [(9, "D", 1, None)]),
        2, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    after = _snapshot(spark, state)
    assert 9 not in after and after[3] == "v3b" and len(after) == 8


def test_compaction_invariance_random_cdc_sequences(spark, tmp_path):
    """INVARIANCE: for a random (seeded) CDC batch sequence, maintaining
    with an aggressive compaction cadence and with no compaction at all
    must resolve the identical snapshot after EVERY batch — compaction
    is contents-preserving by contract, not just at the happy path."""
    import random

    rng = random.Random(20260815)
    plain = str(tmp_path / "plain")
    compacted = str(tmp_path / "compacted")
    for bid in range(14):
        rows = []
        for _ in range(rng.randint(1, 5)):
            key = rng.randint(1, 9)
            op = rng.choice(["U", "U", "I", "D"])
            rows.append(
                (key, op, rng.randint(1, 100), None if op == "D" else f"v{bid}k{key}")
            )
        for state, every in ((plain, None), (compacted, 4)):
            apply_merge_batch(
                _batch(spark, rows), bid, state_dir=state, key_col="id",
                seq_col="seq", schema=STATE_SCHEMA, compact_every=every,
            )
        assert _snapshot(spark, plain) == _snapshot(spark, compacted)
    # the compacted store really is shallower
    n_plain = sum(d.startswith("version=") for d in os.listdir(plain))
    n_comp = sum(d.startswith("version=") for d in os.listdir(compacted))
    assert n_comp < n_plain


class _FalseRenameFS:
    """Wraps a Hadoop FileSystem; rename reports failure via its boolean
    return (the object-store / lease-loss mode) instead of raising."""

    def __init__(self, fs):
        self._fs = fs

    def rename(self, src, dst):
        return False

    def __getattr__(self, name):
        return getattr(self._fs, name)


def test_compact_failed_rename_keeps_marker_for_retry(spark, tmp_path):
    """fs.rename returning false (not raising) mid-phase-2 must raise
    and leave the commit marker + folded temp in place, so the next
    state read retries phase 2 instead of discarding the snapshot."""
    import pytest

    from censo_escolar_spark.streaming.bucketstate import (
        N_BUCKETS,
        _finish_compaction,
        _write_version_dir,
        hadoop_fs,
        read_bucketed_state,
    )

    state = str(tmp_path / "state")
    apply_merge_batch(
        _batch(spark, [(k, "I", 1, f"v{k}") for k in range(1, 9)]),
        0, state_dir=state, key_col="id", seq_col="seq", schema=STATE_SCHEMA,
    )
    before = _snapshot(spark, state)
    # phase 1 by hand: folded temp + commit marker
    folded = read_bucketed_state(spark, state, schema=STATE_SCHEMA, below=1)
    _write_version_dir(
        folded, os.path.join(state, "_compact_tmp_0"), key_col="id",
        touched=list(range(N_BUCKETS)), n_buckets=N_BUCKETS,
    )
    open(os.path.join(state, "_compact_commit_0"), "w").close()

    fs, jvm = hadoop_fs(spark, state)
    with pytest.raises(IOError):
        _finish_compaction(_FalseRenameFS(fs), jvm, state, 0)
    # marker and folded temp survive the failure -> phase 2 can retry
    names = set(os.listdir(state))
    assert "_compact_commit_0" in names and "_compact_tmp_0" in names
    # the next read (real fs) finishes the swap; state identical
    assert _snapshot(spark, state) == before
    assert sorted(os.listdir(state)) == ["version=0"]


def test_merge_maintainer_cold_restart(spark, tmp_path):
    """The q74 contract: a second maintainer incarnation over the same
    checkpoint finishes a bucket-store compaction staged mid-protocol
    (temps + marker, no swap), continues the batch-id sequence
    (processes ONLY the new file), and resolves the same snapshot as a
    straight-through run."""
    import posixpath

    from censo_escolar_spark.streaming import deploy_slices
    from censo_escolar_spark.streaming.bucketstate import (
        stage_state_compaction,
    )

    cache = str(tmp_path / "cache")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    slices = [
        [(1, "I", 1, "a"), (2, "I", 1, "b")],
        [(1, "U", 1, "a2"), (3, "I", 1, "c")],
        [(2, "D", 1, None), (4, "I", 1, "d")],  # after restart
    ]
    for i, rows in enumerate(slices):
        _batch(spark, rows).coalesce(1).write.parquet(
            posixpath.join(cache, f"s{i:02d}")
        )
    schema = spark.read.parquet(posixpath.join(cache, "s00")).schema

    def incarnation() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        maintain_merged_table(
            stream, state_dir=state, checkpoint=ckpt, key_col="id",
            seq_col="seq", schema=STATE_SCHEMA, compact_every=None,
        )

    deploy_slices(cache, src, which=(0, 1))
    incarnation()
    assert _snapshot(spark, state) == {1: "a2", 2: "b", 3: "c"}

    stage_state_compaction(
        spark, state, schema=STATE_SCHEMA, key_col="id", upto=1
    )
    assert os.path.exists(os.path.join(state, "_compact_commit_1"))

    deploy_slices(cache, src, which=(2,))
    incarnation()

    # staged swap finished; wave-3 delete/insert applied exactly once
    assert not os.path.exists(os.path.join(state, "_compact_commit_1"))
    assert _snapshot(spark, state) == {1: "a2", 3: "c", 4: "d"}
