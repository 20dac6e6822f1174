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


def test_compact_published_folds_batches_and_preserves_state(spark, tmp_path):
    """compact_published folds every batch partition <= upto into one
    batch=<upto> partition per component; the published corpus and the
    probe index resolve identically, and later increments still dedup
    against pre-compaction history."""
    from censo_escolar_spark.streaming.dedup import compact_published

    state = str(tmp_path / "state")
    apply_dedup_batch(
        _batch(spark, [(1, BASE), (2, VARIANT), (3, OTHER)]), 0, state_dir=state
    )
    apply_dedup_batch(_batch(spark, [(5, THIRD)]), 1, state_dir=state)
    before = _published_ids(spark, state)
    compact_published(spark, state, upto=1)
    for comp in ("bands", "corpus", "sketches"):
        dirs = [
            d for d in os.listdir(os.path.join(state, comp))
            if d.startswith("batch=")
        ]
        assert dirs == ["batch=1"]
    assert _published_ids(spark, state) == before == [1, 3, 5]
    # the folded INDEX still drops a near-dup of a batch-0 doc
    apply_dedup_batch(_batch(spark, [(6, VARIANT)]), 2, state_dir=state)
    assert _published_ids(spark, state) == [1, 3, 5]


def test_compact_published_cadence_bounds_partition_depth(spark, tmp_path):
    """With compact_every=4, a long run of increments keeps each
    component's batch-partition count bounded (<= compact_every + 1)."""
    texts = [BASE, OTHER, THIRD]
    state = str(tmp_path / "state")
    max_parts = 0
    for bid in range(12):
        doc = (100 + bid, f"{texts[bid % 3]} unique marker token{bid} extra")
        apply_dedup_batch(
            _batch(spark, [doc]), bid, state_dir=state, compact_every=4
        )
        for comp in ("bands", "corpus", "sketches"):
            n = sum(
                d.startswith("batch=")
                for d in os.listdir(os.path.join(state, comp))
            )
            max_parts = max(max_parts, n)
    assert max_parts <= 4 + 1
    assert len(_published_ids(spark, state)) > 0


def test_compact_published_crash_after_marker_recovers(spark, tmp_path):
    """A crash after compact_published's commit marker (phase 2 not run)
    is finished by the next state read — no window loses committed
    batches."""
    from censo_escolar_spark.streaming import dedup as SD

    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE), (3, OTHER)]), 0, state_dir=state)
    apply_dedup_batch(_batch(spark, [(5, THIRD)]), 1, state_dir=state)
    before = _published_ids(spark, state)
    # phase 1 by hand (exactly what compact_published does), then "crash"
    # before phase 2: folded temps + commit marker, old batch dirs intact
    for comp, schema in SD._schemas("doc_id", "text").items():
        root = os.path.join(state, comp)
        df = SD._read_component(spark, root, schema, 2)
        w = df.write.mode("overwrite")
        if comp == "bands":
            w = w.partitionBy("bucket")
        w.parquet(os.path.join(root, "_compact_tmp_1"))
    open(os.path.join(state, "_compact_commit_1"), "w").close()
    # the next state read recovers: swap finished, contents identical
    assert _published_ids(spark, state) == before
    assert not os.path.exists(os.path.join(state, "_compact_commit_1"))
    for comp in ("bands", "corpus", "sketches"):
        dirs = [
            d for d in os.listdir(os.path.join(state, comp))
            if d.startswith("batch=")
        ]
        assert dirs == ["batch=1"]
    # and increments continue to dedup against the folded index
    apply_dedup_batch(_batch(spark, [(7, VARIANT)]), 2, state_dir=state)
    assert _published_ids(spark, state) == before == [1, 3, 5]

    # a stale PRE-marker temp (no marker file) is invisible to reads and
    # cleaned by the next real compaction attempt
    os.makedirs(os.path.join(state, "corpus", "_compact_tmp_2", "junk"))
    assert _published_ids(spark, state) == [1, 3, 5]
    SD.compact_published(spark, state, upto=2)
    assert _published_ids(spark, state) == [1, 3, 5]
    assert not os.path.exists(os.path.join(state, "corpus", "_compact_tmp_2"))


# ---------------------------------------------------------------------------
# Right-to-be-forgotten (apply_corpus_delete_batch)
# ---------------------------------------------------------------------------


def test_forget_removes_doc_and_stops_suppressing(spark, tmp_path):
    from censo_escolar_spark.streaming.dedup import apply_corpus_delete_batch

    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE), (3, OTHER)]), 0, state_dir=state)
    # near-dup of published doc 1 -> suppressed
    apply_dedup_batch(_batch(spark, [(4, VARIANT)]), 1, state_dir=state)
    assert _published_ids(spark, state) == [1, 3]
    # forget doc 1
    apply_corpus_delete_batch(
        _batch(spark, [(1, "")]).select("doc_id"), 2, state_dir=state
    )
    assert _published_ids(spark, state) == [3]
    # a NEW near-dup of the forgotten doc now publishes
    apply_dedup_batch(_batch(spark, [(5, VARIANT)]), 3, state_dir=state)
    assert _published_ids(spark, state) == [3, 5]


def test_forget_reingest_after_delete_is_live(spark, tmp_path):
    from censo_escolar_spark.streaming.dedup import apply_corpus_delete_batch

    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE)]), 0, state_dir=state)
    apply_corpus_delete_batch(
        _batch(spark, [(1, "")]).select("doc_id"), 1, state_dir=state
    )
    assert _published_ids(spark, state) == []
    # re-ingest the same id after the delete: new live row
    apply_dedup_batch(_batch(spark, [(1, BASE)]), 2, state_dir=state)
    assert _published_ids(spark, state) == [1]


def test_forget_never_published_id_is_noop(spark, tmp_path):
    from censo_escolar_spark.streaming.dedup import apply_corpus_delete_batch

    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE)]), 0, state_dir=state)
    apply_corpus_delete_batch(
        _batch(spark, [(99, "")]).select("doc_id"), 1, state_dir=state
    )
    assert _published_ids(spark, state) == [1]


def test_forget_compaction_physically_reclaims(spark, tmp_path):
    """After the fold, the tombstoned doc's rows are gone from the
    store's FILES (not just filtered at read time), and the consumed
    tombstone is dropped."""
    from censo_escolar_spark.streaming.dedup import (
        apply_corpus_delete_batch,
        compact_published,
    )

    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE), (3, OTHER)]), 0, state_dir=state)
    apply_corpus_delete_batch(
        _batch(spark, [(1, "")]).select("doc_id"), 1, state_dir=state
    )
    compact_published(spark, state, upto=1)
    assert _published_ids(spark, state) == [3]
    # raw file contents (no tombstone filtering): doc 1 reclaimed
    raw_corpus = spark.read.parquet(os.path.join(state, "corpus"))
    assert sorted(r.doc_id for r in raw_corpus.collect()) == [3]
    raw_sketches = spark.read.parquet(os.path.join(state, "sketches"))
    assert [r.doc_id for r in raw_sketches.collect()] == [3]
    raw_bands = spark.read.parquet(os.path.join(state, "bands"))
    assert set(r.doc_id for r in raw_bands.collect()) == {3}
    deletes = spark.read.parquet(os.path.join(state, "deletes"))
    assert deletes.count() == 0


def test_forget_delete_retry_idempotent(spark, tmp_path):
    from censo_escolar_spark.streaming.dedup import apply_corpus_delete_batch

    state = str(tmp_path / "state")
    apply_dedup_batch(_batch(spark, [(1, BASE), (3, OTHER)]), 0, state_dir=state)
    dels = _batch(spark, [(1, "")]).select("doc_id")
    apply_corpus_delete_batch(dels, 1, state_dir=state)
    first = _published_ids(spark, state)
    apply_corpus_delete_batch(dels, 1, state_dir=state)
    assert _published_ids(spark, state) == first == [3]


def test_dedup_maintainer_cold_restart(spark, tmp_path):
    """The d23 contract, auditable: a second maintainer incarnation over
    the same checkpoint (a) finishes a compaction staged mid-protocol
    (temps + marker, no swap — the crash window), (b) continues the
    batch-id sequence, (c) processes ONLY the file that arrived after
    the first incarnation died, and (d) publishes the same corpus as a
    straight-through run."""
    import posixpath

    from censo_escolar_spark.streaming import deploy_slices
    from censo_escolar_spark.streaming.dedup import stage_published_compaction

    cache = str(tmp_path / "cache")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    slices = [
        [(1, BASE), (3, OTHER)],       # batch 0
        [(5, THIRD), (6, BASE)],       # batch 1: 6 near-dups published 1
        # batch 2 (after restart): 7 near-dups published 1; 9 is new
        [(7, VARIANT), (9, "entirely novel text about subterranean fungal networks and their chemistry")],
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
        maintain_deduped_corpus(
            stream, state_dir=state, checkpoint=ckpt, compact_every=None
        )

    deploy_slices(cache, src, which=(0, 1))
    incarnation()
    assert _published_ids(spark, state) == [1, 3, 5]
    assert sorted(
        d for d in os.listdir(os.path.join(state, "corpus"))
        if d.startswith("batch=")
    ) == ["batch=0", "batch=1"]

    stage_published_compaction(spark, state, upto=1)
    assert os.path.exists(os.path.join(state, "_compact_commit_1"))

    deploy_slices(cache, src, which=(2,))
    incarnation()

    # (a) staged fold finished: batches 0-1 swapped into batch=1
    assert not os.path.exists(os.path.join(state, "_compact_commit_1"))
    dirs = sorted(
        d for d in os.listdir(os.path.join(state, "corpus"))
        if d.startswith("batch=")
    )
    # (b) continuity: the new incarnation wrote batch=2, not batch=0
    assert dirs == ["batch=1", "batch=2"]
    # (c) new-file-only: batch=2 holds only slice-3 survivors (7 is a
    # near-dup of published 1 -> dropped; 9 publishes)
    b2 = sorted(
        r.doc_id
        for r in spark.read.parquet(
            os.path.join(state, "corpus", "batch=2")
        ).collect()
    )
    assert b2 == [9]
    # (d) same published set as a straight-through run
    assert _published_ids(spark, state) == [1, 3, 5, 9]
