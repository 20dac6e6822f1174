"""Streaming image-corpus dedup (streaming/imagededup.py): micro-batches
of images dedup against the published pHash index; exact re-uploads of
published images drop, within-batch duplicate classes keep one winner;
retries converge; compaction bounds partition depth. Near-hash (hamming
1..3) drops are additionally hash-verified against the honest DuckDB
oracle by the m12 registry query, where the fixtures contain real
near-pairs."""

from __future__ import annotations

import os

from censo_escolar_spark.operators.multimodal import fake_decode
from censo_escolar_spark.streaming.imagededup import (
    apply_image_dedup_batch,
    maintain_image_corpus,
    read_published_hashes,
)

# identical bytes -> identical pHash. fake_decode seeds from (length,
# first byte, last byte) ONLY, so distinct test payloads must differ in
# length or last byte to get distinct hashes.
IMG_A = b"\x89PNG" + b"class-a-1"
IMG_B = b"\x89PNG" + b"class-b-22"
IMG_C = b"\x89PNG" + b"class-c-333"


def _published_ids(spark, state):
    return sorted(r.doc_id for r in read_published_hashes(spark, state).collect())


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def _apply(spark, rows, bid, state, **kw):
    apply_image_dedup_batch(
        _batch(spark, rows), bid, state_dir=state, decoder=fake_decode, **kw
    )


def test_image_dedup_batches(spark, tmp_path):
    state = str(tmp_path / "state")
    # batch 0: ids 1,2 share bytes (one class) -> min-id 1 wins; 3 unique
    _apply(spark, [(1, IMG_A), (2, IMG_A), (3, IMG_B)], 0, state)
    assert _published_ids(spark, state) == [1, 3]
    # batch 1: id 4 re-uploads the PUBLISHED image A -> dropped; 5 is new
    _apply(spark, [(4, IMG_A), (5, IMG_C)], 1, state)
    assert _published_ids(spark, state) == [1, 3, 5]


def test_image_dedup_retry_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    _apply(spark, [(1, IMG_A)], 0, state)
    rows = [(2, IMG_A), (3, IMG_B)]
    _apply(spark, rows, 1, state)
    first = _published_ids(spark, state)
    # a retried micro-batch re-reads below its own id and overwrites its
    # own batch partition -> identical outcome, no duplicates
    _apply(spark, rows, 1, state)
    assert _published_ids(spark, state) == first == [1, 3]


def test_image_dedup_compaction_cadence(spark, tmp_path):
    state = str(tmp_path / "state")
    imgs = [IMG_A, IMG_B, IMG_C]
    max_parts = 0
    for bid in range(8):
        payload = b"\x89PNG" + b"u" * (bid + 1) + str(bid).encode()
        _apply(spark, [(100 + bid, payload)], bid, state, compact_every=3)
        root = os.path.join(state, "hashes")
        n = sum(d.startswith("batch=") for d in os.listdir(root))
        max_parts = max(max_parts, n)
    assert max_parts <= 3 + 1
    assert len(_published_ids(spark, state)) == 8  # all unique: all kept
    # the folded index still drops a re-upload of an early batch's image
    _apply(spark, [(999, b"\x89PNG" + b"u" + b"0")], 8, state)
    assert 999 not in _published_ids(spark, state)


def test_gated_clone_prefix_equals_inline_build(spark, tmp_path):
    """The m14 fixture-base amortization contract: a hardlink CLONE of a
    gated store after batches 1-2, extended with the live third gated
    batch, publishes byte-identically to the inline 1-2-3 build. (The
    gate drops ids whose pixel sum is below threshold; batch applies
    are deterministic, so the cloned prefix is bitwise the state the
    inline build produced.)"""
    from pyspark.sql import functions as F

    from censo_escolar_spark.streaming import link_tree
    from censo_escolar_spark.streaming.imagededup import read_published_hashes

    gate = (
        F.expr("aggregate(pixels, CAST(0 AS BIGINT), (a, x) -> a + x)") >= 4000
    )
    batches = [
        [(1, IMG_A), (2, IMG_B)],
        [(3, IMG_A), (4, IMG_C)],
        [(5, IMG_B), (6, b"\x89PNG" + b"class-d-4444")],
    ]
    inline = str(tmp_path / "inline")
    for bid, rows in enumerate(batches, start=1):
        _apply(spark, rows, bid, inline, qc_gate=gate)

    base = str(tmp_path / "base")
    for bid, rows in enumerate(batches[:2], start=1):
        _apply(spark, rows, bid, base, qc_gate=gate)
    clone = str(tmp_path / "clone")
    link_tree(base, clone)
    _apply(spark, batches[2], 3, clone, qc_gate=gate)

    pub = lambda s: sorted(  # noqa: E731
        map(tuple, read_published_hashes(spark, s).collect())
    )
    assert pub(clone) == pub(inline)
    # non-vacuity: the gate actually rejected something in these batches
    assert len(pub(inline)) < sum(len(b) for b in batches)


def test_maintain_image_corpus_end_to_end(spark, tmp_path):
    src = str(tmp_path / "img_src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [(1, IMG_A), (2, IMG_A), (3, IMG_B)]
    spark.createDataFrame(rows, "doc_id bigint, payload binary").coalesce(
        1
    ).write.mode("append").parquet(src)
    imgs = spark.readStream.schema("doc_id bigint, payload binary").parquet(src)
    maintain_image_corpus(
        imgs, state_dir=state, checkpoint=ckpt, decoder=fake_decode
    )
    assert _published_ids(spark, state) == [1, 3]
    assert any(
        d.startswith("batch=") for d in os.listdir(os.path.join(state, "hashes"))
    )


def test_compaction_invariance_random_image_streams(spark, tmp_path):
    """INVARIANCE: a random (seeded) stream of uploads and re-uploads
    publishes the identical set whether or not the batch partitions are
    folded along the way."""
    import random

    rng = random.Random(19970401)
    plain = str(tmp_path / "plain")
    compacted = str(tmp_path / "compacted")
    seen = []
    next_id = 1
    for bid in range(8):
        rows = []
        for _ in range(rng.randint(1, 3)):
            if seen and rng.random() < 0.4:
                payload = rng.choice(seen)  # re-upload of an earlier image
            else:
                payload = b"\x89PNG" + b"p" * rng.randint(1, 12) + bytes(
                    [rng.randint(48, 57)]
                )
                seen.append(payload)
            rows.append((next_id, payload))
            next_id += 1
        for state, every in ((plain, None), (compacted, 3)):
            _apply(spark, rows, bid, state, compact_every=every)
        assert _published_ids(spark, plain) == _published_ids(spark, compacted)


# ---------------------------------------------------------------------------
# Right-to-be-forgotten (apply_image_delete_batch) — the d22/t41/s23
# tombstone discipline on the image store.
# ---------------------------------------------------------------------------


def _ids(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint")


def test_image_forget_removes_and_stops_suppressing(spark, tmp_path):
    from censo_escolar_spark.streaming.imagededup import apply_image_delete_batch

    state = str(tmp_path / "state")
    _apply(spark, [(1, IMG_A), (3, IMG_B)], 0, state)
    # re-upload of published image A -> suppressed
    _apply(spark, [(4, IMG_A)], 1, state)
    assert _published_ids(spark, state) == [1, 3]
    # forget image 1
    apply_image_delete_batch(_ids(spark, [(1,)]), 2, state_dir=state)
    assert _published_ids(spark, state) == [3]
    # a NEW copy of the forgotten image now publishes
    _apply(spark, [(5, IMG_A)], 3, state)
    assert _published_ids(spark, state) == [3, 5]


def test_image_forget_reingest_after_delete_is_live(spark, tmp_path):
    from censo_escolar_spark.streaming.imagededup import apply_image_delete_batch

    state = str(tmp_path / "state")
    _apply(spark, [(1, IMG_A)], 0, state)
    apply_image_delete_batch(_ids(spark, [(1,)]), 1, state_dir=state)
    assert _published_ids(spark, state) == []
    _apply(spark, [(1, IMG_A)], 2, state)
    assert _published_ids(spark, state) == [1]


def test_image_forget_never_published_id_is_noop(spark, tmp_path):
    from censo_escolar_spark.streaming.imagededup import apply_image_delete_batch

    state = str(tmp_path / "state")
    _apply(spark, [(1, IMG_A)], 0, state)
    apply_image_delete_batch(_ids(spark, [(99,)]), 1, state_dir=state)
    assert _published_ids(spark, state) == [1]


def test_image_forget_compaction_physically_reclaims(spark, tmp_path):
    """After the fold, the tombstoned image's (doc_id, phash) row is
    gone from the store's FILES, and the consumed tombstone dropped."""
    from censo_escolar_spark.streaming.imagededup import (
        apply_image_delete_batch,
        compact_image_store,
    )

    state = str(tmp_path / "state")
    _apply(spark, [(1, IMG_A), (3, IMG_B)], 0, state)
    apply_image_delete_batch(_ids(spark, [(1,)]), 1, state_dir=state)
    compact_image_store(spark, state, upto=1)
    assert _published_ids(spark, state) == [3]
    raw = spark.read.parquet(os.path.join(state, "hashes"))
    assert sorted(r.doc_id for r in raw.collect()) == [3]
    deletes = spark.read.parquet(os.path.join(state, "deletes"))
    assert deletes.count() == 0


def test_image_forget_delete_retry_idempotent(spark, tmp_path):
    from censo_escolar_spark.streaming.imagededup import apply_image_delete_batch

    state = str(tmp_path / "state")
    _apply(spark, [(1, IMG_A), (3, IMG_B)], 0, state)
    dels = _ids(spark, [(1,)])
    apply_image_delete_batch(dels, 1, state_dir=state)
    first = _published_ids(spark, state)
    apply_image_delete_batch(dels, 1, state_dir=state)
    assert _published_ids(spark, state) == first == [3]


def test_image_snapshot_reads(spark, tmp_path):
    """Time-travel (m16): `below=` horizons resolve the index exactly as
    it stood after each batch — including across a delete."""
    from censo_escolar_spark.streaming.imagededup import (
        apply_image_delete_batch,
        read_published_hashes,
    )

    state = str(tmp_path / "state")
    _apply(spark, [(1, IMG_A)], 0, state)
    _apply(spark, [(3, IMG_B)], 1, state)
    apply_image_delete_batch(_ids(spark, [(1,)]), 2, state_dir=state)
    _apply(spark, [(5, IMG_C)], 3, state)

    def at(below):
        return sorted(
            r.doc_id
            for r in read_published_hashes(spark, state, below=below).collect()
        )

    assert at(1) == [1]
    assert at(2) == [1, 3]
    assert at(3) == [3]      # delete visible at its horizon
    assert at(None) == [3, 5]


def test_image_delete_invariance_random_streams(spark, tmp_path):
    """INVARIANCE with deletes interleaved: a seeded stream of uploads,
    re-uploads and forget-batches resolves the identical live set
    whether or not the history is folded along the way (the fold is
    delete-aware: reclaimed rows never resurrect)."""
    import random

    from censo_escolar_spark.streaming.imagededup import apply_image_delete_batch

    rng = random.Random(20260817)
    plain = str(tmp_path / "plain")
    compacted = str(tmp_path / "compacted")
    seen, published_guess = [], []
    next_id = 1
    for bid in range(10):
        if published_guess and rng.random() < 0.3:
            victim = rng.choice(published_guess)
            for state, every in ((plain, None), (compacted, 3)):
                apply_image_delete_batch(
                    _ids(spark, [(victim,)]), bid, state_dir=state,
                    compact_every=every,
                )
        else:
            rows = []
            for _ in range(rng.randint(1, 3)):
                if seen and rng.random() < 0.4:
                    payload = rng.choice(seen)
                else:
                    payload = b"\x89PNG" + b"q" * rng.randint(1, 12) + bytes(
                        [rng.randint(48, 57)]
                    )
                    seen.append(payload)
                rows.append((next_id, payload))
                next_id += 1
            for state, every in ((plain, None), (compacted, 3)):
                _apply(spark, rows, bid, state, compact_every=every)
        published_guess = _published_ids(spark, plain)
        assert published_guess == _published_ids(spark, compacted)
