"""Streaming image-corpus dedup: the image-modality twin of the text
maintainer (streaming/dedup.py), keyed on perceptual hashes.

Each micro-batch of crawled images is deduped against everything already
published — a new image whose pHash is within ``max_hamming`` of a
published hash drops, within-batch survivors cluster on the CONTRACTED
hash-value graph (``operators/multimodal.phash_clusters``) and only
cluster winners (min doc id) publish. Same drop-then-cluster increment
semantics as the text maintainer: increments never retroactively delete
published images.

State is the HASH INDEX, not payloads: each batch appends exactly its
own ``batch=<id>`` partition of one ``hashes`` component, rows
``(doc_id, phash)`` — 16 bytes per published image. Unlike the text
maintainer — where re-deriving the probe index would re-read and
re-shingle corpus TEXT, so sketches and band keys must be persisted —
the stored pHash IS the complete probe state: band keys are four 16-bit
slices of the hash, re-derived per probe at negligible cost. A batch
therefore costs O(batch decode + distinct-hash band join), never
O(corpus), and no payload byte is ever re-read.

Exactly-once: a retried micro-batch reads only partitions strictly
below its own id and fully overwrites its own ``batch=<id>`` directory.
Every ``compact_every`` batches the strictly-prior partitions fold into
one (``streaming/dedup.compact_batch_store`` — the crash-safe two-phase
marker commit), bounding listing depth on a long-running crawl.

Right-to-be-forgotten (``apply_image_delete_batch``) follows the text
maintainer's tombstone discipline exactly (streaming/dedup.py): id
tombstones append as their own ``deletes`` batches, readers and the
ingest probe subtract them with the arrival-ordered anti-join, and the
cadence fold physically reclaims tombstoned (doc_id, phash) rows from
the files — a forgotten image also stops suppressing future near-dups
the moment its delete batch commits (right-to-be-forgotten matters
MOST for images).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.operators import multimodal as M
from censo_escolar_spark.streaming.dedup import (
    _component,
    _read_component,
    _subtract_deleted,
    _tombstones,
    compact_batch_store,
    recover_batch_store,
)

#: Fold the ``batch=`` partition history every K micro-batches.
COMPACT_EVERY = 16

_HASH_SCHEMA = "doc_id bigint, phash bigint"
_LAYOUT = {"hashes": (_HASH_SCHEMA, []), "deletes": ("doc_id bigint", [])}


def read_published_hashes(
    spark: SparkSession, state_dir: str, *, below: int | None = None
) -> DataFrame:
    """The published LIVE image index (doc_id, phash): union of every
    committed batch partition below the horizon (empty frame if none),
    minus committed right-to-be-forgotten tombstones below the same
    horizon. A delete-free store keeps its exact pre-delete read plan
    (the tombstone probe short-circuits, see dedup._tombstones)."""
    recover_batch_store(spark, state_dir, list(_LAYOUT))
    hi = below if below is not None else 1 << 62
    tombs = _tombstones(spark, state_dir, "doc_id", hi)
    hashes = _read_component(
        spark,
        _component(state_dir, "hashes"),
        _HASH_SCHEMA,
        hi,
        keep_batch=tombs is not None,
    )
    if tombs is None:
        return hashes
    return _subtract_deleted(hashes, tombs, "doc_id").drop("batch")


def _fold_image_deletes(frames: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Compaction fold: physically reclaim tombstoned (doc_id, phash)
    rows and drop the consumed tombstones — dedup._fold_corpus_deletes
    for the one-component image store. Live-view preserving (readers
    resolve hashes MINUS arrival-ordered deletes, unchanged by removing
    matched pairs); degenerates to the plain union with no tombstones."""
    tombs = frames["deletes"]
    return {
        "hashes": _subtract_deleted(frames["hashes"], tombs, "doc_id").drop(
            "batch"
        ),
        "deletes": tombs.filter(F.lit(False)).drop("batch"),
    }


def compact_image_store(
    spark: SparkSession, state_dir: str, *, upto: int
) -> None:
    """Fold the image store's ``batch=`` history at-or-below ``upto``
    into one partition per component — see ``compact_batch_store`` for
    the crash-safe protocol; the fold is DELETE-AWARE (a delete-blind
    fold would rebatch rows past their tombstones and resurrect them,
    the lexindex-documented hazard)."""
    compact_batch_store(
        spark, state_dir, upto=upto, layout=_LAYOUT, fold=_fold_image_deletes
    )


def apply_image_delete_batch(
    ids_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """Right-to-be-forgotten: delete a batch of image doc ids from the
    published hash index.

    The ids append as this batch's partition of the ``deletes``
    component — O(batch), no published partition is read or rewritten.
    Effects (the arrival-ordered tombstone semantics shared with the
    text/IVF/BM25 stores):

    - ``read_published_hashes`` no longer returns the images;
    - later ingest batches no longer drop near-dups of them (the probe
      reads the live index) — a forgotten image cannot keep influencing
      retention;
    - the cadence fold physically reclaims the (doc_id, phash) rows
      from the store's files (``_fold_image_deletes``);
    - a re-ingest of the same id after the delete is a new live row;
    - deleting a never-published id is a harmless no-op.

    Retry-idempotent: a re-run fully overwrites its own ``batch=<id>``
    directory and reads nothing newer."""
    spark = ids_df.sparkSession
    recover_batch_store(spark, state_dir, list(_LAYOUT))
    ids_df.select(F.col("doc_id").cast("bigint").alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(posixpath.join(_component(state_dir, "deletes"), f"batch={batch_id}"))
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_image_store(spark, state_dir, upto=batch_id - 1)


def apply_image_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    decoder: M.Decoder = M.real_decode,
    max_hamming: int = 3,
    n_bands: int = 4,
    qc_gate=None,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """The foreachBatch body (exposed for direct testing / backfills).

    Decode → pHash the batch once (the only payload touch), probe the
    stored index at the VALUE level — identical hashes by equi-join,
    near hashes by the pigeonhole band join + exact bit_count — drop
    hit docs, cluster survivors on the contracted value graph, append
    the winners' (doc_id, phash) as this batch's partition.

    ``qc_gate`` (optional Column predicate over the DECODED frame —
    ``id, h, w, pixels``) is the image-quality admission gate (m14):
    rejected images are dropped right after the one decode, so they
    never cost DCT hashing, band joins, or index writes — the image
    twin of the d24 classifier gate, sharing the batch's single decode
    instead of paying a second one."""
    spark = batch_df.sparkSession
    recover_batch_store(spark, state_dir, list(_LAYOUT))
    pub = read_published_hashes(spark, state_dir, below=batch_id)

    decoded = M.decode_media(
        batch_df.select(F.col(id_col), F.col(bytes_col)),
        id_col=id_col,
        bytes_col=bytes_col,
        decoder=decoder,
    )
    if qc_gate is not None:
        decoded = decoded.filter(qc_gate)
    # probe + cluster + append all consume the hashes; one eager cut
    # stops the decode + DCT pipeline re-running per consumer
    hashes = M.phash64(decoded).localCheckpoint(eager=True)

    new_vals = hashes.select("phash").distinct()
    pub_vals = pub.select("phash").distinct()
    ident = new_vals.join(pub_vals, "phash").select("phash")
    a = M._phash_banded(new_vals, n_bands).alias("a")
    b = M._phash_banded(pub_vals, n_bands).alias("b")
    near = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .filter(
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            <= max_hamming
        )
        .select(F.col("a.phash").alias("phash"))
    )
    hit_vals = ident.unionByName(near).distinct()
    survivors = hashes.join(hit_vals, "phash", "left_anti")
    labeled = M.phash_clusters(
        survivors, "id", max_hamming=max_hamming, n_bands=n_bands
    )
    keep_ids = labeled.filter(F.col("keep")).select("id")
    kept = survivors.join(keep_ids, "id").select(
        F.col("id").alias("doc_id"), "phash"
    )
    kept.write.mode("overwrite").parquet(
        posixpath.join(_component(state_dir, "hashes"), f"batch={batch_id}")
    )
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_image_store(spark, state_dir, upto=batch_id - 1)


def maintain_image_corpus(
    images: DataFrame,
    *,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    decoder: M.Decoder = M.real_decode,
    max_hamming: int = 3,
    qc_gate=None,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """Drain everything currently available through the image-dedup
    maintainer (availableNow trigger — the test/backfill entry point; a
    production crawl stream runs the same query continuously)."""
    q = (
        images.writeStream.foreachBatch(
            lambda df, bid: apply_image_dedup_batch(
                df,
                bid,
                state_dir=state_dir,
                id_col=id_col,
                bytes_col=bytes_col,
                decoder=decoder,
                max_hamming=max_hamming,
                qc_gate=qc_gate,
                compact_every=compact_every,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
