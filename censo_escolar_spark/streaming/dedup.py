"""Streaming corpus ingestion with dedup against the published corpus:
the streaming twin of ``operators/dedup.incremental_dedup`` (d14).

Each micro-batch of crawled documents is deduped against everything
already published — a new doc near-dup to a published one is dropped,
survivors near-dedup among themselves, and only cluster winners append
to the published state. The drop-then-cluster semantics (and their
deliberate divergence from full recompute: increments never
retroactively delete published docs) are the operator's; this module
only adds the micro-batch state discipline.

State is the SIGNATURE INDEX, not text: the published side is stored as
per-doc minhash sketches ``(id, signature, sh_set)`` plus the exploded
band-key index ``(id, band_idx, band_hash)`` partitioned by a band-hash
bucket. An increment probes the stored index with an equi-join
(``operators/dedup.incremental_dedup_indexed``) — the published text is
NEVER re-read, re-shingled, or re-hashed, so per-batch work is
O(batch), independent of corpus size. Published text lives in a
separate ``corpus`` component that the dedup path only appends to.

Because published docs are never retroactively deleted, the state is
APPEND-ONLY: each micro-batch writes exactly its own
``batch=<batch_id>`` partition of every component (corpus / sketches /
bands) and touches no other partition — O(batch) write amplification,
the streaming analogue of the reference's O1 per-year idempotent
increments (censo_escolar.py:39-60). Exactly-once still holds:
Structured Streaming may re-run a micro-batch with the same batch id;
the retry reads only partitions strictly below its own id and fully
overwrites its own ``batch=<id>`` directories, so replays converge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.operators.dedup import (
    band_keys,
    incremental_dedup_indexed,
    minhash_sketches,
)

#: Band-hash bucket count for the stored index layout. Fixture-sized
#: here; at 100 TB this is thousands, sized so one bucket's band rows
#: fit an executor, and the probe join is co-located on the bucket.
N_BUCKETS = 8


def _component(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _read_component(
    spark: SparkSession, root: str, schema: str, below: int
) -> DataFrame:
    """All committed ``batch=<id>`` partitions strictly below ``below``
    (empty frame of ``schema`` if none). Reads the component ROOT with
    ``batch`` as a partition column and prunes with a filter — listing
    individual batch directories instead trips Spark's partition
    discovery when a component (bands) nests further partition dirs.
    The explicit schema makes empty-batch directories read as zero rows.
    """
    if not any(
        d.startswith("batch=") for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(f"{schema}, batch int")
        .parquet(root)
        .filter(F.col("batch") < below)
        .drop("batch")
    )


def read_published(
    spark: SparkSession,
    state_dir: str,
    *,
    schema: str = "doc_id bigint, text string",
    below: int | None = None,
) -> DataFrame:
    """The published corpus (id, text): union of every committed batch
    partition of the ``corpus`` component (empty frame if none)."""
    hi = below if below is not None else 1 << 62
    return _read_component(spark, _component(state_dir, "corpus"), schema, hi)


def apply_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> None:
    """The foreachBatch body (exposed for direct testing / backfills).

    Reads the stored sketch + band index strictly below ``batch_id``,
    labels the batch with ``incremental_dedup_indexed``, and appends the
    kept docs' text / sketches / band keys as this batch's partitions.
    """
    spark = batch_df.sparkSession
    sketch_schema = (
        f"{id_col} bigint, signature array<bigint>, sh_set array<bigint>"
    )
    band_schema = f"{id_col} bigint, band_idx int, band_hash bigint, bucket int"
    corpus_schema = f"{id_col} bigint, {text_col} string"

    pub_sketches = _read_component(
        spark, _component(state_dir, "sketches"), sketch_schema, batch_id
    )
    pub_bands = _read_component(
        spark, _component(state_dir, "bands"), band_schema, batch_id
    ).drop("bucket")

    batch = batch_df.select(id_col, text_col)
    batch_sk = minhash_sketches(batch, id_col, text_col).localCheckpoint(eager=True)
    labeled = incremental_dedup_indexed(
        batch,
        pub_sketches,
        id_col,
        text_col,
        new_sketches=batch_sk,
        published_bands=pub_bands,
        threshold=threshold,
    )
    keep_ids = labeled.filter(F.col("keep")).select(id_col).localCheckpoint(eager=True)

    part = f"batch={batch_id}"
    kept_sk = batch_sk.join(keep_ids, id_col)
    writes = [
        (batch.join(keep_ids, id_col), "corpus", []),
        (kept_sk, "sketches", []),
        (
            band_keys(kept_sk, id_col).withColumn(
                "bucket", F.pmod(F.col("band_hash"), F.lit(N_BUCKETS)).cast("int")
            ),
            "bands",
            ["bucket"],
        ),
    ]
    for df, name, parts in writes:
        w = df.write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(os.path.join(_component(state_dir, name), part))


def maintain_deduped_corpus(
    docs: DataFrame,
    *,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> None:
    """Drain everything currently available through the dedup maintainer
    (availableNow trigger — the test/backfill entry point; a production
    crawl stream runs the same query continuously)."""
    q = (
        docs.writeStream.foreachBatch(
            lambda df, bid: apply_dedup_batch(
                df,
                bid,
                state_dir=state_dir,
                id_col=id_col,
                text_col=text_col,
                threshold=threshold,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
