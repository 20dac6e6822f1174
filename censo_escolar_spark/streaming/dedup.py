"""Streaming corpus ingestion with dedup against the published corpus:
the streaming twin of ``operators/dedup.incremental_dedup`` (d14).

Each micro-batch of crawled documents is deduped against everything
already published — a new doc near-dup to a published one is dropped,
survivors near-dedup among themselves, and only cluster winners append
to the published state. The drop-then-cluster semantics (and their
deliberate divergence from full recompute: increments never
retroactively delete published docs) are the operator's; this module
only adds the micro-batch state discipline.

Exactly-once follows the versioned-snapshot pattern of
``streaming/scd2.py`` / ``streaming/merge.py``: published versions land
in ``state_dir/version=<batch_id>``; a batch reads the latest version
strictly below its own id and fully overwrites its own, so a retried
micro-batch re-reads its original input and converges.

Scale note: the snapshot stores (id, text) at fixture scale. At 100 TB
the published side contributes SIGNATURES only (incremental_dedup's
banding already treats it that way) — the state becomes the stored
band-key index table, bucketed by band hash, probed like a
partition-pruned join; text lives in the corpus sink, not the dedup
state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.operators.dedup import incremental_dedup


def _latest_version(state_dir: str, below: int) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("version=")
    ]
    versions = [v for v in versions if v < below]
    return max(versions, default=None)


def read_published(
    spark: SparkSession,
    state_dir: str,
    *,
    schema: str = "doc_id bigint, text string",
    below: int | None = None,
) -> DataFrame:
    """Latest published snapshot (empty frame of ``schema`` if none)."""
    v = _latest_version(state_dir, below if below is not None else 1 << 62)
    if v is None:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(os.path.join(state_dir, f"version={v}"))


def apply_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> None:
    """The foreachBatch body (exposed for direct testing / backfills)."""
    spark = batch_df.sparkSession
    schema = f"{id_col} bigint, {text_col} string"
    published = read_published(
        spark, state_dir, schema=schema, below=batch_id
    )
    batch = batch_df.select(id_col, text_col)
    if batch.isEmpty():
        new_state = published
    else:
        labeled = incremental_dedup(
            batch, published, id_col, text_col, threshold=threshold
        )
        keep_ids = labeled.filter(F.col("keep")).select(id_col)
        new_state = published.unionByName(batch.join(keep_ids, id_col))
    out = os.path.join(state_dir, f"version={batch_id}")
    new_state.write.mode("overwrite").parquet(out)


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
