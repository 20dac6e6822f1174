"""Streaming MERGE (CDC upsert) maintenance: keep a keyed table current
from a change stream, one micro-batch at a time.

Each ``foreachBatch`` invocation compacts its batch to the LAST image
per key (``operators/compact.latest_by_key`` semantics inline — a CDC
batch may carry several ops for one key) and applies it to the prior
snapshot with ``operators/merge.merge_upsert`` — the single full-outer
hash join MERGE plan.

State lives in the bucketed versioned store (``streaming/bucketstate``):
the snapshot is hash-bucketed by key, a batch reads only the buckets its
keys touch (partition-pruned manifest resolution) and writes a version
containing only those buckets' new contents — O(touched buckets) read
and write amplification per micro-batch, never O(state). Exactly-once
is unchanged: a retried micro-batch (same batch id) resolves the same
prior per-bucket versions strictly below its own id and fully overwrites
its own version directory, so replays converge. MERGE is per-key, so
restricting the prior to touched buckets is lossless — keys in other
buckets cannot be affected by this batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from censo_escolar_spark.operators.merge import merge_upsert
from censo_escolar_spark.streaming.bucketstate import (
    compact_state,
    read_bucketed_state,
    touched_buckets,
    write_bucketed_version,
)

#: Fold state history into a checkpoint version every K micro-batches,
#: so manifest listing depth is bounded without operator intervention.
#: The trade: one full-state rewrite amortized over K O(touched) batches.
COMPACT_EVERY = 16


def read_merged_state(
    spark: SparkSession,
    state_dir: str,
    *,
    schema: str,
    below: int | None = None,
) -> DataFrame:
    """Latest committed snapshot (empty frame of ``schema`` if none)."""
    return read_bucketed_state(spark, state_dir, schema=schema, below=below)


def apply_merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    schema: str,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """The foreachBatch body (exposed for direct testing / backfills).

    ``batch_df`` carries (key, op, seq, payload...); within the batch
    the row with the highest ``seq_col`` per key wins (ties break on
    op — a deterministic total order is the CDC contract), then the
    one-image-per-key batch merges into the prior contents of ONLY the
    buckets the batch touches.

    Every ``compact_every`` batches the strictly-prior history (versions
    ≤ batch_id − 1) is folded into one checkpoint version, so manifest
    depth stays bounded on a long-running stream; a retried batch still
    resolves the same prior state below its own id (the fold is
    contents-preserving), and the fold itself is crash-safe
    (``bucketstate.compact_state``'s two-phase commit).
    """
    spark = batch_df.sparkSession
    w = Window.partitionBy(key_col).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    last_image = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", seq_col)
        # two consumers (bucket probe + merge) — cut the window lineage
        .localCheckpoint(eager=True)
    )
    touched = touched_buckets(last_image, key_col)
    prior = read_bucketed_state(
        spark, state_dir, schema=schema, below=batch_id, buckets=touched
    )
    new_buckets = merge_upsert(prior, last_image, key_col, op_col=op_col)
    write_bucketed_version(
        new_buckets, state_dir, batch_id, key_col=key_col, touched=touched
    )
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_state(
            spark, state_dir, schema=schema, key_col=key_col, upto=batch_id - 1
        )


def maintain_merged_table(
    cdc: DataFrame,
    *,
    state_dir: str,
    checkpoint: str,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    schema: str,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """Drain everything currently available through the MERGE maintainer
    (availableNow trigger — the test/backfill entry point; a production
    stream runs the same query continuously)."""
    q = (
        cdc.writeStream.foreachBatch(
            lambda df, bid: apply_merge_batch(
                df,
                bid,
                state_dir=state_dir,
                key_col=key_col,
                seq_col=seq_col,
                op_col=op_col,
                schema=schema,
                compact_every=compact_every,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
