"""Streaming SCD2 maintenance: keep a Type-2 dimension current from an
event stream, one micro-batch at a time.

Each ``foreachBatch`` invocation builds the batch's runs locally
(``operators/scd2.scd2_intervals`` over just the batch) and stitches
them into the prior snapshot (``stitch_runs``) — history is NEVER
rescanned; the per-batch cost is O(batch + state-of-touched-keys).

State lives in the bucketed versioned store (``streaming/bucketstate``):
the dimension is hash-bucketed by key, a batch reads only the buckets
its keys touch and writes a version containing only those buckets' new
contents — O(touched buckets) amplification, never O(state). SCD2
stitching is per-key, so the touched-bucket restriction is lossless;
keys absent from the batch stay in their immutable prior versions.
Exactly-once is the same versioning discipline: a retried micro-batch
resolves the same prior per-bucket versions strictly below its own id
and fully overwrites its own version directory (same discipline as
``windows.idempotent_parquet_sink``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from censo_escolar_spark.operators.scd2 import scd2_intervals, stitch_runs
from censo_escolar_spark.streaming.bucketstate import (
    compact_state,
    read_bucketed_state,
    touched_buckets,
    write_bucketed_version,
)

#: Fold state history into a checkpoint version every K micro-batches
#: (see streaming/merge.py — same bounded-manifest rationale).
COMPACT_EVERY = 16

_STATE_SCHEMA = (
    "user_id bigint, run_id bigint, state string, valid_from timestamp,"
    " valid_to timestamp, is_current boolean, n_events bigint"
)


def read_scd2_state(
    spark: SparkSession, state_dir: str, *, below: int | None = None
) -> DataFrame:
    """Latest committed snapshot (empty frame if none yet)."""
    return read_bucketed_state(spark, state_dir, schema=_STATE_SCHEMA, below=below)


def apply_scd2_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """The foreachBatch body (exposed for direct testing / backfills)."""
    spark = batch_df.sparkSession
    # two consumers (bucket probe + stitch) — cut the window lineage
    batch_runs = scd2_intervals(batch_df).localCheckpoint(eager=True)
    touched = touched_buckets(batch_runs, "user_id")
    prior = read_bucketed_state(
        spark, state_dir, schema=_STATE_SCHEMA, below=batch_id, buckets=touched
    )
    new_buckets = stitch_runs(prior, batch_runs)
    write_bucketed_version(
        new_buckets, state_dir, batch_id, key_col="user_id", touched=touched
    )
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_state(
            spark,
            state_dir,
            schema=_STATE_SCHEMA,
            key_col="user_id",
            upto=batch_id - 1,
        )


def maintain_scd2(
    events: DataFrame,
    *,
    state_dir: str,
    checkpoint: str,
    compact_every: int | None = COMPACT_EVERY,
) -> None:
    """Drain everything currently available through the SCD2 maintainer
    (availableNow trigger — the test/backfill entry point; a production
    stream would run the same query continuously)."""
    q = (
        events.writeStream.foreachBatch(
            lambda df, bid: apply_scd2_batch(
                df, bid, state_dir=state_dir, compact_every=compact_every
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
