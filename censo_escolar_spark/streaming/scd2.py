"""Streaming SCD2 maintenance: keep a Type-2 dimension current from an
event stream, one micro-batch at a time.

Each ``foreachBatch`` invocation builds the batch's runs locally
(``operators/scd2.scd2_intervals`` over just the batch) and stitches
them into the prior snapshot (``stitch_runs``) — history is NEVER
rescanned; the per-batch cost is O(batch + state-of-touched-keys).

Exactly-once: state versions are written to
``state_dir/version=<batch_id>`` and a batch reads the LATEST version
strictly below its own batch id. Structured Streaming may re-run a
micro-batch with the same batch id after a failure; the retry then
reads the same prior version the first attempt read and fully
overwrites its own version directory — a half-written attempt can
never corrupt its input (same discipline as
``windows.idempotent_parquet_sink``).

Scale note: a version here is a full snapshot (fixture-friendly). At
100 TB the snapshot is hash-bucketed by key and a batch rewrites only
buckets containing its keys plus a manifest — the stitch plan is
unchanged (it already touches only prior-open rows per key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.operators.scd2 import scd2_intervals, stitch_runs

_STATE_SCHEMA = (
    "user_id bigint, run_id bigint, state string, valid_from timestamp,"
    " valid_to timestamp, is_current boolean, n_events bigint"
)


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


def read_scd2_state(
    spark: SparkSession, state_dir: str, *, below: int | None = None
) -> DataFrame:
    """Latest committed snapshot (empty frame if none yet)."""
    v = _latest_version(state_dir, below if below is not None else 1 << 62)
    if v is None:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return spark.read.parquet(os.path.join(state_dir, f"version={v}"))


def apply_scd2_batch(
    batch_df: DataFrame, batch_id: int, *, state_dir: str
) -> None:
    """The foreachBatch body (exposed for direct testing / backfills)."""
    spark = batch_df.sparkSession
    prior = read_scd2_state(spark, state_dir, below=batch_id)
    batch_runs = scd2_intervals(batch_df)
    new_state = stitch_runs(prior, batch_runs)
    out = os.path.join(state_dir, f"version={batch_id}")
    new_state.write.mode("overwrite").parquet(out)


def maintain_scd2(
    events: DataFrame, *, state_dir: str, checkpoint: str
) -> None:
    """Drain everything currently available through the SCD2 maintainer
    (availableNow trigger — the test/backfill entry point; a production
    stream would run the same query continuously)."""
    q = (
        events.writeStream.foreachBatch(
            lambda df, bid: apply_scd2_batch(df, bid, state_dir=state_dir)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
