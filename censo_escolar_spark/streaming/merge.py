"""Streaming MERGE (CDC upsert) maintenance: keep a keyed table current
from a change stream, one micro-batch at a time.

Each ``foreachBatch`` invocation compacts its batch to the LAST image
per key (``operators/compact.latest_by_key`` semantics inline — a CDC
batch may carry several ops for one key) and applies it to the prior
snapshot with ``operators/merge.merge_upsert`` — the single full-outer
hash join MERGE plan.

Exactly-once follows the versioned-snapshot discipline of
``streaming/scd2.py``: state versions land in
``state_dir/version=<batch_id>`` and a batch reads the LATEST version
strictly below its own batch id. A retried micro-batch (same batch id)
re-reads the same prior version and fully overwrites its own version
directory, so replays converge to the identical snapshot instead of
double-applying.

Scale note: a version here is a full snapshot (fixture-friendly). At
100 TB the snapshot is hash-bucketed by key; a batch rewrites only the
buckets containing its keys plus a manifest — the merge plan itself is
unchanged (and exchange-free over a bucketed base, see
``operators/merge.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from censo_escolar_spark.operators.merge import merge_upsert


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


def read_merged_state(
    spark: SparkSession,
    state_dir: str,
    *,
    schema: str,
    below: int | None = None,
) -> DataFrame:
    """Latest committed snapshot (empty frame of ``schema`` if none)."""
    v = _latest_version(state_dir, below if below is not None else 1 << 62)
    if v is None:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(os.path.join(state_dir, f"version={v}"))


def apply_merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_dir: str,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    schema: str,
) -> None:
    """The foreachBatch body (exposed for direct testing / backfills).

    ``batch_df`` carries (key, op, seq, payload...); within the batch
    the row with the highest ``seq_col`` per key wins (ties break on
    op — a deterministic total order is the CDC contract), then the
    one-image-per-key batch merges into the prior snapshot.
    """
    spark = batch_df.sparkSession
    prior = read_merged_state(spark, state_dir, schema=schema, below=batch_id)
    w = Window.partitionBy(key_col).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    last_image = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", seq_col)
    )
    new_state = merge_upsert(prior, last_image, key_col, op_col=op_col)
    out = os.path.join(state_dir, f"version={batch_id}")
    new_state.write.mode("overwrite").parquet(out)


def maintain_merged_table(
    cdc: DataFrame,
    *,
    state_dir: str,
    checkpoint: str,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    schema: str,
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
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
