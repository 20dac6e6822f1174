"""Bucketed versioned snapshot store for streaming maintainers.

The naive exactly-once snapshot (``state_dir/version=<batch_id>`` holding
the FULL table) rewrites O(state) per micro-batch. This store keeps the
same versioning discipline — a batch reads strictly below its own id and
fully overwrites its own version directory, so retries converge — but
partitions the state by a key-hash bucket and makes each version carry
ONLY the buckets its batch touched:

    state_dir/version=<bid>/bucket=<b>/part-*.parquet   (touched b only)

Reading the state at a point in time resolves, per bucket, the LATEST
version at-or-below that point which wrote the bucket — a driver-side
directory listing bounded by O(versions × buckets) names, the manifest.
Write amplification is O(touched buckets), not O(state); untouched
buckets' files are never listed, read, or rewritten (prior versions are
immutable). At 100 TB the bucket count is sized so one bucket fits an
executor; compaction (folding old versions' buckets into a checkpoint
version) bounds the listing depth.

Retry safety: a re-run of batch N reads the same per-bucket resolution
strictly below N (its own half-written version is excluded) and
overwrites ``version=N`` wholesale — identical to the full-snapshot
discipline, shrunk to touched buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Fixture-sized default; thousands at 100 TB.
N_BUCKETS = 8


def bucket_of(key_col: str, *, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic key-hash bucket (the state's partition column)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _bucket_manifest(state_dir: str, below: int) -> dict[int, int]:
    """bucket -> latest version strictly below ``below`` that wrote it."""
    latest: dict[int, int] = {}
    if not os.path.isdir(state_dir):
        return latest
    for vd in os.listdir(state_dir):
        if not vd.startswith("version="):
            continue
        v = int(vd.split("=", 1)[1])
        if v >= below:
            continue
        for bd in os.listdir(os.path.join(state_dir, vd)):
            if not bd.startswith("bucket="):
                continue
            b = int(bd.split("=", 1)[1])
            if b not in latest or v > latest[b]:
                latest[b] = v
    return latest


def read_bucketed_state(
    spark: SparkSession,
    state_dir: str,
    *,
    schema: str,
    below: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """State as of the latest committed versions strictly below ``below``
    (all versions if None), optionally restricted to ``buckets`` — the
    partition-pruned read a maintainer uses for its touched buckets.
    Returns an empty frame of ``schema`` when nothing is committed; the
    ``bucket`` partition column is dropped (storage detail, not state).
    """
    hi = below if below is not None else 1 << 62
    manifest = _bucket_manifest(state_dir, hi)
    if buckets is not None:
        manifest = {b: v for b, v in manifest.items() if b in set(buckets)}
    paths = [
        os.path.join(state_dir, f"version={v}", f"bucket={b}")
        for b, v in sorted(manifest.items())
    ]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def write_bucketed_version(
    df: DataFrame,
    state_dir: str,
    batch_id: int,
    *,
    key_col: str,
    touched: list[int] | None = None,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Commit ``df`` as version ``batch_id``, partitioned by key bucket.
    ``df`` should contain only the touched buckets' full new contents
    (the merge of prior-touched-buckets with the batch); its bucket
    column is derived here so callers never store it.

    ``touched`` MUST list every bucket the batch read: a touched bucket
    whose new contents are EMPTY (its last key was deleted) writes no
    partition directory, and without a tombstone the manifest would
    resolve that bucket to the stale prior version — resurrecting
    deleted keys. Empty touched buckets are recorded as empty
    ``bucket=<b>`` directories (zero-row parquet reads)."""
    out = os.path.join(state_dir, f"version={batch_id}")
    (
        df.withColumn("bucket", bucket_of(key_col, n_buckets=n_buckets))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    for b in touched or []:
        os.makedirs(os.path.join(out, f"bucket={b}"), exist_ok=True)


def touched_buckets(
    batch_df: DataFrame, key_col: str, *, n_buckets: int = N_BUCKETS
) -> list[int]:
    """Distinct key buckets present in a batch — a bounded collect
    (≤ n_buckets ints), the manifest key for the pruned prior read."""
    rows = (
        batch_df.select(bucket_of(key_col, n_buckets=n_buckets).alias("b"))
        .distinct()
        .collect()
    )
    return sorted(r.b for r in rows)


def compact_state(
    spark: SparkSession,
    state_dir: str,
    *,
    schema: str,
    key_col: str,
    upto: int,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Fold every bucket's latest contents at-or-below version ``upto``
    into a single checkpoint version ``upto`` (all buckets present),
    then delete the older version directories it supersedes.

    This bounds the manifest's listing depth: without compaction the
    per-bucket latest-version resolution walks every version ever
    written. A maintainer calls this periodically (every K batches) —
    the cost is one full-state rewrite amortized over K O(touched)
    batches, the standard LSM checkpoint trade. Safe under the
    single-writer discipline of the streaming maintainers (retries of
    batch N never read at-or-above N, and compaction only replaces
    versions strictly below the checkpoint it writes)."""
    import shutil

    # eager cut: the read includes version=<upto>'s own files, which the
    # write below overwrites — a lazy plan would read what it deletes
    state = read_bucketed_state(
        spark, state_dir, schema=schema, below=upto + 1
    ).localCheckpoint(eager=True)
    write_bucketed_version(
        state,
        state_dir,
        upto,
        key_col=key_col,
        touched=list(range(n_buckets)),
        n_buckets=n_buckets,
    )
    for vd in os.listdir(state_dir):
        if vd.startswith("version=") and int(vd.split("=", 1)[1]) < upto:
            shutil.rmtree(os.path.join(state_dir, vd), ignore_errors=True)
