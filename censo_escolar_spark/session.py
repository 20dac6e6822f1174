"""SparkSession construction with scale-aware defaults.

The reference builds a bare session (reference transform.py:15). Here the
session is tuned for the execution model we target: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for any
pandas-interchange path, and explicit shuffle-partition sizing.

On a real cluster the same builder is used with ``master`` left to
spark-submit; locally we default to ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local harness (local[32], 128 GiB). On a
# 1000-executor cluster, shuffle.partitions should be ~2-3x total cores;
# AQE coalesces down from there, so a high initial value is safe.
_LOCAL_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Partition files into ~128 MB tasks (Spark default; stated explicitly
    # because output sizing at 100 TB depends on it).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast dimension tables aggressively: every dim in the star schema
    # (region/nation/customer/supplier/part at dim scale) is far below this.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Local mode runs all 32 task slots inside ONE JVM: heap must be sized
    # for the machine (128 GiB harness), not Spark's 1g default — 8g was
    # enough at sf0.1 but OOM'd the sf1 scale probe (32 concurrent
    # verification tasks × shingle-set buffers). Xmx reserves, it does not
    # commit; override via SPARK_GRAFT_DRIVER_MEM.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "censo_escolar_spark", **overrides: str) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_LOCAL_DEFAULTS)
    conf.update({k: str(v) for k, v in overrides.items()})
    # Measurement hook (same role as SPARK_GRAFT_SPREAD_WIDTH): lets a
    # cold-JVM A/B arm override session confs without a code edit, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.enabled=false;k2=v2".
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, extra.split(";")):
        k, _, v = pair.partition("=")
        conf[k.strip()] = v.strip()
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _TUNED_SESSIONS.add(id(spark))
    return spark


#: Sessions already tuned (built by get_spark, or patched in place).
_TUNED_SESSIONS: set[int] = set()

#: Runtime-settable confs applied to externally-built (bare) sessions.
#: Keyed by conf name -> (bad_default, engine_value): each conf is only
#: overridden when it still holds Spark's out-of-the-box default, so a
#: caller who tuned their own session deliberately is never clobbered.
_RUNTIME_TUNING: dict[str, tuple[str | None, str]] = {
    # 200 shuffle tasks over kB-scale local partitions is pure scheduler
    # overhead; AQE coalesces *down* from the initial number, so a small
    # initial value is right for the harness and a large one for clusters.
    "spark.sql.shuffle.partitions": ("200", "32"),
    # Arrow makes toPandas()/createDataFrame batch-columnar (10-100x).
    "spark.sql.execution.arrow.pyspark.enabled": ("false", "true"),
    # Deterministic wall-clock semantics: TIMESTAMP_NTZ <-> epoch
    # conversions (operators/rangejoin.py) are exact under UTC and the
    # DuckDB oracle compares naive timestamps.
    "spark.sql.session.timeZone": (None, "UTC"),
    # Star-schema dims are all far below 64 MB; broadcast them.
    "spark.sql.autoBroadcastJoinThreshold": ("10485760b", "64m"),
}


def ensure_session_tuned(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to a session the engine did not build.

    The correctness driver hands every query a *bare* SparkSession (no
    configs); with Spark defaults each tiny sf0.01 query pays for 200
    shuffle tasks and row-wise toPandas. All confs touched here are
    runtime-settable and only replace out-of-the-box defaults (timezone
    is pinned to UTC unconditionally: epoch math in the operators assumes
    it, and a DST-bearing session zone would make TIMESTAMP_NTZ -> epoch
    non-monotonic). Idempotent per session object.
    """
    if id(spark) in _TUNED_SESSIONS:
        return spark
    for key, (bad_default, value) in _RUNTIME_TUNING.items():
        try:
            current = spark.conf.get(key, None)
            if bad_default is None or current is None or current == bad_default:
                spark.conf.set(key, value)
        except Exception:  # pragma: no cover - static/unknown conf on some builds
            pass
    _TUNED_SESSIONS.add(id(spark))
    return spark
