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
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "censo_escolar_spark", **overrides: str) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_LOCAL_DEFAULTS)
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
