"""Sinks: hive-partitioned parquet with deterministic output sizing.

Reference parity (SURVEY.md §2a/§2f):
- S4 partitioned snappy parquet, append     (reference transform.py:172-175)
- X1 repartition(1) for small tables        (reference transform.py:184-195)
- X2 salted skew-balanced repartition       (reference transform.py:155-169)

X2 — the reference's only piece of hand-rolled physical planning — is
replaced by ``maxRecordsPerFile`` + AQE: no extra count+join+rand() stages,
deterministic layout, identical row-content. ``salted_repartition`` is kept
as a documented fallback for engines/readers that need balanced in-memory
partitions rather than balanced files.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ~120 MB of snappy parquet for the reference's wide tables
#: (README.md:122-124, transform.py:155).
DEFAULT_MAX_RECORDS_PER_FILE = 2_000_000


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    mode: str = "append",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    compression: str = "snappy",
) -> None:
    """Hive-partitioned snappy parquet sink with bounded file sizes.

    Replaces the reference's count→join→rand()-salt→repartition recipe
    (X2, transform.py:155-169) with the writer-level ``maxRecordsPerFile``
    cap: Spark splits each task's output at the cap, so file sizes are
    bounded regardless of key skew, with zero extra shuffles.
    """
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_single_file(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    *,
    mode: str = "append",
    compression: str = "snappy",
) -> None:
    """Small-table sink: one parquet file per partition (X1).

    ``repartition(1)`` mirrors reference transform.py:184-195 — correct for
    dimension-sized tables only; never use on fact tables (single-task write).
    """
    writer = df.repartition(1).write.mode(mode).option("compression", compression)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def salted_repartition(
    df: DataFrame,
    partition_by: Sequence[str],
    rows_per_partition: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> DataFrame:
    """Skew-balanced repartition (fallback form of X2, transform.py:155-169).

    Computes per-key counts, broadcasts them back, and adds a random salt
    scaled to each key's row count so that heavy keys spread over
    ``ceil(count / rows_per_partition)`` partitions. The count side is one
    row per key — Spark auto-broadcasts the join (J1, transform.py:159).

    Prefer ``write_partitioned_parquet`` (maxRecordsPerFile) for file
    sizing; use this only when downstream *in-memory* balance matters.
    """
    keys = list(partition_by)
    counts = df.groupBy(*keys).count()
    salted = (
        df.join(F.broadcast(counts), on=keys)
        .withColumn(
            "__salt",
            (F.rand() * F.col("count") / F.lit(rows_per_partition)).cast("int"),
        )
        .repartition(*keys, "__salt")
        .drop("count", "__salt")
    )
    return salted


def write_table(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Generic format-dispatched sink (parquet / orc / json / csv)."""
    writer = df.write.format(format).mode(mode)
    if format == "csv":
        writer = writer.option("header", True)
    writer.options(**options).save(path)
