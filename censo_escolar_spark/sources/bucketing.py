"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

No reference analogue (the reference's one join is vs a tiny dimension —
SURVEY.md §2c); this is the Spark-native answer to the 100 TB question
the reference never faces: a fact⋈fact equi-join re-run every pipeline
cycle pays a full shuffle of both sides every time. Writing both tables
`bucketBy(n, key)` pays that shuffle ONCE at write; every later join,
aggregation, or dedup on the bucket key reads co-located partitions and
plans with no Exchange on either side (asserted in
tests/test_bucketing.py). `sortBy` within buckets additionally lets the
sort-merge join skip its sort.

The bucket count is a layout contract: both join sides must use the
same `n_buckets`, and at scale it should be sized so one bucket of the
larger table fits an executor core (e.g. 100 TB / 32768 buckets ≈ 3 GB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    name: str,
    *,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet catalog table.

    Bucketing requires the table catalog (`saveAsTable`) — a plain
    `.parquet(path)` write cannot record the bucket spec, and readers
    would re-shuffle.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table with its layout metadata intact.

    (`spark.table`, not `spark.read.parquet` on the files — the bucket
    spec lives in the catalog, and bypassing it silently degrades every
    downstream join back to a full shuffle.)
    """
    return spark.table(name)
