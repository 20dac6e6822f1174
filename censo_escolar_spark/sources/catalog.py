"""Catalog DDL: external tables over hive-partitioned parquet.

Reference parity (SURVEY.md §2a/§2g):
- S8 external-table DDL — the reference creates BigQuery external tables
  over its parquet output (load_external_tables.sql:3-55, DAG
  censo_escolar.py:178-196); here the same contract is a Spark catalog
  table `USING PARQUET LOCATION ...` with partition discovery, giving
  every SQL consumer partition pruning for free.
- S9 table drop — DROP TABLE IF EXISTS ×N (delete_old_tables.sql:1-9).
- O5 full refresh — drop-then-recreate, idempotent re-runs.

External (unmanaged) tables: DROP removes only catalog metadata, never
the parquet files — exactly the BigQuery-external-table semantics the
reference relies on for its destructive reload loop.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import SparkSession


def create_table_over_parquet(
    spark: SparkSession,
    name: str,
    path: str,
    *,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """S8: register an external table over an existing parquet directory.

    For hive-layout directories the partition columns must be declared
    and then discovered (`recoverPartitions` == MSCK REPAIR TABLE) —
    after that, `WHERE part = x` prunes directories at plan time.
    """
    schema = spark.read.parquet(path).schema
    non_part = [f for f in schema.fields if f.name not in partition_cols]
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in non_part)
    ddl = f"CREATE TABLE IF NOT EXISTS `{name}` ({cols}"
    if partition_cols:
        part_fields = {f.name: f for f in schema.fields if f.name in partition_cols}
        ddl += ", " + ", ".join(
            f"`{c}` {part_fields[c].dataType.simpleString()}" for c in partition_cols
        )
    ddl += f") USING PARQUET"
    if partition_cols:
        ddl += " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_cols) + ")"
    ddl += f" LOCATION '{path}'"
    spark.sql(ddl)
    if partition_cols:
        spark.catalog.recoverPartitions(name)


def drop_table(spark: SparkSession, name: str) -> None:
    """S9: DROP TABLE IF EXISTS — metadata only for external tables."""
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")


def full_refresh(
    spark: SparkSession,
    tables: Mapping[str, str],
    *,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """O5: the reference's load stage — drop all tables, recreate over the
    current parquet roots (censo_escolar.py:322-341). Idempotent."""
    for name in tables:
        drop_table(spark, name)
    for name, path in tables.items():
        create_table_over_parquet(spark, name, path, partition_cols=partition_cols)
