"""Data-quality expectations — a one-pass audit report per table.

dbt-test / Great-Expectations-shaped checks expressed as Spark
aggregates: each table contributes ONE scan computing every row-level
expectation as a conditional count (map-side partial aggregation, no
shuffle beyond the single 1-row combine), plus optional cross-table
referential checks as anti-join counts. The report is a tiny
(check, violations, total, ok) table — the thing a 100 TB pipeline
gates a publish step on.

Row-level checks batch into one aggregate per table on purpose: N
separate check queries would scan the fact table N times; one
projection computing N conditional sums scans it once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_check(col: str) -> tuple[str, Column]:
    return f"{col}_not_null", F.col(col).isNull()


def range_check(col: str, lo: float, hi: float) -> tuple[str, Column]:
    return f"{col}_in_range", ~F.col(col).between(lo, hi)


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return f"{col}_accepted", ~F.col(col).isin(values)


def row_checks(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """All row-level expectations of one table in a single scan.

    Each check is (name, violation_predicate); the aggregate emits one
    report row per check."""
    agg = df.agg(
        F.count("*").alias("__total"),
        *[
            F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
            for name, pred in checks
        ],
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check"),
                        F.col(name).alias("violations"),
                        F.col("__total").alias("total"),
                    )
                    for name, _ in checks
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.check", "r.violations", "r.total")


def unique_check(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Duplicate-key count: rows beyond the first per key."""
    dups = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("bigint").alias("violations"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("total"),
        )
    )
    return dups.select(F.lit(name).alias("check"), "violations", "total")


def referential_check(
    child: DataFrame, parent: DataFrame, on: list[tuple[str, str]], name: str
) -> DataFrame:
    """Orphaned-foreign-key count (left-anti join, broadcast when the
    parent is dimension-sized — Catalyst/AQE sizes it)."""
    cond = [child[c] == parent[p] for c, p in on]
    orphans = child.join(parent, cond, "left_anti")
    total = child.select(F.count("*").cast("bigint").alias("total"))
    return (
        orphans.agg(F.count("*").cast("bigint").alias("violations"))
        .crossJoin(total)
        .select(F.lit(name).alias("check"), "violations", "total")
    )


def report(*parts: DataFrame) -> DataFrame:
    """Stack check outputs into the final audit report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check",
        "violations",
        "total",
        (F.col("violations") == 0).alias("ok"),
    )
