"""Incremental rollup maintenance — algebraic partial-aggregate merge.

The warehouse pattern the reference's O1 incrementality gestures at
(census years already in the sink are skipped; here the AGGREGATE is
maintained instead of the raw partitions): a stored rollup holds
mergeable partials (count, sum, min, max — the algebraic aggregates),
and each new batch of raw rows folds in WITHOUT reprocessing history.
At 100 TB this is the difference between an hourly job that scans one
hour and one that scans three years; derived measures (avg) are
computed from the merged partials at read time, never stored.

Spark-first shape: partials()'s groupBy emits map-side partial
aggregation before its shuffle; merge() is a unionByName (no shuffle)
followed by ONE groupBy whose sum/min/max re-combine the partials —
the same combine functions Spark itself uses between partial and final
aggregation, so merging N batches is associative and order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (partial column, raw-side aggregate, merge-side aggregate) per measure.
_PARTIALS = ("cnt", "sum_v", "min_v", "max_v")


def partials(raw: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Mergeable partial aggregates of one raw batch."""
    return raw.groupBy(*group_cols).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge(*states: DataFrame) -> DataFrame:
    """Combine any number of partial-aggregate states (associative)."""
    if not states:
        raise ValueError("nothing to merge")
    group_cols = [c for c in states[0].columns if c not in _PARTIALS]
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Read-time derived measures from the stored partials."""
    return state.select(
        *[c for c in state.columns if c not in _PARTIALS],
        F.col("cnt").cast("bigint").alias("n"),
        F.col("sum_v").cast("double").alias("total"),
        # exact decimal sum cast to double BEFORE one IEEE division —
        # decimal/bigint division scales differ across engines (t02 rule)
        (F.col("sum_v").cast("double") / F.col("cnt").cast("double")).alias("mean"),
        F.col("min_v").alias("vmin"),
        F.col("max_v").alias("vmax"),
    )
