"""Interval-union (gaps-and-islands) over variable-length intervals.

The general form of sessionization: merge every overlapping-or-touching
``[start, end]`` interval per key into maximal "islands". Unlike
``session_window`` (constant gap), interval lengths here are arbitrary
per row, so the operator is the classic running-max-end sweep:

  1. one shuffle on the key (window partition),
  2. a running ``max(end)`` over rows sorted by (start, end, tiebreak),
  3. a new island whenever the current start exceeds every prior end,
  4. island ids via a running sum of the new-island flags.

Scale shape: cost is one sort per key partition — the same plan Spark
uses for any keyed window. No driver collection, no cross-row Python.
Skewed keys (one user with millions of intervals) sort within one
partition; that is inherent to per-key ordering semantics (same bound
as session_window itself).

Determinism: all three window orderings use the identical total order
(start, end, tiebreak) so engines agree on island assignment even when
duplicate (start, end) rows exist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge overlapping/touching intervals per key into islands.

    Returns one row per island: ``key, island_id, island_start,
    island_end, n_rows``. Touching intervals (prior end == next start)
    merge; strictly disjoint ones do not.
    """
    order = [F.col(start_col), F.col(end_col), F.col(tiebreak_col)]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(
        key_col,
        tiebreak_col,
        start_col,
        end_col,
        F.when(prev_max_end >= F.col(start_col), F.lit(0))
        .otherwise(F.lit(1))
        .alias("__new_island"),
    )
    wi = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = flagged.withColumn("island_id", F.sum("__new_island").over(wi))
    return islands.groupBy(key_col, "island_id").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count("*").cast("bigint").alias("n_rows"),
    )


def covered_micros(start: Column, end: Column) -> Column:
    """Exact integer microseconds covered by an island (fold-order-free)."""
    return F.timestamp_diff("MICROSECOND", start, end)
