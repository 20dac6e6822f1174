"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
``right_ts <= left_ts`` (backward direction; ties included). Implemented
as the union-and-carry-forward trick:

1. tag right rows side=0, left rows side=1, union by name;
2. one window per key, ordered by (ts, side) — right rows at an equal
   timestamp sort before left rows so ties match;
3. ``last(<right payload struct>, ignorenulls=True)`` carries the latest
   right row forward onto each left row;
4. keep only left rows.

Cost: ONE shuffle on the key (the window), regardless of table sizes —
versus the naive inequality-join + groupBy-max which is a quadratic
range join. This is the formulation that survives 100 TB: both inputs
partition by key, and skewed keys are handled by AQE like any window.

Equivalent to DuckDB/Pandas ``ASOF JOIN`` with >= semantics (left join:
unmatched left rows keep NULL payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of left join. Right payload columns (everything except
    the key) must not collide with left column names, except that
    ``right_ts`` may equal ``left_ts`` in name only if distinct columns.

    ``tolerance`` (a SQL interval string, e.g. ``'7 days'``) bounds the
    lookback: a match older than ``left_ts - tolerance`` is treated as
    no match (payload NULLs), pandas-merge_asof-style. The bound is a
    post-projection on the SAME single-shuffle plan — no extra join."""
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    if not payload_cols:
        raise ValueError("right side has no payload columns")
    collisions = set(payload_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right payload columns collide with left: {sorted(collisions)}")

    # A NULL right timestamp must match nothing (DuckDB/pandas ASOF
    # semantics: ts >= NULL is never true). Without this filter the NULL
    # row sorts FIRST (Spark asc = NULLS FIRST) and its payload would be
    # carried forward onto every left row preceding the first real right
    # row. Left rows with NULL ts still sort first themselves and
    # correctly see no match.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.struct(F.col(right_ts).alias("__rts"), *payload_cols).alias("__payload"),
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))

    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))

    if tolerance is None:
        fresh = F.lit(True)
    else:
        fresh = F.col("__match.__rts") >= F.col("__ts") - F.expr(f"interval {tolerance}")
    out = filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.when(fresh, F.col("__match")[c]).alias(c) for c in payload_cols],
    )
    return out


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    on: str | list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (temporal) left join: attach the dimension version
    whose validity interval ``[valid_from, valid_to)`` contains the
    fact's timestamp — the feature-store/SCD2-lookup primitive that
    keeps training data leakage-free (a fact must never see a dimension
    version from its future).

    NOT an interval join: versions per key are ordered and contiguous,
    so the match is "latest version with valid_from <= ts" — exactly
    the backward as-of carry-forward, ONE shuffle on the key via
    ``asof_join``. A post-projection nulls the payload where the
    matched version had already expired (``valid_to <= ts`` — happens
    only for gapped histories, e.g. deleted keys). Empty versions
    (``valid_to == valid_from``, produced by same-timestamp state
    flips) are dropped up front: under half-open semantics they can
    never match, and removing them keeps ``valid_from`` unique per key
    so the as-of tie order is deterministic.
    """
    keys = [on] if isinstance(on, str) else list(on)
    dim2 = dim.filter(
        F.col(valid_to).isNull() | (F.col(valid_to) > F.col(valid_from))
    )
    payload_cols = [c for c in dim2.columns if c not in keys]
    joined = asof_join(
        facts, dim2, on=keys, left_ts=ts_col, right_ts=valid_from
    )
    expired = F.col(valid_to).isNotNull() & (F.col(valid_to) <= F.col(ts_col))
    return joined.select(
        *facts.columns,
        *[
            F.when(~expired, F.col(c)).alias(c)
            for c in payload_cols
        ],
    )
