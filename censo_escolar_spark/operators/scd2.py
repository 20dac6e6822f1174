"""SCD Type-2 interval building + incremental (streaming) maintenance.

``scd2_intervals`` compresses an in-order event stream into validity
intervals ``[valid_from, valid_to)`` per key — the batch form, oracle-
checked as query e15. ``stitch_runs`` merges a NEW batch of runs into a
prior state snapshot without rescanning history: the incremental form
used by the streaming maintainer (streaming/scd2.py).

Contract: events are append-only and in order per key across batches
(the standard CDC ordering guarantee). Within a batch, ordering is
(ts, event_id) — re-sorted locally, so intra-batch disorder is fine.

Scale shape: every step is one shuffle on the key. The stitch joins
the batch's FIRST run to the prior OPEN interval (one row per key on
each side); closed history rides along untouched — at 100 TB the state
table is bucketed by key and only buckets containing batch keys are
rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    e: DataFrame,
    *,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key state validity intervals (change-marker runs + lead
    chaining; three windows over ONE key partitioning)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = e.withColumn(
        "chg",
        F.when(
            ~F.col(state_col).eqNullSafe(F.lag(state_col).over(w)), 1
        ).otherwise(0),
    )
    runs = marked.withColumn("run_id", F.sum("chg").over(wc).cast("bigint"))
    collapsed = runs.groupBy(key_col, "run_id").agg(
        F.first(state_col).alias("state"),  # constant within a run
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wr = Window.partitionBy(key_col).orderBy("run_id")
    return collapsed.select(
        key_col,
        "run_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(wr).alias("valid_to"),
        F.lead("valid_from").over(wr).isNull().alias("is_current"),
        "n_events",
    )


def stitch_runs(
    prior: DataFrame, batch_runs: DataFrame, *, key_col: str = "user_id"
) -> DataFrame:
    """Merge a batch's locally-built runs into a prior SCD2 snapshot.

    Per key: if the prior OPEN interval's state equals the batch's
    first-run state, the runs fuse (valid_from and event counts carry
    over); otherwise the open interval closes at the batch's first
    timestamp. Batch run ids are re-based onto the prior numbering.
    Keys absent from the batch pass through untouched.
    """
    out_cols = [
        key_col, "run_id", "state", "valid_from", "valid_to",
        "is_current", "n_events",
    ]
    prior_closed = prior.filter(~F.col("is_current"))
    prior_open = prior.filter(F.col("is_current")).select(
        F.col(key_col),
        F.col("run_id").alias("p_run"),
        F.col("state").alias("p_state"),
        F.col("valid_from").alias("p_from"),
        F.col("n_events").alias("p_n"),
    )
    first_runs = batch_runs.filter(F.col("run_id") == 1).select(
        F.col(key_col),
        F.col("state").alias("f_state"),
        F.col("valid_from").alias("f_from"),
    )
    # one row per key: stitch decision
    decision = prior_open.join(first_runs, key_col, "full").select(
        key_col,
        "p_run", "p_state", "p_from", "p_n",
        "f_state", "f_from",
        (
            F.col("p_state").isNotNull()
            & F.col("f_state").isNotNull()
            & F.col("p_state").eqNullSafe(F.col("f_state"))
        ).alias("merge"),
    )
    # prior open interval: absorbed on merge; closed if the batch moved
    # on; untouched if the key saw no batch events
    kept_open = (
        decision.filter(F.col("p_run").isNotNull() & ~F.col("merge"))
        .select(
            F.col(key_col),
            F.col("p_run").alias("run_id"),
            F.col("p_state").alias("state"),
            F.col("p_from").alias("valid_from"),
            F.col("f_from").alias("valid_to"),  # NULL when no batch rows
            F.col("f_from").isNull().alias("is_current"),
            F.col("p_n").alias("n_events"),
        )
    )
    # batch runs: re-base ids, fold the merged run's carry-over
    adj = batch_runs.join(
        decision.select(
            key_col,
            "merge",
            F.coalesce("p_run", F.lit(0)).alias("base0"),
            "p_from",
            F.coalesce("p_n", F.lit(0)).alias("p_n0"),
        ),
        key_col,
        "left",
    )
    rebased = adj.select(
        F.col(key_col),
        (
            F.col("run_id")
            + F.when(F.col("merge"), F.col("base0") - 1).otherwise(
                F.coalesce("base0", F.lit(0))
            )
        ).cast("bigint").alias("run_id"),
        "state",
        F.when(
            F.col("merge") & (F.col("run_id") == 1), F.col("p_from")
        ).otherwise(F.col("valid_from")).alias("valid_from"),
        "valid_to",
        "is_current",
        (
            F.col("n_events")
            + F.when(
                F.col("merge") & (F.col("run_id") == 1), F.col("p_n0")
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("n_events"),
    )
    return (
        prior_closed.select(*out_cols)
        .unionByName(kept_open.select(*out_cols))
        .unionByName(rebased.select(*out_cols))
    )
