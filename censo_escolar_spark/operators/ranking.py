"""Scale-safe global ranking: row_number / ntile over a TOTAL order
without the single-partition window Spark would otherwise plan.

``Window.orderBy(...)`` with no ``partitionBy`` makes Spark move *every*
row through one task ("No Partition Defined for Window operation!").
Correct at test scale, fatal at 100 TB. The classic distributed fix is
two-phase ranking:

1. ``repartitionByRange`` on the sort key — rows land in range
   partitions that are globally ordered across partitions;
2. ``row_number`` inside each partition (parallel, partitioned window);
3. per-partition row counts (one tiny aggregate: at most
   ``num_partitions`` rows) are collected to the driver, turned into
   cumulative offsets, and folded back in as a literal array lookup —
   ``global_rn = offset[pid] + local_rn``.

Shuffle cost: one range exchange of the data + a ``num_partitions``-row
aggregate. No broadcast join, no second pass over the data (the ranged
frame is eagerly localCheckpoint'd so the counts branch doesn't recompute
lineage — see the LSH banding lesson in operators/dedup.py).

``global_ntile`` layers exact ntile(k) semantics on top: with total row
count n known, bucket sizes are fixed (first ``n % k`` buckets get
``n // k + 1`` rows), so the bucket id is a closed-form integer
expression of the global row number — identical to ``ntile(k) OVER
(ORDER BY ...)`` whenever the order is a total order.

The order MUST be a total order (include a unique tiebreaker column);
otherwise rows that compare equal may straddle range partitions and the
assignment, while still a valid ntile numbering, is not deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranged_with_local_rn(
    df: DataFrame, order: Sequence[Column], num_partitions: int | None
):
    """Range-partition ``df`` on ``order`` and attach (__pid, __rn_local)."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    ranged = df.repartitionByRange(num_partitions, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Freeze partition ids + contents: the counts branch below re-reads
    # this frame, and without an eager checkpoint Spark would recompute
    # the range exchange (and could in principle re-sample boundaries).
    ranged = ranged.localCheckpoint(eager=True)
    w_local = Window.partitionBy("__pid").orderBy(*order)
    return ranged.withColumn("__rn_local", F.row_number().over(w_local))


def _global_row_number_with_total(
    df: DataFrame,
    order: Sequence[Column],
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Two-phase global row_number plus the total row count (already on
    the driver from the per-partition counts — callers needing n must
    not pay a second count() job)."""
    local = _ranged_with_local_rn(df, order, num_partitions)
    counts = {
        r["__pid"]: r["cnt"]
        for r in local.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    max_pid = max(counts, default=-1)
    offsets, running = [], 0
    for pid in range(max_pid + 1):
        offsets.append(running)
        running += counts.get(pid, 0)
    if not offsets:
        offsets = [0]
    # Literal array lookup (num_partitions entries — bounded by config,
    # not by data volume), evaluated JVM-side inside codegen.
    off = F.element_at(F.array(*[F.lit(o) for o in offsets]), F.col("__pid") + 1)
    ranked = local.withColumn(
        out_col, (off + F.col("__rn_local")).cast("long")
    ).drop("__pid", "__rn_local")
    return ranked, running


def global_row_number(
    df: DataFrame,
    order: Sequence[Column],
    *,
    out_col: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number() OVER (ORDER BY order) without a
    single-partition window. ``order`` must be a total order."""
    ranked, _ = _global_row_number_with_total(df, order, out_col, num_partitions)
    return ranked


def global_ntile(
    df: DataFrame,
    order: Sequence[Column],
    n_buckets: int,
    *,
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ntile(n_buckets) OVER (ORDER BY order) — same bucket ids as
    the SQL window function for a total order — via two-phase ranking.

    ntile semantics: n rows split into k buckets whose sizes differ by at
    most one; the first ``r = n % k`` buckets hold ``q+1 = n//k + 1``
    rows. Given the global row number rn, the bucket id is

        rn <= r*(q+1)  ->  ceil(rn / (q+1))
        otherwise      ->  r + ceil((rn - r*(q+1)) / q)

    computed with integer arithmetic below.
    """
    rn_col = "__grn"
    ranked, n = _global_row_number_with_total(
        df, order, rn_col, num_partitions
    )
    q, r = divmod(n, n_buckets)
    rn = F.col(rn_col)
    if q == 0:
        # Fewer rows than buckets: row i goes to bucket i.
        bucket = rn
    else:
        head = r * (q + 1)
        in_head = F.floor((rn + q) / (q + 1))  # ceil(rn / (q+1))
        in_tail = r + F.floor((rn - head + q - 1) / q)  # r + ceil((rn-head)/q)
        bucket = F.when(rn <= F.lit(head), in_head).otherwise(in_tail)
    return ranked.withColumn(out_col, bucket.cast("int")).drop(rn_col)


def grouped_row_number(
    df: DataFrame,
    group_col: str,
    order: Sequence[Column],
    *,
    out_col: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact row_number() OVER (PARTITION BY group_col ORDER BY order)
    that never funnels a whole group through one task.

    A plain partitioned window is fine when groups are plentiful, but a
    LOW-CARDINALITY group column (language, source, split — the strata
    of a sampling job) makes each group a single-task hotspot: the
    biggest stratum of a 100 TB corpus is a 60 TB partition. Two-phase
    fix, same recipe as ``global_row_number``: range-partition on
    (group, order) — each group spans a RUN of range partitions — rank
    within (partition, group), then fold per-(partition, group) counts
    (≤ num_partitions × n_groups tiny rows on the driver) back in as
    cumulative offsets via a broadcast join on the (pid, group) pair.

    ``order`` must be a total order within each group.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    g = F.col(group_col)
    ranged = df.repartitionByRange(num_partitions, g, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=True)
    w_local = Window.partitionBy("__pid", group_col).orderBy(*order)
    local = ranged.withColumn("__rn_local", F.row_number().over(w_local))
    counts = (
        local.groupBy("__pid", group_col)
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    # cumulative offset of (pid, group) = rows of the same group in
    # EARLIER partitions (range partitioning puts a group's runs in
    # consecutive, globally ordered pids)
    by_group: dict[object, list[tuple[int, int]]] = {}
    for row in counts:
        by_group.setdefault(row[group_col], []).append((row["__pid"], row["cnt"]))
    offset_rows = []
    for grp, pid_counts in by_group.items():
        running = 0
        for pid, cnt in sorted(pid_counts):
            offset_rows.append((pid, grp, running))
            running += cnt
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    off_schema = StructType(
        [
            StructField("__pid", IntegerType()),
            df.schema[group_col],
            StructField("__off", LongType()),
        ]
    )
    offsets = df.sparkSession.createDataFrame(offset_rows, schema=off_schema)
    return (
        local.join(F.broadcast(offsets), ["__pid", group_col])
        .withColumn(out_col, (F.col("__off") + F.col("__rn_local")).cast("long"))
        .drop("__pid", "__rn_local", "__off")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    order: Sequence[Column],
    quota: int,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact-quota stratified sample: the first ``quota`` rows of each
    stratum under a deterministic content order (hash order = unbiased,
    run-stable, engine-stable — the sampling contract of
    functions/text.deterministic_sample, upgraded from percentage to
    exact counts). Built on ``grouped_row_number``, so no stratum ever
    serializes through one task."""
    ranked = grouped_row_number(
        df, strata_col, order, out_col="__srn", num_partitions=num_partitions
    )
    return ranked.filter(F.col("__srn") <= quota).drop("__srn")
