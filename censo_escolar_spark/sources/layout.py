"""Z-order (Morton) clustered layout for multi-column data skipping.

Hive partitioning prunes on ONE coarse column (S8/X3,
reference transform.py:173). When queries filter on several high-
cardinality columns (e.g. part AND supplier), the complementary lever
is row ORDERING inside files: sort by the bit-interleaved z-value of
the filter columns and every parquet row group's min/max stats become
tight in ALL of those columns at once — a scan with a predicate on any
of them skips most row groups. This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, built here from plain Spark primitives:
a codegen bit-interleave expression + repartitionByRange +
sortWithinPartitions.

The z-value is pure integer bit arithmetic (shifts, masks, OR) — fully
JVM-side, whole-stage-codegen'd, and exactly reproducible in ANSI SQL
(oracle q43 computes the identical interleave arithmetically).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[str | Column], *, bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column.

    Column j contributes its bit i to result bit ``i * k + j`` (k =
    number of columns), so equal prefixes of the z-value bound every
    input column — the property row-group min/max pruning relies on.
    Inputs are masked to ``bits`` (callers bucket/offset real values
    into [0, 2^bits) first); ``bits * k`` must fit a signed 64-bit int.
    """
    k = len(cols)
    if bits * k > 62:
        raise ValueError(f"bits*cols = {bits * k} exceeds a signed 64-bit z-value")
    terms = []
    for j, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("long")
        x = x.bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    *,
    bits: int = 16,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the z-order of ``zorder_cols``.

    repartitionByRange on the z-value gives each output file a disjoint
    z-range (global clustering, one range-exchange); sortWithinPartitions
    orders rows inside each file so row-group stats are tight too. The
    helper column is dropped before writing.
    """
    z = zorder_value(list(zorder_cols), bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
