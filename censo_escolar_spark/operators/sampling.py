"""Deterministic weighted sampling (priority sampling).

Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
estimation of arbitrary subset sums", JACM 2007): each row draws a
uniform u ∈ (0,1] and gets priority w/u; the weighted sample of size k
is the top-k priorities. Heavier rows are proportionally more likely to
be drawn, and the scheme supports unbiased subset-sum estimation with
the (k+1)-th priority as threshold.

This implementation replaces the RNG with a reproducible hash uniform:
u is derived from the first 13 hex chars of md5(salt || id) — 52 bits,
exactly representable in a double, so Spark and any other engine
(DuckDB: ``CAST('0x'||substr(md5(..),1,13) AS BIGINT)``) derive the
bit-identical priority. No rand() → re-runs, retries, and oracle
comparisons all agree; partitioning cannot change the result.

Scale shape: one corpus scan computing the priority (codegen
expressions only) + one top-k window per stratum — identical to the
deterministic percent-sampling path (functions.text.deterministic_sample).
The float priority is selection-only; callers should not emit it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO_52 = 4503599627370496.0  # 2**52


def hash_uniform(id_col: Column, salt: str) -> Column:
    """Reproducible uniform in (0, 1] from md5(salt || id), 52-bit exact."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("bigint")
    return (h + 1) / F.lit(_TWO_52)


def priority_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws1:",
) -> DataFrame:
    """Top-k weighted sample per stratum; adds a 1-based ``rank`` column.

    Weights must be positive; rows with NULL or non-positive weight are
    excluded (they can never be drawn under w/u priority).
    """
    pri = F.col(weight_col).cast("double") / hash_uniform(F.col(id_col), salt)
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc(pri), F.asc(id_col)
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
