"""Dictionary decode: code→label lookup (reference parity P2/P3/J2).

The reference applies 72 code→label dicts as per-column Python UDFs
(transform.py:33-38, :68-77) — a JVM↔Python pickle round-trip per column.
Here the same semantics (unmapped or non-string code → NULL, dict.get
behavior) run natively, two ways:

- ``map_expr``: an inline ``F.create_map`` literal — O(1) per row inside
  codegen; right for the small/medium dicts (≤ ~10k entries).
- ``broadcast dimension join`` (see etl/pipeline.py): for very large or
  shared dicts; null-on-miss comes from the LEFT join.

Both choices decode without a shuffle of the fact table.
"""

from __future__ import annotations

from itertools import chain
from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def map_expr(mapping: Mapping[str, str], col: str | Column) -> Column:
    """Inline map lookup: ``mapping.get(code)`` semantics (miss → NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    if not mapping:
        return F.lit(None).cast("string")
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    return m[c]


def map_as_dimension(
    spark: SparkSession, mapping: Mapping[str, str], key_col: str = "code", val_col: str = "label"
) -> DataFrame:
    """Materialize a dict as a 2-column dimension DataFrame for broadcast
    left joins (the scale path for big dicts)."""
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"{key_col} string, {val_col} string"
    )


def decode_with_broadcast_join(
    df: DataFrame,
    mapping_df: DataFrame,
    code_col: str,
    *,
    key_col: str = "code",
    val_col: str = "label",
) -> DataFrame:
    """Replace ``code_col`` with its decoded label via broadcast LEFT join
    (miss → NULL, preserving the reference's dict.get semantics)."""
    dim = mapping_df.select(
        F.col(key_col).alias("__k"), F.col(val_col).alias("__v")
    )
    return (
        df.join(F.broadcast(dim), df[code_col] == F.col("__k"), "left")
        .withColumn(code_col, F.col("__v"))
        .drop("__k", "__v")
    )
