"""MERGE INTO (upsert/delete) semantics as a single full-outer join.

The lakehouse write primitive: apply a CDC batch with per-row ops
(``U``pdate/``I``nsert/``D``elete) to a base table keyed by a unique
key. Semantics follow ANSI/Delta MERGE with one WHEN MATCHED UPDATE,
one WHEN MATCHED AND op='D' DELETE, and one WHEN NOT MATCHED INSERT:

  - base key not in CDC            -> base row unchanged
  - CDC 'U'/'I' (matched or not)   -> CDC payload wins (upsert)
  - CDC 'D' matched                -> row dropped
  - CDC 'D' unmatched              -> no-op

Plan shape: ONE full-outer hash join on the key — not the naive
anti-join + union + except chain (3 shuffles of the big side). At
scale the base side shuffles once on the key; with a bucketed base
table (sources/bucketing.py) even that exchange disappears, which is
exactly how Delta/Iceberg-style engines make MERGE cheap. AQE handles
a skewed CDC key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    cdc: DataFrame,
    key_col: str,
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch to ``base``; returns the merged table.

    ``cdc`` must carry ``key_col``, ``op_col`` ('U' | 'I' | 'D'), and
    the same payload columns as ``base``. The key must be unique on
    both sides (a CDC batch is the LAST image per key by contract).
    """
    payload = [c for c in base.columns if c != key_col]
    b = base.select(
        key_col, *[F.col(c).alias(f"__b_{c}") for c in payload]
    )
    c_ = cdc.select(
        key_col,
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in payload],
    )
    joined = b.join(c_, key_col, "full_outer")
    # base-only rows pass through; 'U'/'I' upsert the CDC payload;
    # 'D' drops (matched) or is a silent no-op (unmatched: no base row
    # exists, and the filter emits nothing for it either)
    keep = F.col("__op").isNull() | F.col("__op").isin("U", "I")
    return joined.filter(keep).select(
        key_col,
        *[
            F.when(F.col("__op").isin("U", "I"), F.col(f"__c_{c}"))
            .otherwise(F.col(f"__b_{c}"))
            .alias(c)
            for c in payload
        ],
    )
