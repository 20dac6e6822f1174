"""Table diff / reconciliation — what changed between two versions.

The regression tool every pipeline migration needs: given version A
and version B of a keyed table, classify every key as added / removed /
changed / unchanged and say WHICH columns changed. One full-outer hash
join on the key plus a codegen comparison projection — no collects, no
per-column subqueries; at scale both sides shuffle once on the key
(or zero times if the tables are bucketed by it).

Null-safe equality (`<=>`) throughout: a NULL→value transition is a
real change, NULL→NULL is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_tables(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key change classification between table versions A and B.

    Output: *keys, change_type ('added' = only in B, 'removed' = only
    in A, 'changed', 'unchanged'), changed_cols (sorted array, empty
    unless 'changed')."""
    cols = compare_cols or [c for c in a.columns if c not in keys and c in b.columns]
    al = a.select(*keys, *[F.col(c).alias(f"__a_{c}") for c in cols], F.lit(1).alias("__in_a"))
    bl = b.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in cols], F.lit(1).alias("__in_b"))
    j = al.join(bl, keys, "full_outer")
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}")), F.lit(c)
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        change.alias("change_type"),
        F.when(change == "changed", changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
