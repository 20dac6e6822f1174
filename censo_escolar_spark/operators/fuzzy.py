"""Edit-distance-bounded fuzzy matching (entity resolution).

The candidate join is LOSSLESS by construction: edit distance <= k
forces |len(a) − len(b)| <= k, so replicating each row over its
2k+1 length bands and equi-joining on (block keys, band, = exact
length of the other side) meets every true pair exactly once — no
``distinct`` needed, no recall loss. The distance itself is Spark's
JVM ``levenshtein`` (same definition as DuckDB/Postgres), evaluated
only on candidates.

Scale shape: the shuffle is an equi-join on (block keys, length band)
— 2k+1 replicas of one side, never an all-pairs product. Real entity
resolution adds more equality block keys (brand, zip, phone prefix) to
shrink buckets; the length band keeps whatever blocking you choose
lossless for the distance bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    block_cols: list[str] | None = None,
    max_distance: int = 1,
) -> DataFrame:
    """All (id_a < id_b) pairs with levenshtein(str_a, str_b) <= k,
    sharing every ``block_cols`` value. NULL strings match nothing."""
    blocks = list(block_cols or [])
    k = int(max_distance)
    base = df.filter(F.col(str_col).isNotNull()).select(
        F.col(id_col), F.col(str_col), *[F.col(c) for c in blocks]
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(str_col).alias("str_a"),
        *[F.col(c).alias(f"__ba_{c}") for c in blocks],
        F.explode(
            F.sequence(F.length(str_col) - k, F.length(str_col) + k)
        ).alias("__band"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(str_col).alias("str_b"),
        *[F.col(c).alias(f"__bb_{c}") for c in blocks],
        F.length(str_col).alias("__band"),
    )
    from functools import reduce

    cond = [a["__band"] == b["__band"], a["id_a"] < b["id_b"]]
    for c in blocks:
        cond.append(a[f"__ba_{c}"] == b[f"__bb_{c}"])
    joined = a.join(b, reduce(lambda x, y: x & y, cond))
    dist = F.levenshtein("str_a", "str_b")
    out_blocks = [F.col(f"__ba_{c}").alias(c) for c in blocks]
    return (
        joined.filter(dist <= k)
        .select(
            "id_a",
            "id_b",
            *out_blocks,
            "str_a",
            "str_b",
            dist.cast("int").alias("distance"),
        )
    )
