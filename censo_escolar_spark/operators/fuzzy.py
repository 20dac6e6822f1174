"""Edit-distance-bounded fuzzy matching (entity resolution).

Two-level design, the standard record-linkage shape:

1. **Value level** — fuzzy candidates are generated over DISTINCT
   (block keys, string) values, not records: the candidate join is an
   equi-join on (block keys, length band) — edit distance <= k forces
   |len(a) − len(b)| <= k, so replicating each value over its 2k+1
   bands meets every true value pair exactly once (lossless, no
   ``distinct``). ``levenshtein`` (same definition in Spark and
   DuckDB) evaluates on candidate VALUE pairs only.
2. **Record level** — matched value pairs expand back to record pairs
   through two hash joins on (block keys, string). Identical-string
   record groups therefore cost one join fan-out, never a quadratic
   candidate join.

Scale shape: candidate work is O(|distinct values|²/bands) + the
band-join shuffle of 2k+1 small replicas; the record expansion is
output-proportional. On near-unique strings this degrades gracefully
to record-level banding; on heavy-duplicate columns (the common
entity-resolution case: names, addresses) it is orders of magnitude
smaller than record-level candidates. Add more equality block keys
(zip, phone prefix) to shrink buckets further — the length band keeps
any blocking lossless for the distance bound.
"""

from __future__ import annotations

from functools import reduce

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
    """All (id_a < id_b) record pairs with levenshtein(str_a, str_b)
    <= ``max_distance``, sharing every ``block_cols`` value. NULL
    strings match nothing. Output: id_a, id_b, *block_cols, str_a,
    str_b, distance — str_a belongs to the smaller id."""
    blocks = list(block_cols or [])
    k = int(max_distance)
    base = df.filter(F.col(str_col).isNotNull()).select(
        F.col(id_col), F.col(str_col), *[F.col(c) for c in blocks]
    )

    vals = base.select(F.col(str_col), *[F.col(c) for c in blocks]).distinct()
    va = vals.select(
        F.col(str_col).alias("__va"),
        *[F.col(c).alias(f"__ba_{c}") for c in blocks],
        F.explode(
            F.sequence(F.length(str_col) - k, F.length(str_col) + k)
        ).alias("__band"),
    )
    vb = vals.select(
        F.col(str_col).alias("__vb"),
        *[F.col(c).alias(f"__bb_{c}") for c in blocks],
        F.length(str_col).alias("__band"),
    )
    # string-ordered: each unordered value pair once; __va == __vb kept
    # (identical strings pair at distance 0 through the expansion)
    cond = [va["__band"] == vb["__band"], va["__va"] <= vb["__vb"]]
    cond += [va[f"__ba_{c}"] == vb[f"__bb_{c}"] for c in blocks]
    dist = F.levenshtein("__va", "__vb")
    vpairs = (
        va.join(vb, reduce(lambda x, y: x & y, cond))
        .filter(dist <= k)
        .select(
            "__va", "__vb", *[F.col(f"__ba_{c}") for c in blocks],
            dist.cast("int").alias("distance"),
        )
    )

    ra = base.select(
        F.col(id_col).alias("__ida"),
        F.col(str_col).alias("__va"),
        *[F.col(c).alias(f"__ba_{c}") for c in blocks],
    )
    rb = base.select(
        F.col(id_col).alias("__idb"),
        F.col(str_col).alias("__vb"),
        *[F.col(c).alias(f"__bb_{c}") for c in blocks],
    )
    on_a = [vpairs["__va"] == ra["__va"]] + [
        vpairs[f"__ba_{c}"] == ra[f"__ba_{c}"] for c in blocks
    ]
    expanded = vpairs.alias("vp").join(
        ra.alias("ra"), reduce(lambda x, y: x & y, on_a)
    )
    on_b = [F.col("vp.__vb") == rb["__vb"]] + [
        F.col(f"vp.__ba_{c}") == rb[f"__bb_{c}"] for c in blocks
    ]
    expanded = expanded.join(rb.alias("rb"), reduce(lambda x, y: x & y, on_b))

    # each unordered record pair appears exactly once (va < vb by string
    # order, or va == vb with the id filter) — swap-normalize so id_a is
    # always the smaller id, carrying its own string
    same_val = F.col("vp.__va") == F.col("vp.__vb")
    keep = F.when(same_val, F.col("__ida") < F.col("__idb")).otherwise(F.lit(True))
    a_first = F.col("__ida") < F.col("__idb")
    return (
        expanded.filter(keep)
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            *[F.col(f"vp.__ba_{c}").alias(c) for c in blocks],
            F.when(a_first, F.col("vp.__va")).otherwise(F.col("vp.__vb")).alias("str_a"),
            F.when(a_first, F.col("vp.__vb")).otherwise(F.col("vp.__va")).alias("str_b"),
            "distance",
        )
    )
