"""Edit-distance-bounded fuzzy matching (entity resolution).

Two-level design, the standard record-linkage shape:

1. **Value level** — fuzzy candidates are generated over DISTINCT
   (block keys, string) values, not records, via PassJoin segment
   filtering (Li/Deng/Wang/Feng, VLDB 2011): split the longer string of
   a would-be pair into ``k+1`` contiguous segments — at most ``k``
   edits can touch at most ``k`` segments, so one segment survives
   UNEDITED and must appear verbatim in the shorter string at a
   position shifted by at most ``k`` (net insertions/deletions before
   it). Candidates are therefore an EQUI-join on
   (block keys, segment index, probe length, substring): each value
   emits its ``k+1`` segments as probe keys and its
   O(k² · (2k+1)) windowed substrings as index keys. ``levenshtein``
   (same definition in Spark and DuckDB) verifies candidate VALUE
   pairs only.

   This replaces the earlier (block keys, length band) equi-join,
   whose candidate volume is Σ per-block C(values, 2) — quadratic in
   block size when block keys have FIXED cardinality (brands,
   zip codes) while the catalog grows; measured 32× wall at the 10×
   scale probe (q49). Segment-sharing candidates scale with true-match
   density instead: random distinct strings almost never share an
   exact ~L/(k+1)-char segment at a compatible position.

2. **Record level** — matched value pairs expand back to record pairs
   through hash joins on (block keys, string). Identical-string record
   groups therefore cost one output-proportional join fan-out, never a
   quadratic candidate join.

Scale shape: candidate work is O(matching segment pairs) + a shuffle
of ~(k+1)²(2k+1) small index rows per distinct value; the record
expansion is output-proportional. Add more equality block keys (zip,
phone prefix) to shrink the segment-join buckets further — segment
filtering keeps any blocking lossless for the distance bound.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_bounds(total: Column, i: int, k: int) -> tuple[Column, Column]:
    """(start, length) of segment ``i`` when a ``total``-char string is
    split into ``k+1`` near-even parts (first ``total mod (k+1)``
    segments get the extra char) — 0-based start, closed-form."""
    base = (total / (k + 1)).cast("int")
    rem = total % (k + 1)
    length = base + F.when(F.lit(i) < rem, 1).otherwise(0)
    start = F.lit(i) * base + F.least(F.lit(i), rem)
    return start, length


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
    ln = F.length(str_col)

    # --- value-level candidates -------------------------------------
    # Orientation: the PROBE of a pair is its (length, value)-GREATER
    # side, so every pair is generated exactly once and the probe is
    # always long enough (>= k+1 chars) to have k+1 non-empty segments.
    # Pairs where BOTH sides are <= k chars go through the bounded
    # short path below; equal VALUES are not candidates (distance-0
    # record pairs come from the same-value expansion).
    probe = vals.filter(ln >= k + 1).select(
        F.col(str_col).alias("__va"),
        *[F.col(c).alias(f"__ba_{c}") for c in blocks],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(
                            f"substring({str_col}, "
                            f"{_sql_start(str_col, i, k)} + 1, "
                            f"{_sql_len(str_col, i, k)})"
                        ).alias("seg"),
                    )
                    for i in range(k + 1)
                ]
            )
        ).alias("__s"),
    ).select(
        "__va",
        *[F.col(f"__ba_{c}") for c in blocks],
        F.col("__s.i").alias("__i"),
        F.col("__s.seg").alias("__seg"),
        F.length("__va").alias("__la"),
    )

    # Index side: for each admissible probe length La (>= own length,
    # within +k, >= k+1) emit every substring that could be probe
    # segment i shifted by at most k.
    def _windowed(i: int, la: Column, st: Column, sl: Column) -> Column:
        lo = F.greatest(st - k, F.lit(0))
        hi = F.least(st + k, ln - sl)

        def mk(p: Column) -> Column:
            return F.struct(
                F.lit(i).alias("i"),
                F.substring(F.col(str_col), p + 1, sl).alias("sub"),
                la.cast("int").alias("la"),
            )

        return F.when(
            (la >= k + 1) & (sl >= 1) & (hi >= lo),
            F.transform(F.sequence(lo, hi), mk),
        ).otherwise(F.array().cast("array<struct<i:int,sub:string,la:int>>"))

    idx_parts = []
    for d in range(k + 1):  # La = len(v) + d
        la = ln + d
        for i in range(k + 1):
            st, sl = _seg_bounds(la, i, k)
            idx_parts.append(_windowed(i, la, st, sl))
    index = vals.select(
        F.col(str_col).alias("__vb"),
        *[F.col(c).alias(f"__bb_{c}") for c in blocks],
        F.explode(F.flatten(F.array(*idx_parts))).alias("__x"),
    ).select(
        "__vb",
        *[F.col(f"__bb_{c}") for c in blocks],
        F.col("__x.i").alias("__i"),
        F.col("__x.sub").alias("__seg"),
        F.col("__x.la").alias("__la"),
    )

    cond = [
        probe["__i"] == index["__i"],
        probe["__la"] == index["__la"],
        probe["__seg"] == index["__seg"],
        F.struct(probe["__la"], probe["__va"])
        > F.struct(F.length(index["__vb"]), index["__vb"]),
    ]
    cond += [probe[f"__ba_{c}"] == index[f"__bb_{c}"] for c in blocks]
    dist = F.levenshtein("__va", "__vb")
    cand = (
        probe.join(index, reduce(lambda x, y: x & y, cond))
        .select("__va", "__vb", *[probe[f"__ba_{c}"] for c in blocks])
        .distinct()
    )

    # Short path: both sides <= k chars (the segment split needs k+1
    # chars on the probe). The value set here is inherently bounded —
    # strings of <= k chars — so the block-scoped pair join is tiny.
    shorts = vals.filter(ln <= k)
    if k >= 1:
        sa = shorts.select(
            F.col(str_col).alias("__va"),
            *[F.col(c).alias(f"__ba_{c}") for c in blocks],
        )
        sb = shorts.select(
            F.col(str_col).alias("__vb"),
            *[F.col(c).alias(f"__bb_{c}") for c in blocks],
        )
        scond = [sa["__va"] > sb["__vb"]]
        scond += [sa[f"__ba_{c}"] == sb[f"__bb_{c}"] for c in blocks]
        cand = cand.unionByName(
            sa.join(sb, reduce(lambda x, y: x & y, scond)).select(
                "__va", "__vb", *[sa[f"__ba_{c}"] for c in blocks]
            )
        )

    vpairs = cand.filter(dist <= k).select(
        "__va",
        "__vb",
        *[F.col(f"__ba_{c}") for c in blocks],
        dist.cast("int").alias("distance"),
    )

    # --- record-level expansion (output-proportional) ----------------
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
    a_first = F.col("__ida") < F.col("__idb")
    cross = expanded.select(
        F.least("__ida", "__idb").alias("id_a"),
        F.greatest("__ida", "__idb").alias("id_b"),
        *[F.col(f"vp.__ba_{c}").alias(c) for c in blocks],
        F.when(a_first, F.col("vp.__va")).otherwise(F.col("vp.__vb")).alias("str_a"),
        F.when(a_first, F.col("vp.__vb")).otherwise(F.col("vp.__va")).alias("str_b"),
        "distance",
    )

    # same-value record pairs: distance 0 through one self-join fan-out
    on_s = [ra["__va"] == rb["__vb"]] + [
        ra[f"__ba_{c}"] == rb[f"__bb_{c}"] for c in blocks
    ]
    same = (
        ra.join(rb, reduce(lambda x, y: x & y, on_s))
        .filter(F.col("__ida") < F.col("__idb"))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            *[ra[f"__ba_{c}"].alias(c) for c in blocks],
            ra["__va"].alias("str_a"),
            rb["__vb"].alias("str_b"),
            F.lit(0).cast("int").alias("distance"),
        )
    )
    return cross.unionByName(same)


def _sql_start(col: str, i: int, k: int) -> str:
    """SQL text for segment i's 0-based start over length(col)."""
    return (
        f"({i} * CAST(length({col}) / {k + 1} AS INT)"
        f" + LEAST({i}, length({col}) % {k + 1}))"
    )


def _sql_len(col: str, i: int, k: int) -> str:
    """SQL text for segment i's length over length(col)."""
    return (
        f"(CAST(length({col}) / {k + 1} AS INT)"
        f" + IF({i} < length({col}) % {k + 1}, 1, 0))"
    )
