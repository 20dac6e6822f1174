"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force top-k for a bounded query set. The query
  side is broadcast; the corpus is scanned once — at 100 TB this is one
  pass, embarrassingly parallel, no shuffle until the final per-query
  top-k (window over query_id).
- ``cosine_pairs``: all-pairs above a threshold — the *correctness
  baseline*; O(n²), only for validation scales.
- ``lsh_bucketed_pairs``: the scale path — deterministic random-hyperplane
  LSH (hyperplanes derived from xxhash64, no RNG state), candidates from
  shared sign-buckets, exact cosine verification on candidates.

All cosines are computed in double via zip_with/aggregate folds —
bit-identical to DuckDB's list_dot_product (see functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from censo_escolar_spark.functions.vectors import as_double_array, cosine, dot


def _prep(df: DataFrame, id_col: str, vec_col: str, alias: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{alias}_id"),
        as_double_array(vec_col).alias(f"{alias}_v"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k nearest (cosine) corpus vectors per query vector.

    Broadcast the (small) query set against the corpus scan; rank with a
    window partitioned by query — the only shuffle is on query_id, whose
    cardinality equals the query count.
    """
    q = _prep(queries, id_col, vec_col, "q")
    c = _prep(corpus, id_col, vec_col, "c")
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("cos", cosine(F.col("q_v"), F.col("c_v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cos",
            "rank",
        )
    )


def cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs with cosine >= threshold (brute force — validation only)."""
    a = _prep(df, id_col, vec_col, "a")
    b = _prep(df, id_col, vec_col, "b")
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine(F.col("a_v"), F.col("b_v")))
        .filter(F.col("cos") >= threshold)
        .select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"), "cos")
    )


def _hyperplanes(dim: int, n_planes: int) -> F.Column:
    """Deterministic pseudo-random hyperplanes as array<array<double>>.

    Component (p, d) = (xxhash64(p*dim + d) % 10007) / 10007 - 0.5 — fixed
    given (dim, n_planes); no RNG, so plans are reproducible across runs
    and executors.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.xxhash64(p * F.lit(dim) + d), F.lit(10007)).cast("double")
                / F.lit(10007.0)
                - F.lit(0.5)
            ),
        ),
    )


def lsh_bucketed_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.9,
) -> DataFrame:
    """Random-hyperplane LSH near-dup pairs with exact cosine verification.

    Signature bit p = sign(v · hyperplane_p); bits grouped into bands;
    candidates share a (band_idx, band_value); exact cosine filters them.
    Approximate recall (P(bit match) = 1 − θ/π), intended for high
    thresholds (near-dup range ≥0.9) where recall is excellent. Shuffle
    is O(rows × bands).
    """
    assert n_planes % n_bands == 0
    rows = n_planes // n_bands
    planes = _hyperplanes(dim, n_planes)
    v = as_double_array(vec_col)
    bits = F.transform(planes, lambda pl: (dot(pl, v) > 0).cast("int"))
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda j: F.xxhash64(j, F.slice(bits, j * rows + 1, rows)),
    )
    prepped = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.posexplode(bands).alias("band_idx", "band_val"),
    )
    a = prepped.alias("a")
    b = prepped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .distinct()
        .filter(F.col("cos") >= threshold)
    )
