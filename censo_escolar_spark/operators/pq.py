"""Product quantization (PQ) for embedding search at compression scale.

PQ splits each (L2-normalized) vector into ``m`` contiguous subvectors
and replaces each with the id of its nearest per-subspace centroid — an
``m``-byte code instead of ``dim`` floats (64-dim float32 → 4 bytes at
m=4: 64× smaller). Search runs over CODES via asymmetric distance
computation (ADC): a query precomputes one ``m × k`` table of
subvector dot products, then every corpus vector's approximate cosine
is ``m`` table lookups — no float vectors are read until the final
exact re-rank of the small candidate pool.

Why this shape at 100 TB:
- the codebooks are ``m·k·(dim/m)`` doubles — a driver-side constant
  broadcast like any dimension table (same contract as
  ``similarity.train_centroids``);
- encoding is one corpus pass, GEMM per Arrow batch, no shuffle;
- the codes table is the only thing the ADC scan reads — a 64×
  smaller scan than brute force, embarrassingly parallel;
- only the per-query top-``rerank`` candidates rejoin the full
  vectors (an equi-join on vector id) for exact scoring, so the
  expensive exact cosine runs on a bounded set.

Determinism: codebooks are seeded from the ``k`` smallest vector ids
(no RNG), refined with Lloyd iterations whose mean-updates reduce
per (subspace, centroid, dim) — the exact recipe proven out by
``similarity.train_centroids``. With ``rerank`` >= corpus size the
result is the brute-force answer (the oracle-checked configuration);
recall at realistic ``rerank`` is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from censo_escolar_spark.functions.vectors import as_double_array, cosine, norm2


def _normalized(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def train_pq_codebooks(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    iters: int = 2,
) -> np.ndarray:
    """Train ``m`` per-subspace codebooks of ``k`` centroids each.

    Returns an ``(m, k, dim/m)`` array. Seeds are the subvectors of the
    ``k`` smallest ids (deterministic, like ``train_centroids``); Lloyd
    refinement assigns distributed (GEMM per Arrow batch via
    ``pq_encode``) and mean-updates via a groupBy over
    ``m·k·(dim/m)`` keys — constant-sized regardless of corpus size.
    """
    df = df.filter(F.col(vec_col).isNotNull())
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(as_double_array(vec_col).alias("v"))
        .collect()
    )
    if not seeds:
        return np.zeros((0, 0, 0))
    mat = _normalized(np.vstack([r.v for r in seeds]))
    dim = mat.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    books = np.stack([mat[:, j * dsub : (j + 1) * dsub] for j in range(m)])
    for _ in range(iters):
        # eager checkpoint: the mean-update below is a multi-stage
        # aggregation over `coded`; without materialization the Arrow
        # encode UDF re-runs inside it (double GEMM per Lloyd round)
        coded = pq_encode(df, books, id_col=id_col, vec_col=vec_col).select(
            vec_col, "pq_code"
        ).localCheckpoint(eager=True)
        # mean-update over NORMALIZED vectors (codes quantize direction;
        # training on raw magnitudes would drift the codebooks). The
        # norm is materialized as a column BEFORE the explodes: folding
        # it into a per-element transform would re-run the O(dim)
        # norm fold dim × m times per row (measured 12s -> 0.5s on the
        # sf0.1 fixture).
        v = as_double_array(vec_col)
        nrm = F.when(norm2(F.col("__v")) == 0, F.lit(1.0)).otherwise(
            norm2(F.col("__v"))
        )
        # ONE posexplode of the full vector; subspace id and code are
        # cheap per-element expressions (d div dsub / element_at) — an
        # explode-per-subspace + Column-start slice chain measured ~2×
        # slower (per-row interpreted array slicing)
        j_of_d = F.expr(f"d div {dsub}")
        sums = (
            coded.select("pq_code", v.alias("__v"))
            .select("pq_code", "__v", nrm.alias("__n"))
            .select("pq_code", "__n", F.posexplode("__v").alias("d", "x"))
            .select(
                j_of_d.cast("int").alias("j"),
                F.element_at("pq_code", (j_of_d + 1).cast("int")).alias("code"),
                F.expr(f"d % {dsub}").alias("d"),
                (F.col("x") / F.col("__n")).alias("x"),
            )
            .groupBy("j", "code", "d")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = books.copy()  # empty cells keep their previous position
        for r in sums:
            new[r["j"], r["code"], r["d"]] = r["s"] / r["n"]
        books = new
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the ``m``-subspace code array to each row.

    One GEMM per (Arrow batch × subspace) against the broadcast
    codebooks; rows keep their original columns (the codes ride along,
    the caller decides whether to drop the float vectors). Vectors are
    L2-normalized before encoding so codes quantize direction (cosine),
    not magnitude. Assignment breaks distance ties toward the lower
    code id (np.argmax on the dot products is first-match — stable and
    engine-independent).
    """
    m, _, dsub = codebooks.shape
    books = codebooks  # captured read-only; Spark broadcasts the closure

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        mat = _normalized(np.vstack(vecs.to_numpy()).astype(np.float64))
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            # nearest centroid by squared L2 == argmax(dot - ||c||²/2)
            dots = sub @ books[j].T
            dists = dots - 0.5 * np.einsum("kd,kd->k", books[j], books[j])
            codes[:, j] = np.argmax(dists, axis=1)
        return pd.Series(list(codes))

    df = df.filter(F.col(vec_col).isNotNull())
    return df.withColumn(out_col, encode(as_double_array(vec_col)))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 50,
) -> DataFrame:
    """ADC top-k: scan codes, rank by table-lookup score, exact-cosine
    re-rank of the per-query top-``rerank`` pool.

    The candidate stage shuffles (query_id, corpus_id, adc) rows only —
    the float vectors enter at the re-rank equi-join, sized
    ``|queries| × rerank``. ``rerank >= |corpus|`` degrades to exact
    brute force (the oracle configuration, mirroring ``ivf_topk``'s
    exhaustive-probe contract).
    """
    m, kk, dsub = codebooks.shape
    books = codebooks

    queries = queries.filter(F.col(vec_col).isNotNull())
    q_rows = queries.select(
        F.col(id_col).alias("q_id"), as_double_array(vec_col).alias("q_v")
    ).collect()  # bounded query set, same contract as cosine_topk's broadcast
    if not q_rows:
        empty = corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
        return empty
    q_ids = np.array([r.q_id for r in q_rows])
    q_mat = _normalized(np.vstack([r.q_v for r in q_rows]))
    # per-query ADC tables: tables[q, j, c] = <q_j, codebook[j, c]>
    tables = np.stack(
        [q_mat[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )

    coded = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)

    @pandas_udf("array<double>")
    def adc_scores(codes: pd.Series) -> pd.Series:
        cmat = np.vstack(codes.to_numpy())  # (rows, m)
        # gather per subspace: scores (rows, nq) = sum_j tables[:, j, code_j]
        out = np.zeros((cmat.shape[0], len(q_ids)))
        for j in range(m):
            out += tables[:, j, cmat[:, j]].T
        return pd.Series(list(out))

    scored = coded.select(
        F.col(id_col).alias("c_id"), adc_scores("pq_code").alias("s")
    ).select(
        "c_id", F.posexplode("s").alias("qi", "adc")
    )
    # explicit bigint: F.lit on a small Python int makes an int32
    # literal, which would narrow query_id below the corpus id's int64
    # and break the driver's TYPED hash (the q13/q20 class)
    qmap = F.array(*[F.lit(int(i)) for i in q_ids]).cast("array<bigint>")
    scored = scored.select(
        F.element_at(qmap, F.col("qi") + 1).alias("q_id"), "c_id", "adc"
    ).filter(F.col("q_id") != F.col("c_id"))
    # two-phase per-query top-R: a single q_id-partitioned window would
    # pull one query's ENTIRE corpus scan through one task; pre-pruning
    # per (q_id, physical partition) caps the final window's input at
    # n_partitions × rerank rows per query
    w_pre = Window.partitionBy("q_id", "__p").orderBy(
        F.desc("adc"), F.asc("c_id")
    )
    pre = (
        scored.withColumn("__p", F.spark_partition_id())
        .withColumn("r1", F.row_number().over(w_pre))
        .filter(F.col("r1") <= rerank)
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("c_id"))
    pool = (
        pre.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= rerank)
        .select("q_id", "c_id")
    )
    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_array(vec_col).alias("q_v")
    )
    cv = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("c_id"), as_double_array(vec_col).alias("c_v")
    )
    exact = (
        pool.join(F.broadcast(qv), "q_id")
        .join(cv, "c_id")
        .withColumn("cos", cosine(F.col("q_v"), F.col("c_v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int | None = 4,
    rerank: int = 50,
) -> DataFrame:
    """IVF-PQ: the composite ANN index (coarse inverted lists × PQ
    codes × exact re-rank) — FAISS's ``IVFx,PQy`` shape with
    ``by_residual=false`` (codes quantize the normalized vectors
    directly; the residual variant changes fidelity, not the plan).

    Per query only the ``nprobe`` probed cells' CODES are scanned
    (an equi-join on centroid id — at scale a partition-pruned read of
    a codes table bucketed by cell), each code scored by ``m`` ADC
    table lookups; only the per-query top-``rerank`` pool rejoins the
    float vectors for exact fold-order cosine. ``nprobe >= C`` and
    ``rerank >= |corpus|`` degrade to exact brute force — the
    oracle-checked configuration, same contract as ivf_topk/pq_topk.
    """
    from censo_escolar_spark.operators.similarity import ivf_assign

    setup = _ivfpq_probe_setup(
        corpus.sparkSession, queries, centroids, codebooks,
        id_col=id_col, vec_col=vec_col, nprobe=nprobe,
    )
    if setup is None:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    probes, tables, _ = setup
    coded = pq_encode(
        ivf_assign(corpus, centroids, vec_col=vec_col),
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
    ).select(
        F.col(id_col).alias("c_id"),
        F.col("__centroid_id").alias("cell"),
        "pq_code",
    )
    return _ivfpq_adc_rerank(
        coded, probes, tables, codebooks.shape[0],
        queries=queries, vectors=corpus,
        id_col=id_col, vec_col=vec_col, rerank=rerank, k=k,
    )


def _ivfpq_probe_setup(
    spark,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    *,
    id_col: str,
    vec_col: str,
    nprobe: int | None,
):
    """Driver-side IVF-PQ probe setup (bounded query set by the s01
    contract): the (q_id, qi, cell) probe-pair frame, the per-query ADC
    lookup tables, and the sorted union of probed cells (the
    partition-prune list for stored-codes readers). None when the query
    set is empty."""
    queries = queries.filter(F.col(vec_col).isNotNull())
    m, kk, dsub = codebooks.shape
    books = codebooks
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    if nprobe is None:  # exhaustive regardless of auto-sized cell count
        nprobe = cn.shape[0]

    q_rows = queries.select(
        F.col(id_col).alias("q_id"), as_double_array(vec_col).alias("q_v")
    ).collect()
    if not q_rows:
        return None
    q_ids = np.array([r.q_id for r in q_rows])
    q_mat = _normalized(np.vstack([r.q_v for r in q_rows]))
    tables = np.stack(
        [q_mat[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (nq, m, kk)
    probe_lists = np.argsort(-(q_mat @ cn.T), axis=1, kind="stable")[
        :, : min(nprobe, cn.shape[0])
    ]
    # (qi, cell) probe pairs — nq × nprobe rows, a driver-side constant
    probes = spark.createDataFrame(
        [
            (int(q_ids[qi]), int(qi), int(cell))
            for qi in range(len(q_ids))
            for cell in probe_lists[qi]
        ],
        "q_id long, qi int, cell int",
    )
    needed = sorted({int(c) for cells in probe_lists for c in cells})
    return probes, tables, needed


def _ivfpq_adc_rerank(
    coded: DataFrame,
    probes: DataFrame,
    tables: np.ndarray,
    m: int,
    *,
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    rerank: int,
    k: int,
) -> DataFrame:
    """The shared back half of IVF-PQ search: ADC-score the probed
    codes ``(c_id, cell, pq_code)``, pool the per-query top-``rerank``
    two-phase, and re-rank the pool with exact fold-order cosines from
    ``vectors``."""
    cand = coded.join(F.broadcast(probes), "cell").filter(
        F.col("q_id") != F.col("c_id")
    )

    def adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qi = pdf["qi"].to_numpy()
            cmat = np.vstack(pdf["pq_code"].to_numpy())
            s = np.zeros(len(pdf))
            for j in range(m):
                s += tables[qi, j, cmat[:, j]]
            out = pdf[["q_id", "c_id"]].copy()
            out["adc"] = s
            yield out

    scored = cand.select("q_id", "qi", "c_id", "pq_code").mapInPandas(
        adc, "q_id long, c_id long, adc double"
    )
    # two-phase per-query top-R (same rationale as pq_topk: never pull a
    # query's full probed scan through one window task)
    w_pre = Window.partitionBy("q_id", "__p").orderBy(
        F.desc("adc"), F.asc("c_id")
    )
    pre = (
        scored.withColumn("__p", F.spark_partition_id())
        .withColumn("r1", F.row_number().over(w_pre))
        .filter(F.col("r1") <= rerank)
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("c_id"))
    pool = (
        pre.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= rerank)
        .select("q_id", "c_id")
    )
    qv = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"), as_double_array(vec_col).alias("q_v")
    )
    cv = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("c_id"), as_double_array(vec_col).alias("c_v")
    )
    exact = (
        pool.join(F.broadcast(qv), "q_id")
        .join(cv, "c_id")
        .withColumn("cos", cosine(F.col("q_v"), F.col("c_v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus as a STORED IVF-PQ index: one parquet table of
    ``(id, pq_code)`` rows partitioned by the coarse cell — the codes
    are the ONLY thing a probe scan reads (m bytes/vector instead of
    dim floats, the PQ memory story made physical), and the probe of
    ``nprobe`` cells is a partition-pruned scan like the raw stored
    index (similarity.write_ivf_index). The float vectors stay in their
    source table; the exact re-rank joins them by id for the bounded
    top-``rerank`` pool only."""
    from censo_escolar_spark.operators.similarity import ivf_assign

    coded = pq_encode(
        ivf_assign(df, centroids, vec_col=vec_col),
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
    ).select(
        F.col(id_col).cast("bigint").alias("id"),
        "pq_code",
        F.col("__centroid_id").alias("cell"),
    )
    coded.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivfpq_topk_indexed(
    spark,
    index_path: str,
    vectors: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int | None = 4,
    rerank: int = 50,
) -> DataFrame:
    """IVF-PQ top-k against the STORED codes index written by
    ``write_ivfpq_index``: the codes scan is partition-PRUNED to the
    probed cells (a PartitionFilters predicate at the parquet source —
    asserted in tests), ADC-scored, pooled, and exactly re-ranked
    against ``vectors``. ``nprobe = None`` + ``rerank >= |corpus|``
    equals brute force (the oracle configuration, s13's contract)."""
    setup = _ivfpq_probe_setup(
        spark, queries, centroids, codebooks,
        id_col=id_col, vec_col=vec_col, nprobe=nprobe,
    )
    if setup is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    probes, tables, needed = setup
    coded = (
        spark.read.schema("id bigint, pq_code array<int>, cell int")
        .parquet(index_path)
        .filter(F.col("cell").isin(needed))
        .select(F.col("id").alias("c_id"), "cell", "pq_code")
    )
    return _ivfpq_adc_rerank(
        coded, probes, tables, codebooks.shape[0],
        queries=queries, vectors=vectors,
        id_col=id_col, vec_col=vec_col, rerank=rerank, k=k,
    )
