"""Lexical and hybrid retrieval operators (BM25, RRF fusion, maxsim).

The scale contract for every operator here is the inverted-index shape:
documents are scored ONLY through an equi-join between a (tiny,
broadcast) query-term table and the corpus posting lists — never an
all-pairs document comparison.  Candidate volume is the sum of the
probed posting-list lengths, partial aggregation is map-side, and the
final top-k is one window over the per-query candidate set.  At 100 TB
this is the standard sharded-retrieval plan: posting lists live
partitioned by term, the query side ships with the task, and each
shard emits its local top-k.

Cross-engine determinism (the DuckDB oracle hash-compares values):

- All counts (tf, df, dl) are exact integer aggregates — order-free.
- Per-term BM25 scores are per-row scalar expressions whose operand
  order is mirrored token-for-token in the oracle SQL; rational idf
  (no transcendental log — the t13 trick, see plans/northstar.py).
- The cross-row sum over matched query terms is the ONE float
  reduction; it is quantized to an exact BIGINT first (round(score *
  SCALE)), so the shuffle's partial-aggregation order can't change the
  result — the t33 pattern.
- Ranking sorts on the scaled BIGINT (ties broken by doc id), never on
  a float.

No reference analogue (the reference has no retrieval operators); this
extends the LLM-data-pipeline surface (retrieval-based contamination
checks, hard-negative mining, hybrid curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from censo_escolar_spark.functions import text as T

# One float-to-int quantum shared with the oracle SQL.  1e9 keeps the
# scaled per-term score far from BIGINT range even at df=1 idf on a
# 10M-document corpus (idf ~ 1e7, * 2.2 * 1e9 * 8 terms ~ 1.8e17).
BM25_SCALE = 1_000_000_000.0

# BM25 constants as exact double literals; `repr()` of these is embedded
# in the oracle SQL so both engines parse the SAME nearest-double (never
# recompute k1+1 at runtime — 1.2 + 1.0 is a half-ulp tie that could
# round differently from the literal 2.2).
BM25_K1 = 1.2
BM25_K1_PLUS_1 = 2.2
BM25_B = 0.75
BM25_ONE_MINUS_B = 0.25


def corpus_stats(docs: DataFrame, id_col: str, text_col: str):
    """(tf, dl, dfreq) posting-list statistics for a document corpus.

    tf: (doc_id, term, tf) — term frequency per document.
    dl: (doc_id, dl) — document length in tokens.
    dfreq: (term, df) — document frequency per term.

    Tokenization is the engine-wide whitespace split
    (functions.text.tokens); counts are exact BIGINTs.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(T.tokens(text_col)).alias("term")
    )
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    return tf, dl, dfreq


def rarest_query_terms(
    tf: DataFrame, dfreq: DataFrame, query_ids, n_terms: int = 8
) -> DataFrame:
    """Per query document, its `n_terms` rarest distinct terms.

    Query docs are picked by id (`query_ids` is a small literal list);
    term rarity is corpus document frequency with ties broken by the
    term string — a deterministic cut both engines express identically.
    Output: (qid, term, df), ≤ n_terms rows per query — broadcastable.
    """
    qtf = (
        tf.filter(F.col("doc_id").isin(list(query_ids)))
        .select(F.col("doc_id").alias("qid"), "term")
        .distinct()
        .join(dfreq, "term")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("df"), F.asc("term"))
    return (
        qtf.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n_terms)
        .select("qid", "term", "df")
    )


def bm25_rank(
    cand: DataFrame, *, n_docs: int, avgdl: float, k: int = 5
) -> DataFrame:
    """Score + rank BM25 candidates ``(qid, doc_id, tf, df, dl)``.

    The shared back half of corpus-scan BM25 (bm25_topk) and the
    stored-index probe (streaming/lexindex.py): per-term rational-idf
    scores quantized to BIGINT, the order-free integer sum, and the
    scaled-integer ranking window — identical expression shapes to the
    t39 oracle SQL."""
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    idf = (F.lit(float(n_docs)) - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    norm = F.lit(BM25_ONE_MINUS_B) + (F.lit(BM25_B) * (dld / F.lit(avgdl)))
    sterm = (idf * (tfd * F.lit(BM25_K1_PLUS_1))) / (
        tfd + (F.lit(BM25_K1) * norm)
    )
    scored = cand.select(
        F.col("qid").alias("query_id"),
        "doc_id",
        F.round(sterm * F.lit(BM25_SCALE)).cast("bigint").alias("qscaled"),
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("qscaled").cast("bigint").alias("score_scaled"),
        F.count("*").cast("int").alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "n_terms",
            "score_scaled",
            (F.col("score_scaled").cast("double") / F.lit(BM25_SCALE)).alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    stats=None,
) -> DataFrame:
    """Okapi BM25 top-k retrieval via an inverted-index equi-join.

    query_terms: (qid, term, df) — the broadcast probe set (e.g. from
    rarest_query_terms).  `stats` optionally carries precomputed
    (tf, dl, dfreq) so callers composing several retrievers reuse one
    corpus scan.  The query document itself is excluded from its own
    candidate set (the s01 convention).

    Returns (query_id, rank, doc_id, n_terms, score_scaled, score):
    score_scaled is the exact BIGINT the ranking sorts on; score is
    score_scaled / BM25_SCALE (one IEEE division, oracle-identical).
    """
    tf, dl, _ = stats if stats is not None else corpus_stats(docs, id_col, text_col)

    counts = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(T.token_count(text_col)).cast("bigint").alias("tot_tokens"),
    ).first()
    n_docs = int(counts["n_docs"])
    if n_docs == 0:  # empty corpus: no candidates, schema-stable
        return docs.sparkSession.createDataFrame(
            [],
            "query_id bigint, rank int, doc_id bigint, n_terms int,"
            " score_scaled bigint, score double",
        )
    # One exact-integer division each engine performs on the same
    # operands (the oracle recomputes it from the same counts).
    avgdl = float(counts["tot_tokens"]) / float(n_docs)

    # query_terms is usually derived from tf (rarest_query_terms), so
    # alias both sides to keep the self-join column references
    # unambiguous.
    t = tf.alias("t")
    q = query_terms.alias("q")
    cand = (
        t.join(
            F.broadcast(q),
            on=[
                F.col("t.term") == F.col("q.term"),
                F.col("t.doc_id") != F.col("q.qid"),
            ],
        )
        .select(
            F.col("q.qid").alias("qid"),
            F.col("t.doc_id").alias("doc_id"),
            F.col("t.tf").alias("tf"),
            F.col("q.df").alias("df"),
        )
        .join(dl, "doc_id")
    )
    return bm25_rank(cand, n_docs=n_docs, avgdl=avgdl, k=k)


# Reciprocal-rank-fusion constant (Cormack et al., SIGIR 2009).
RRF_K = 60


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    *,
    k: int = 5,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Fuse two ranked lists (query_id, doc_id, rank) by reciprocal rank.

    rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d)) with a missing list
    contributing 0.  With exactly two lists the sum is ONE fixed-order
    addition of two per-row scalars (never a cross-row float
    aggregation), so the fused score is bit-reproducible given
    bit-identical input ranks.  Ties (e.g. symmetric rank swaps) break
    by doc_id.  Scale: both inputs are per-query top-k lists — O(k)
    rows per query — so the fusion is a tiny outer join, broadcast if
    the query set is.
    """
    a = ranked_a.select("query_id", "doc_id", F.col("rank").alias("rank_a"))
    b = ranked_b.select("query_id", "doc_id", F.col("rank").alias("rank_b"))
    both = a.join(b, ["query_id", "doc_id"], "full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank_a").cast("double")),
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(),
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank_b").cast("double")),
    ).otherwise(F.lit(0.0))
    fused = both.select(
        "query_id",
        "doc_id",
        "rank_a",
        "rank_b",
        (contrib_a + contrib_b).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.col("rank_a").cast("int").alias("rank_lex"),
            F.col("rank_b").cast("int").alias("rank_dense"),
            "rrf",
        )
    )


def maxsim_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_blocks: int = 4,
    k: int = 5,
) -> DataFrame:
    """Late-interaction (ColBERT-style) maxsim rerank of an ANN
    candidate list.

    Each vector is treated as `n_blocks` contiguous token-block
    sub-vectors; maxsim(q, d) = Σ_j max_i cos(q_j, d_i).  All
    block cosines are the engine's fold-order dot (bit-identical to
    DuckDB's list_dot_product), max is order-free, and the outer sum is
    a FIXED left-to-right chain of n_blocks per-row scalars — no
    cross-row float aggregation anywhere, so the score survives the
    value-hash.

    candidates: (query_id, doc_id) — a bounded per-query list (an ANN
    top-k), which is what makes this the scale-true serving shape: the
    quadratic token-interaction matrix is only ever evaluated on
    ANN-pruned pairs, never corpus-wide.  The rerank joins the vector
    table twice (query side broadcastable) and evaluates
    n_blocks² fold cosines per pair inside codegen.
    """
    from censo_escolar_spark.functions.vectors import as_double_array, cosine

    if dim % n_blocks:
        raise ValueError(f"dim {dim} not divisible by n_blocks {n_blocks}")
    bs = dim // n_blocks

    # Only the candidate list's query ids are broadcast-eligible: the
    # ANN contract bounds them, while `vectors` is the full corpus.
    # Semi-join qv down to that bounded set BEFORE broadcasting —
    # broadcasting the unrestricted projection would ship the whole
    # vector table to every executor at scale.
    qids = candidates.select("query_id").distinct()
    qv = (
        vectors.select(
            F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("q_v")
        )
        .join(F.broadcast(qids), "query_id", "left_semi")
    )
    dv = vectors.select(
        F.col(id_col).alias("doc_id"), as_double_array(vec_col).alias("d_v")
    )
    pairs = candidates.select("query_id", "doc_id").join(
        F.broadcast(qv), "query_id"
    ).join(dv, "doc_id")

    def block(col: str, j: int):
        return F.slice(F.col(col), j * bs + 1, bs)

    per_qblock = [
        F.greatest(
            *[cosine(block("q_v", j), block("d_v", i)) for i in range(n_blocks)]
        )
        for j in range(n_blocks)
    ]
    score = per_qblock[0]
    for s in per_qblock[1:]:
        score = score + s

    scored = pairs.select("query_id", "doc_id", score.alias("maxsim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "maxsim",
        )
    )
