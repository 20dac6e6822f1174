"""Lexical/hybrid retrieval operators (operators/retrieval.py).

Hand-computed BM25 on a 4-doc corpus, RRF fusion algebra (missing
lists, symmetric-rank ties), maxsim block algebra, and the broadcast
plan shape that makes the inverted-index join scale.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.operators import retrieval


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple cherry cherry durian"),
        (3, "durian durian durian"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bm25_ref(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = (n_docs - df + 0.5) / (df + 0.5)
    norm = (1.0 - b) + b * (dl / avgdl)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * norm)


def test_corpus_stats_counts(spark, tiny_docs):
    tf, dl, dfreq = retrieval.corpus_stats(tiny_docs, "doc_id", "text")
    assert {tuple(r) for r in dl.collect()} == {(0, 3), (1, 2), (2, 4), (3, 3)}
    got_df = {r["term"]: r["df"] for r in dfreq.collect()}
    assert got_df == {"apple": 2, "banana": 2, "cherry": 2, "durian": 2}
    got_tf = {(r["doc_id"], r["term"]): r["tf"] for r in tf.collect()}
    assert got_tf[(0, "apple")] == 2 and got_tf[(3, "durian")] == 3


def test_rarest_query_terms_deterministic_cut(spark, tiny_docs):
    tf, _, dfreq = retrieval.corpus_stats(tiny_docs, "doc_id", "text")
    # doc 2 has three distinct terms, all df=2 -> tie breaks by term asc.
    qt = retrieval.rarest_query_terms(tf, dfreq, [2], n_terms=2).collect()
    assert [(r["qid"], r["term"]) for r in sorted(qt, key=lambda r: r["term"])] == [
        (2, "apple"),
        (2, "cherry"),
    ]


def test_bm25_matches_hand_computation(spark, tiny_docs):
    tf, dl, dfreq = retrieval.corpus_stats(tiny_docs, "doc_id", "text")
    qt = retrieval.rarest_query_terms(tf, dfreq, [0], n_terms=8)
    out = retrieval.bm25_topk(tiny_docs, qt, k=5, stats=(tf, dl, dfreq)).collect()
    # query doc 0 = {apple, banana}; candidates: doc 1 (banana), doc 2 (apple).
    by_doc = {r["doc_id"]: r for r in out}
    assert set(by_doc) == {1, 2}
    assert all(r["query_id"] == 0 for r in out)
    avgdl = 12 / 4
    exp1 = _bm25_ref(tf=1, df=2, dl=2, n_docs=4, avgdl=avgdl)
    exp2 = _bm25_ref(tf=1, df=2, dl=4, n_docs=4, avgdl=avgdl)
    assert by_doc[1]["score"] == pytest.approx(exp1, abs=2e-9)
    assert by_doc[2]["score"] == pytest.approx(exp2, abs=2e-9)
    # shorter doc scores higher (length normalization) -> rank 1.
    assert by_doc[1]["rank"] == 1 and by_doc[2]["rank"] == 2
    assert by_doc[1]["n_terms"] == 1


def test_bm25_excludes_query_doc_and_sorts_on_integer(spark, tiny_docs):
    tf, dl, dfreq = retrieval.corpus_stats(tiny_docs, "doc_id", "text")
    qt = retrieval.rarest_query_terms(tf, dfreq, [0, 3], n_terms=8)
    out = retrieval.bm25_topk(tiny_docs, qt, k=5, stats=(tf, dl, dfreq))
    assert out.filter(F.col("query_id") == F.col("doc_id")).count() == 0
    schema = dict(out.dtypes)
    assert schema["score_scaled"] == "bigint" and schema["rank"] == "int"


def test_bm25_query_side_broadcasts(spark, tiny_docs):
    tf, dl, dfreq = retrieval.corpus_stats(tiny_docs, "doc_id", "text")
    qt = retrieval.rarest_query_terms(tf, dfreq, [0], n_terms=8)
    plan = (
        retrieval.bm25_topk(tiny_docs, qt, k=5, stats=(tf, dl, dfreq))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_rrf_fuse_missing_and_tie(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id bigint, doc_id bigint, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id bigint, doc_id bigint, rank int"
    )
    out = {r["doc_id"]: r for r in retrieval.rrf_fuse(a, b, k=5).collect()}
    assert out[11]["rrf"] == pytest.approx(1 / 62 + 1 / 61)
    assert out[10]["rrf"] == pytest.approx(1 / 61)
    assert out[12]["rrf"] == pytest.approx(1 / 62)
    assert out[11]["rank"] == 1
    # docs 10 and 12 have symmetric contributions 1/61 vs 1/62 -> 10 first
    assert out[10]["rank"] == 2 and out[12]["rank"] == 3
    assert out[10]["rank_dense"] is None and out[12]["rank_lex"] is None


def test_rrf_symmetric_rank_tie_breaks_by_doc_id(spark):
    a = spark.createDataFrame(
        [(0, 20, 1), (0, 21, 2)], "query_id bigint, doc_id bigint, rank int"
    )
    b = spark.createDataFrame(
        [(0, 21, 1), (0, 20, 2)], "query_id bigint, doc_id bigint, rank int"
    )
    out = {r["doc_id"]: r["rank"] for r in retrieval.rrf_fuse(a, b, k=5).collect()}
    assert out == {20: 1, 21: 2}


def test_maxsim_hand_block_algebra(spark):
    # dim=4, 2 blocks of 2. Query doc 0; candidate docs 1 and 2.
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),
        (1, [1.0, 0.0, 1.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cand = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id bigint, doc_id bigint"
    )
    out = {
        r["doc_id"]: r
        for r in retrieval.maxsim_rerank(
            cand, emb, dim=4, n_blocks=2, k=5
        ).collect()
    }
    # q blocks: [1,0], [0,1].
    # doc 1 blocks: [1,0], [1,0]: max cos per q-block = 1, 0 -> 1.0
    # doc 2 blocks: [0,1], [0,1]: max cos per q-block = 0, 1 -> wait:
    #   q0=[1,0] vs [0,1] -> 0; q1=[0,1] vs [0,1] -> 1 -> total 1.0 + 1.0? No:
    #   doc2 both blocks are [0,1]: q0 max = 0, q1 max = 1 -> 1.0
    assert out[1]["maxsim"] == pytest.approx(1.0)
    assert out[2]["maxsim"] == pytest.approx(1.0)
    # tie -> doc_id asc
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2


def test_maxsim_rejects_indivisible_blocks(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id bigint, embedding array<float>"
    )
    cand = spark.createDataFrame([(0, 0)], "query_id bigint, doc_id bigint")
    with pytest.raises(ValueError, match="not divisible"):
        retrieval.maxsim_rerank(cand, emb, dim=3, n_blocks=2)


def test_maxsim_upper_bounds_single_vector_cosine(spark, sf_dir):
    """maxsim over blocks >= full-vector cosine for unit-comparable
    shapes is NOT a theorem; instead sanity-check ordering stability:
    the rerank keeps exactly k rows per query with dense ranks 1..k."""
    from censo_escolar_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    from censo_escolar_spark.operators import similarity

    cand = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 2), k=16
    ).select("query_id", F.col("neighbor_id").alias("doc_id"))
    out = retrieval.maxsim_rerank(cand, emb, dim=64, n_blocks=4, k=5)
    got = out.groupBy("query_id").agg(
        F.count("*").alias("n"), F.collect_set("rank").alias("ranks")
    ).collect()
    for r in got:
        assert r["n"] == 5 and sorted(r["ranks"]) == [1, 2, 3, 4, 5]
    assert not math.isnan(out.agg(F.sum("maxsim")).first()[0])
