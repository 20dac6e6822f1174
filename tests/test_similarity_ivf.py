"""IVF ANN: recall at nprobe < C vs the brute-force baseline, and
quantizer/assignment invariants (the nprobe = C exhaustive case is
hash-checked against the DuckDB oracle via s04)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.operators import similarity as S
from censo_escolar_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_train_centroids_deterministic(spark, emb):
    c1 = S.train_centroids(emb, n_centroids=4, iters=0)
    c2 = S.train_centroids(emb, n_centroids=4, iters=0)
    assert c1.shape[1] == 64
    assert np.array_equal(c1, c2)  # seeded from smallest ids, no RNG


def test_ivf_assign_partitions_corpus(spark, emb):
    centroids = S.train_centroids(emb, n_centroids=4, iters=1)
    assigned = S.ivf_assign(emb, centroids)
    counts = {r["__centroid_id"]: r["n"] for r in assigned.groupBy("__centroid_id").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == emb.count()  # every vector in exactly one list
    assert all(0 <= c < 4 for c in counts)


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    centroids = S.train_centroids(emb, n_centroids=8, iters=1)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, queries, centroids, k=5, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF nprobe=3/8 recall {recall:.2f} below sanity floor"


def test_ivf_exhaustive_equals_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = S.cosine_topk(emb, queries, k=5).orderBy("query_id", "rank").collect()
    centroids = S.train_centroids(emb, n_centroids=4, iters=1)
    ivf = S.ivf_topk(emb, queries, centroids, k=5, nprobe=4).orderBy("query_id", "rank").collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in exact] == [
        (r.query_id, r.neighbor_id, r.rank) for r in ivf
    ]
