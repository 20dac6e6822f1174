"""Product-quantization operator: recall, determinism, robustness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.operators import pq, similarity
from censo_escolar_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_codebook_shape_and_determinism(spark, emb):
    b1 = pq.train_pq_codebooks(emb, m=4, k=8, iters=1)
    b2 = pq.train_pq_codebooks(emb, m=4, k=8, iters=1)
    assert b1.shape == (4, 8, 16)
    assert np.array_equal(b1, b2)


def test_dim_not_divisible_raises(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.train_pq_codebooks(emb, m=5, k=4, iters=0)


def test_encode_codes_in_range(spark, emb):
    books = pq.train_pq_codebooks(emb, m=4, k=8, iters=1)
    coded = pq.pq_encode(emb, books)
    row = coded.select("pq_code").first()
    assert len(row["pq_code"]) == 4
    stats = coded.select(
        F.min(F.array_min("pq_code")).alias("lo"),
        F.max(F.array_max("pq_code")).alias("hi"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < 8


def test_pq_recall_at_realistic_rerank(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    books = pq.train_pq_codebooks(emb, m=4, k=16, iters=1)
    approx = pq.pq_topk(emb, queries, books, k=5, rerank=100)
    exact = similarity.cosine_topk(emb, queries, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # the fixture embeddings are near-isotropic (no cluster structure —
    # the hardest case for any ANN); a 20%-of-corpus ADC pool still has
    # to place most true neighbors
    assert recall >= 0.8, f"PQ recall {recall:.2f} below bound"


def test_pq_exhaustive_rerank_equals_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 4)
    books = pq.train_pq_codebooks(emb, m=4, k=8, iters=1)
    approx = pq.pq_topk(emb, queries, books, k=3, rerank=10**6)
    exact = similarity.cosine_topk(emb, queries, k=3)
    cols = ["query_id", "neighbor_id", "rank"]
    assert sorted(map(tuple, approx.select(*cols).collect())) == sorted(
        map(tuple, exact.select(*cols).collect())
    )


def test_pq_null_and_zero_vectors_survive(spark, emb):
    dim = len(emb.select("embedding").first()["embedding"])
    extra = spark.createDataFrame(
        [(100000, None, 0), (100001, [0.0] * dim, 0)],
        "vec_id long, embedding array<double>, label int",
    )
    aug = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    ).unionByName(extra)
    books = pq.train_pq_codebooks(aug, m=4, k=8, iters=1)
    queries = aug.filter(F.col("vec_id") < 2)
    out = pq.pq_topk(aug, queries, books, k=3, rerank=20)
    assert out.count() > 0


def test_pq_empty_queries(spark, emb):
    books = pq.train_pq_codebooks(emb, m=4, k=8, iters=0)
    out = pq.pq_topk(emb, emb.filter(F.lit(False)), books, k=3)
    assert out.count() == 0


def test_ivfpq_exhaustive_equals_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 4)
    centroids = similarity.train_centroids(emb, n_centroids=8, iters=1)
    books = pq.train_pq_codebooks(emb, m=4, k=8, iters=1)
    approx = pq.ivfpq_topk(
        emb, queries, centroids, books, k=3, nprobe=8, rerank=10**6
    )
    exact = similarity.cosine_topk(emb, queries, k=3)
    cols = ["query_id", "neighbor_id", "rank"]
    assert sorted(map(tuple, approx.select(*cols).collect())) == sorted(
        map(tuple, exact.select(*cols).collect())
    )


def test_ivfpq_recall_at_realistic_config(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    centroids = similarity.train_centroids(emb, n_centroids=8, iters=1)
    books = pq.train_pq_codebooks(emb, m=4, k=16, iters=1)
    approx = pq.ivfpq_topk(
        emb, queries, centroids, books, k=5, nprobe=4, rerank=100
    )
    exact = similarity.cosine_topk(emb, queries, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # isotropic fixture + half the cells probed: IVF alone holds ~0.6
    # here (tests/test_similarity_ivf.py); the PQ pool must not drop it
    assert recall >= 0.5, f"IVF-PQ recall {recall:.2f} below bound"


def test_ivfpq_empty_queries(spark, emb):
    centroids = similarity.train_centroids(emb, n_centroids=4, iters=0)
    books = pq.train_pq_codebooks(emb, m=4, k=8, iters=0)
    out = pq.ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 0), centroids, books, k=3
    )
    assert out.count() == 0


def test_ivfpq_indexed_prunes_and_matches(spark, emb, tmp_path):
    """The persisted IVF-PQ codes index (write_ivfpq_index /
    ivfpq_topk_indexed): exhaustive probe + full rerank equals the
    in-memory ivfpq_topk (and hence brute force); the stored table
    holds codes only; a pruned probe's scan carries the cell partition
    filter and keeps sane recall."""
    import os

    idx = str(tmp_path / "ivfpq_index")
    centroids = similarity.train_centroids(emb, n_centroids=4, iters=1)
    books = pq.train_pq_codebooks(emb, m=4, k=16, iters=1)
    pq.write_ivfpq_index(emb, idx, centroids, books)
    cells = sorted(d for d in os.listdir(idx) if d.startswith("cell="))
    assert len(cells) >= 2
    # stored rows are (id, pq_code) only — no float vectors in the index
    stored_cols = set(
        spark.read.parquet(idx).columns
    )
    assert stored_cols == {"id", "pq_code", "cell"}

    queries = emb.filter(F.col("vec_id") < 8)
    mem = (
        pq.ivfpq_topk(emb, queries, centroids, books, k=5, nprobe=None,
                      rerank=1_000_000)
        .orderBy("query_id", "rank")
        .collect()
    )
    stored = (
        pq.ivfpq_topk_indexed(spark, idx, emb, queries, centroids, books,
                              k=5, nprobe=None, rerank=1_000_000)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.query_id, r.neighbor_id, r.rank) for r in mem] == [
        (r.query_id, r.neighbor_id, r.rank) for r in stored
    ]

    pruned = pq.ivfpq_topk_indexed(
        spark, idx, emb, queries, centroids, books, k=5, nprobe=1, rerank=50
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    got = {(r.query_id, r.neighbor_id) for r in pruned.collect()}
    truth = {(r.query_id, r.neighbor_id) for r in mem}
    assert len(got & truth) / len(truth) >= 0.4


def test_ivfpq_incremental_matches_one_shot_and_brute_force(
    spark, emb, tmp_path
):
    """The incrementally-built codes store (insert/insert/delete/insert
    with the in-loop delete-aware fold) must hold EXACTLY the codes the
    one-shot writer produces for the live set — frozen codebooks make
    encoding a pure function of the vector — and its exhaustive probe
    must equal brute force over the live set."""
    from censo_escolar_spark.streaming.ivfindex import (
        apply_ivfpq_delete_batch,
        apply_ivfpq_index_batch,
        ivfpq_topk_incremental,
        read_ivfpq_index_state,
    )

    first = emb.filter(F.col("vec_id") % 3 == 0)
    cents = similarity.train_centroids(first, iters=1)
    books = pq.train_pq_codebooks(first, m=4, k=16, iters=1)
    state = str(tmp_path / "pqstate")
    ins = dict(state_dir=state, centroids=cents, codebooks=books, compact_every=2)
    apply_ivfpq_index_batch(first, 1, **ins)
    apply_ivfpq_index_batch(emb.filter(F.col("vec_id") % 3 == 1), 2, **ins)
    apply_ivfpq_delete_batch(
        emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
        3,
        state_dir=state,
        compact_every=2,
    )
    apply_ivfpq_index_batch(emb.filter(F.col("vec_id") % 3 == 2), 4, **ins)

    live = emb.filter(~((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 3 != 2)))
    # stored codes == one-shot encoding of the live set (id-keyed)
    oneshot = str(tmp_path / "oneshot")
    pq.write_ivfpq_index(live, oneshot, cents, books)
    a = {
        (r["id"], tuple(r["pq_code"]), r["cell"])
        for r in read_ivfpq_index_state(spark, state).collect()
    }
    b = {
        (r["id"], tuple(r["pq_code"]), r["cell"])
        for r in spark.read.parquet(oneshot).collect()
    }
    assert a == b and len(a) > 0

    queries = emb.filter(F.col("vec_id") < 8)
    got = ivfpq_topk_incremental(
        spark, state, queries, live, cents, books,
        k=5, nprobe=None, rerank=1_000_000,
    )
    ref = similarity.cosine_topk(live, queries, k=5)
    ga = [tuple(r) for r in got.orderBy("query_id", "rank").collect()]
    rb = [tuple(r) for r in ref.orderBy("query_id", "rank").collect()]
    assert ga == rb


def test_ivfpq_incremental_recall_and_snapshot(spark, emb, tmp_path):
    """Realistic (nprobe, rerank) keeps recall against exact top-k on
    the live set; a below= horizon resolves the pre-ingest snapshot
    (only horizons at-or-above the last fold resolve)."""
    from censo_escolar_spark.streaming.ivfindex import (
        apply_ivfpq_delete_batch,
        apply_ivfpq_index_batch,
        ivfpq_topk_incremental,
    )

    first = emb.filter(F.col("vec_id") % 3 == 0)
    cents = similarity.train_centroids(first, iters=1)
    books = pq.train_pq_codebooks(first, m=4, k=16, iters=1)
    state = str(tmp_path / "pqstate2")
    ins = dict(state_dir=state, centroids=cents, codebooks=books, compact_every=2)
    apply_ivfpq_index_batch(first, 1, **ins)
    apply_ivfpq_index_batch(emb.filter(F.col("vec_id") % 3 == 1), 2, **ins)
    apply_ivfpq_delete_batch(
        emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
        3,
        state_dir=state,
        compact_every=2,
    )
    apply_ivfpq_index_batch(emb.filter(F.col("vec_id") % 3 == 2), 4, **ins)

    queries = emb.filter(F.col("vec_id") < 8)
    live = emb.filter(~((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 3 != 2)))
    approx = ivfpq_topk_incremental(
        spark, state, queries, live, cents, books, k=5, nprobe=None, rerank=150
    )
    exact = similarity.cosine_topk(live, queries, k=5)
    hits = approx.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    )
    recall = hits.count() / max(1, exact.count())
    # isotropic fixture (ANN's hardest case) + codebooks trained on the
    # FIRST increment only (the frozen-codebook lifecycle): a ~30%-of-
    # corpus ADC pool must still place most true neighbors
    assert recall >= 0.8, f"IVF-PQ incremental recall {recall:.2f}"

    # snapshot at the fold horizon: inserts 1-2 minus the tombstones
    snap_live = emb.filter(
        (F.col("vec_id") % 3 != 2) & (F.col("vec_id") % 5 != 0)
    )
    snap = ivfpq_topk_incremental(
        spark, state, queries, snap_live, cents, books,
        k=5, nprobe=None, rerank=1_000_000, below=4,
    )
    ref = similarity.cosine_topk(snap_live, queries, k=5)
    assert [tuple(r) for r in snap.orderBy("query_id", "rank").collect()] == [
        tuple(r) for r in ref.orderBy("query_id", "rank").collect()
    ]


def test_maintain_ivfpq_index_streaming(spark, emb, tmp_path):
    """The compressed-index maintainer drains a real file-source stream
    (maxFilesPerTrigger=1 -> one micro-batch per increment) into the
    same store the direct applies build; the exhaustive probe equals
    brute force over everything streamed."""
    import glob
    import os
    import shutil

    from censo_escolar_spark.streaming.ivfindex import (
        ivfpq_topk_incremental,
        maintain_ivfpq_index,
    )

    first = emb.filter(F.col("vec_id") % 3 == 0)
    cents = similarity.train_centroids(first, iters=1)
    books = pq.train_pq_codebooks(first, m=4, k=16, iters=1)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(3):
        p = str(tmp_path / f"s{i}")
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(p)
        for f in sorted(glob.glob(p + "/*.parquet")):
            dst = os.path.join(src, f"s{i}_{os.path.basename(f)}")
            shutil.copyfile(f, dst)
            os.utime(dst, (4_000_000 + i, 4_000_000 + i))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    maintain_ivfpq_index(
        stream,
        state_dir=state,
        checkpoint=ckpt,
        centroids=cents,
        codebooks=books,
        compact_every=2,
    )
    queries = emb.filter(F.col("vec_id") < 8)
    got = ivfpq_topk_incremental(
        spark, state, queries, emb, cents, books,
        k=5, nprobe=None, rerank=1_000_000,
    )
    ref = similarity.cosine_topk(emb, queries, k=5)
    assert [tuple(r) for r in got.orderBy("query_id", "rank").collect()] == [
        tuple(r) for r in ref.orderBy("query_id", "rank").collect()
    ]
