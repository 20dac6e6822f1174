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


# ---------------------------------------------------------------------------
# knn_join (exact kNN self-join)
# ---------------------------------------------------------------------------


def _brute_knn(vecs: dict[int, np.ndarray], k: int) -> set[tuple[int, int, int]]:
    out = set()
    for qid, qv in vecs.items():
        scored = []
        for cid, cv in vecs.items():
            if cid == qid:
                continue
            cos = float(
                np.dot(qv, cv) / (np.linalg.norm(qv) * np.linalg.norm(cv))
            )
            scored.append((-cos, cid))
        scored.sort()
        for rank, (_, cid) in enumerate(scored[:k], start=1):
            out.add((qid, cid, rank))
    return out


def test_knn_join_matches_brute_force_multiblock(spark, emb):
    sub = emb.filter(F.col("vec_id") < 40)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in sub.collect()
    }
    # n_blocks=4 forces real cross-block candidate generation
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.knn_join(sub, k=3, n_blocks=4).collect()
    }
    assert got == _brute_knn(vecs, 3)


def test_knn_join_k_larger_than_corpus(spark, emb):
    sub = emb.filter(F.col("vec_id") < 4)
    rows = S.knn_join(sub, k=10, n_blocks=2).collect()
    # every row can only have the other 3 as neighbors; no self matches
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == {0, 1, 2, 3}
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3]


def test_knn_join_ranks_are_cos_descending(spark, emb):
    sub = emb.filter(F.col("vec_id") < 20)
    rows = S.knn_join(sub, k=4, n_blocks=3).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos))
    for pairs in by_q.values():
        pairs.sort()
        coses = [c for _, c in pairs]
        assert coses == sorted(coses, reverse=True)


# ---------------------------------------------------------------------------
# mmr_rerank (greedy diversity re-rank)
# ---------------------------------------------------------------------------


def _mmr_brute(vecs, qids, k, fetch_k, lam):
    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    out = {}
    for q in qids:
        cands = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in vecs if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:fetch_k]
        rel = {c: r for r, c in cands}
        selected = []
        for _ in range(k):
            best = None
            for c in rel:
                if c in selected:
                    continue
                pen = max((cos(vecs[c], vecs[s]) for s in selected), default=0.0)
                score = lam * rel[c] - (1.0 - lam) * pen
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            selected.append(best[1])
        out[q] = selected
    return out


def test_mmr_matches_greedy_reference(spark, emb):
    sub = emb.filter(F.col("vec_id") < 30)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in sub.collect()
    }
    queries = sub.filter(F.col("vec_id") < 4)
    rows = S.mmr_rerank(sub, queries, k=3, fetch_k=8, lam=0.7).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.mmr_rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got == _mmr_brute(vecs, [0, 1, 2, 3], 3, 8, 0.7)


def test_mmr_rank1_is_top_cosine(spark, emb):
    queries = emb.filter(F.col("vec_id") < 4)
    top1 = {
        r.query_id: r.neighbor_id
        for r in S.cosine_topk(emb, queries, k=1).collect()
    }
    mmr1 = {
        r.query_id: r.neighbor_id
        for r in S.mmr_rerank(emb, queries, k=2, fetch_k=6).collect()
        if r.mmr_rank == 1
    }
    assert mmr1 == top1


def test_ivf_knn_join_recall_vs_exact(spark, emb):
    """s17's shape: the whole corpus probes the inverted file. At
    nprobe < C recall degrades gracefully against the exact blocked-GEMM
    kNN-join (s15); exhaustive probing equals it (oracle-checked)."""
    sub = emb.filter(F.col("vec_id") < 60)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_join(sub, k=3).collect()
    }
    centroids = S.train_centroids(sub, n_centroids=6, iters=1)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_knn_join(sub, centroids, k=3, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF kNN-join nprobe=2/6 recall {recall:.2f}"

    exhaustive = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.ivf_knn_join(sub, centroids, k=3, nprobe=6).collect()
    }
    exact_ranked = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.knn_join(sub, k=3).collect()
    }
    assert exhaustive == exact_ranked  # nprobe = C degrades to exact


# --- random projection (s19) -------------------------------------------


def test_sign_projection_matches_numpy(spark, emb):
    mat = S.sign_projection_matrix(16, 64)
    got = {
        r.vec_id: np.array(r.proj)
        for r in S.project_signs(emb, mat).collect()
    }
    raw = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.filter(F.col("embedding").isNotNull()).collect()
    }
    for vid, v in raw.items():
        np.testing.assert_allclose(got[vid], mat @ v, rtol=1e-9)


def test_sign_projection_shortlist_recall(spark, emb):
    """JL contract in its production shape: the projected space is a
    CANDIDATE generator (shortlist top-50, exact re-rank full-dim).
    True top-5 neighbors must land in the projected top-50 well above
    chance. (Exact top-5-to-top-5 overlap is NOT asserted: the fixture
    embeddings are near-random, so 16-dim distortion swamps the tiny
    neighbor gaps — the shortlist is what the operator promises.)"""
    mat = S.sign_projection_matrix(16, 64)
    raw = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.filter(F.col("embedding").isNotNull()).collect()
    }
    ids = sorted(raw)
    X = np.vstack([raw[i] for i in ids])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    P = X @ mat.T
    Pn = P / np.linalg.norm(P, axis=1, keepdims=True)
    recalls = []
    for qi in range(min(8, len(ids))):
        full = (Xn @ Xn[qi]).argsort()[::-1]
        proj = (Pn @ Pn[qi]).argsort()[::-1]
        top_full = {ids[j] for j in full[1:6]}
        shortlist = {ids[j] for j in proj[1:51]}
        recalls.append(len(top_full & shortlist) / 5)
    # chance is 50/n (= 0.1 at the 500-row fixture); measured ~0.5
    assert sum(recalls) / len(recalls) >= 0.3


def test_ivf_indexed_topk_prunes_partitions_and_matches(spark, emb, tmp_path):
    """The persisted IVF index (write_ivf_index / ivf_topk_indexed):
    exhaustive probe equals brute force; a pruned probe's scan carries a
    cell partition filter (the partition-pruning claim, checked against
    the plan) and reads only the probed cells."""
    import os

    idx = str(tmp_path / "ivf_index")
    centroids = S.train_centroids(emb, n_centroids=4, iters=1)
    S.write_ivf_index(emb, idx, centroids)
    # physical layout: one partition directory per cell
    cells = sorted(d for d in os.listdir(idx) if d.startswith("cell="))
    assert len(cells) >= 2

    queries = emb.filter(F.col("vec_id") < 8)
    exact = S.cosine_topk(emb, queries, k=5).orderBy("query_id", "rank").collect()
    stored = (
        S.ivf_topk_indexed(spark, idx, queries, centroids, k=5, nprobe=None)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.query_id, r.neighbor_id, r.rank) for r in exact] == [
        (r.query_id, r.neighbor_id, r.rank) for r in stored
    ]

    pruned = S.ivf_topk_indexed(spark, idx, queries, centroids, k=5, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # recall at nprobe=1/4 still finds a sane share of the true top-k
    got = {(r.query_id, r.neighbor_id) for r in pruned.collect()}
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    assert len(got & truth) / len(truth) >= 0.4


def test_ivf_incremental_index_matches_prunes_and_retries(spark, emb, tmp_path):
    """The incrementally-maintained IVF index (streaming/ivfindex.py):
    three appends + in-loop compaction hold exactly the corpus; the
    exhaustive probe equals brute force; a pruned probe's scan carries a
    cell partition filter; a retried batch converges to the same state."""
    import os

    from censo_escolar_spark.streaming.ivfindex import (
        apply_ivf_index_batch,
        ivf_topk_incremental,
        read_ivf_index_state,
    )

    state = str(tmp_path / "ivf_state")
    centroids = S.train_centroids(
        emb.filter(F.col("vec_id") % 4 == 0), n_centroids=4, iters=1
    )
    for bid in (1, 2, 3, 4):
        apply_ivf_index_batch(
            emb.filter(F.col("vec_id") % 4 == bid - 1),
            bid,
            state_dir=state,
            centroids=centroids,
            compact_every=2,
        )
    # compaction at batches 2 and 4 folded strictly-prior history: the
    # listing is {batch=3 (the fold of 1..3), batch=4}, not 4 dirs
    batch_dirs = sorted(
        d for d in os.listdir(os.path.join(state, "index"))
        if d.startswith("batch=")
    )
    assert batch_dirs == ["batch=3", "batch=4"]
    assert read_ivf_index_state(spark, state).count() == emb.count()

    queries = emb.filter(F.col("vec_id") < 8)
    exact = S.cosine_topk(emb, queries, k=5).orderBy("query_id", "rank").collect()
    inc = (
        ivf_topk_incremental(spark, state, queries, centroids, k=5, nprobe=None)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.query_id, r.neighbor_id, r.rank) for r in exact] == [
        (r.query_id, r.neighbor_id, r.rank) for r in inc
    ]

    pruned = ivf_topk_incremental(spark, state, queries, centroids, k=5, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    got = {(r.query_id, r.neighbor_id) for r in pruned.collect()}
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    assert len(got & truth) / len(truth) >= 0.4

    # exactly-once: a replay of batch 4 overwrites its own partitions
    # and resolves the identical index
    before = sorted(
        (r.id, r.cell) for r in read_ivf_index_state(spark, state).collect()
    )
    apply_ivf_index_batch(
        emb.filter(F.col("vec_id") % 4 == 3),
        4,
        state_dir=state,
        centroids=centroids,
        compact_every=2,
    )
    after = sorted(
        (r.id, r.cell) for r in read_ivf_index_state(spark, state).collect()
    )
    assert before == after


def test_ivf_index_deletes_are_batch_ordered(spark, emb, tmp_path):
    """Tombstones remove only rows inserted strictly before them: a
    later re-insert of the same id stays live; the compaction fold
    physically reclaims tombstoned rows and drops consumed tombstones;
    a retried delete batch converges."""
    import os

    from censo_escolar_spark.streaming.ivfindex import (
        apply_ivf_delete_batch,
        apply_ivf_index_batch,
        read_ivf_index_state,
    )

    state = str(tmp_path / "ivf_state")
    centroids = S.train_centroids(emb, n_centroids=4, iters=1)
    n = emb.count()
    ids = lambda: {r.id for r in read_ivf_index_state(spark, state).collect()}

    # batch 1: insert everything; batch 2: delete vec_id % 5 == 0
    apply_ivf_index_batch(emb, 1, state_dir=state, centroids=centroids,
                          compact_every=None)
    apply_ivf_delete_batch(
        emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"), 2,
        state_dir=state, compact_every=None,
    )
    live = ids()
    assert live == {r.vec_id for r in emb.filter(F.col("vec_id") % 5 != 0)
                    .select("vec_id").collect()}

    # retried delete batch: same id, same result
    apply_ivf_delete_batch(
        emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"), 2,
        state_dir=state, compact_every=None,
    )
    assert ids() == live

    # batch 3: RE-INSERT a deleted id -> live again (tombstone is older)
    apply_ivf_index_batch(
        emb.filter(F.col("vec_id") == 0), 3, state_dir=state,
        centroids=centroids, compact_every=None,
    )
    assert ids() == live | {0}

    # batch 4 with compact_every=4 folds upto=3: tombstoned rows
    # physically gone, consumed tombstones dropped, live view unchanged
    apply_ivf_index_batch(
        emb.limit(0), 4, state_dir=state, centroids=centroids,
        compact_every=4,
    )
    assert ids() == live | {0}
    batch_dirs = sorted(
        d for d in os.listdir(os.path.join(state, "index"))
        if d.startswith("batch=")
    )
    assert batch_dirs == ["batch=3", "batch=4"]
    # the folded index physically holds exactly the live rows
    raw = spark.read.schema("id bigint, v array<double>, cell int, batch int").parquet(
        os.path.join(state, "index")
    )
    assert {r.id for r in raw.collect()} == live | {0}
    # all tombstones consumed by the fold
    dels = spark.read.schema("id bigint, batch int").parquet(
        os.path.join(state, "deletes")
    )
    assert dels.count() == 0


def test_ivf_filtered_topk_pushes_predicate_and_matches(spark, emb, tmp_path):
    """Metadata-filtered stored-index probe (ivf_topk_indexed_filtered):
    exhaustive probe equals the filtered brute force (s09 semantics);
    the pruned probe's scan carries BOTH the cell partition filter and
    the label row-group filter, and recall within the label slice stays
    sane at nprobe < C."""
    idx = str(tmp_path / "ivf_index_meta")
    centroids = S.train_centroids(emb, n_centroids=4, iters=1)
    S.write_ivf_index(emb, idx, centroids, meta_cols=("label",))

    queries = emb.filter(F.col("vec_id") < 8)
    # filtered brute force: candidates restricted to the query's label
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        S.as_double_array("embedding").alias("q_v"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        S.as_double_array("embedding").alias("c_v"),
    )
    from pyspark.sql import Window

    from censo_escolar_spark.functions.vectors import cosine

    scored = c.join(
        F.broadcast(q),
        (F.col("q_id") != F.col("c_id")) & (F.col("q_label") == F.col("c_label")),
    ).withColumn("cos", cosine(F.col("q_v"), F.col("c_v")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", "rank")
        .orderBy("q_id", "rank")
        .collect()
    )

    stored = (
        S.ivf_topk_indexed_filtered(
            spark, idx, queries, centroids, match_col="label", k=5, nprobe=None
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.q_id, r.c_id, r.rank) for r in exact] == [
        (r.query_id, r.neighbor_id, r.rank) for r in stored
    ]
    # every neighbor really carries the query's label
    qlabels = {r.vec_id: r.label for r in queries.select("vec_id", "label").collect()}
    assert all(r.label == qlabels[r.query_id] for r in stored)

    pruned = S.ivf_topk_indexed_filtered(
        spark, idx, queries, centroids, match_col="label", k=5, nprobe=1
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    assert "PushedFilters" in plan and "label" in plan.split("PushedFilters", 1)[1][:200]
    got = {(r.query_id, r.neighbor_id) for r in pruned.collect()}
    truth = {(r.q_id, r.c_id) for r in exact}
    assert len(got & truth) / len(truth) >= 0.4


def test_ivf_incremental_filtered_probe(spark, emb, tmp_path):
    """s28: the metadata-filtered probe over the INCREMENTAL store with
    a delete in the loop — exhaustive probe equals the filtered brute
    force over the live set; a compaction of a meta-bearing store
    preserves the stored label (a meta-blind fold would drop it); the
    pruned probe's scan carries the cell partition filter AND the label
    pushed filter."""
    import os

    from censo_escolar_spark.streaming.ivfindex import (
        apply_ivf_delete_batch,
        apply_ivf_index_batch,
        ivf_topk_incremental_filtered,
        read_ivf_index_state,
    )

    state = str(tmp_path / "ivf_meta_state")
    centroids = S.train_centroids(
        emb.filter(F.col("vec_id") % 3 == 0), n_centroids=4, iters=1
    )
    ins = dict(
        state_dir=state, centroids=centroids, meta_cols=("label",),
        compact_every=2,
    )
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 0), 1, **ins)
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 1), 2, **ins)
    apply_ivf_delete_batch(
        emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
        3,
        state_dir=state,
        meta_schema="label int",
        compact_every=2,
    )
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 2), 4, **ins)

    # the batch-4 fold (upto=3) rewrote the store: labels must survive
    batch_dirs = sorted(
        d for d in os.listdir(os.path.join(state, "index"))
        if d.startswith("batch=")
    )
    assert batch_dirs == ["batch=3", "batch=4"]
    folded = read_ivf_index_state(spark, state, meta_schema="label int")
    assert folded.filter(F.col("label").isNull()).count() == 0
    live_truth = {
        r.vec_id: r.label
        for r in emb.filter(
            ~((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 3 != 2))
        ).collect()
    }
    assert {r.id: r.label for r in folded.collect()} == live_truth

    # exhaustive filtered probe == filtered brute force over the live set
    queries = emb.filter(F.col("vec_id") < 8)
    from pyspark.sql import Window

    from censo_escolar_spark.functions.vectors import cosine

    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        S.as_double_array("embedding").alias("q_v"),
    )
    c = emb.filter(
        ~((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 3 != 2))
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        S.as_double_array("embedding").alias("c_v"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("q_id") != F.col("c_id")) & (F.col("q_label") == F.col("c_label")),
    ).withColumn("cos", cosine(F.col("q_v"), F.col("c_v")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "c_id", "rank")
        .orderBy("q_id", "rank")
        .collect()
    )
    got = (
        ivf_topk_incremental_filtered(
            spark, state, queries, centroids, match_col="label", k=5,
            nprobe=None,
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.q_id, r.c_id, r.rank) for r in exact] == [
        (r.query_id, r.neighbor_id, r.rank) for r in got
    ]
    qlabels = {r.vec_id: r.label for r in queries.select("vec_id", "label").collect()}
    assert all(r.label == qlabels[r.query_id] for r in got)

    # pruned probe: cell partition filter + label pushed filter + recall
    pruned = ivf_topk_incremental_filtered(
        spark, state, queries, centroids, match_col="label", k=5, nprobe=1
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    assert "PushedFilters" in plan and "label" in plan
    gotp = {(r.query_id, r.neighbor_id) for r in pruned.collect()}
    truth = {(r.q_id, r.c_id) for r in exact}
    assert len(gotp & truth) / len(truth) >= 0.4


def test_ivf_snapshot_reads_respect_horizon_and_fold(spark, emb, tmp_path):
    """s29: a `below` horizon resolves the index as of that batch —
    inserts and tombstones committed at-or-after it are invisible — and
    compaction bounds resolvable history: the fold collapses batches
    at-or-below its upto into one partition, so a horizon at the fold
    boundary still resolves (the folded partition IS that snapshot)
    while a horizon strictly below it resolves empty."""
    from censo_escolar_spark.streaming.ivfindex import (
        apply_ivf_delete_batch,
        apply_ivf_index_batch,
        read_ivf_index_state,
    )

    state = str(tmp_path / "ivf_snap_state")
    centroids = S.train_centroids(
        emb.filter(F.col("vec_id") % 3 == 0), n_centroids=4, iters=1
    )
    ins = dict(state_dir=state, centroids=centroids, compact_every=2)
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 0), 1, **ins)
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 1), 2, **ins)
    apply_ivf_delete_batch(
        emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
        3, state_dir=state, compact_every=2,
    )
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 2), 4, **ins)

    ids = lambda df: sorted(r.id for r in df.select("id").collect())
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}

    # horizon 4 = post-fold(upto=3) snapshot: inserts 1-2 minus tombstones
    snap4 = ids(read_ivf_index_state(spark, state, below=4))
    assert snap4 == sorted(
        i for i in all_ids if i % 3 != 2 and i % 5 != 0
    )
    # live view additionally holds batch-4 inserts (re-inserted %5 live)
    live = ids(read_ivf_index_state(spark, state))
    assert live == sorted(
        i for i in all_ids if not (i % 5 == 0 and i % 3 != 2)
    )
    # a horizon strictly below the fold's upto is no longer resolvable
    # (LSM history collapse) — empty, not wrong data
    assert ids(read_ivf_index_state(spark, state, below=2)) == []


def test_ivf_mixed_era_schema_evolution_fold(spark, emb, tmp_path):
    """A store built WITHOUT meta that gains a label mid-stream (the
    s31 evolution): a meta-aware read NULL-fills the pre-era files, the
    meta-aware fold rewrites BOTH eras without dropping the label or
    inventing one for old rows, and the filtered probe never matches a
    NULL-label (pre-era) row."""
    from censo_escolar_spark.streaming.ivfindex import (
        apply_ivf_index_batch,
        ivf_topk_incremental,
        ivf_topk_incremental_filtered,
        read_ivf_index_state,
    )

    cents = S.train_centroids(
        emb.filter(F.col("vec_id") % 3 == 0), iters=1
    )
    state = str(tmp_path / "evostate")
    plain = dict(state_dir=state, centroids=cents, compact_every=2)
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 0), 1, **plain)
    apply_ivf_index_batch(emb.filter(F.col("vec_id") % 3 == 1), 2, **plain)
    evolved = dict(
        state_dir=state, centroids=cents, meta_cols=("label",), compact_every=2
    )
    third = emb.filter(F.col("vec_id") % 3 == 2)
    apply_ivf_index_batch(third.filter(F.col("vec_id") % 2 == 0), 3, **evolved)
    # batch 4 triggers the meta-aware fold at upto=3 ACROSS the era
    # boundary: pre-era rows must come out with a NULL label
    apply_ivf_index_batch(third.filter(F.col("vec_id") % 2 == 1), 4, **evolved)

    rows = read_ivf_index_state(
        spark, state, meta_schema="label int"
    ).collect()
    n_all = emb.count()
    assert len(rows) == n_all  # evolution lost no pre-era vectors
    by_era = {True: [], False: []}
    for r in rows:
        by_era[r["id"] % 3 == 2].append(r["label"])
    assert all(lb is None for lb in by_era[False])  # pre-era: NULL-filled
    assert all(lb is not None for lb in by_era[True])  # labeled era intact

    # label cross-check against the source table for the evolved era
    src = {
        r["vec_id"]: r["label"]
        for r in emb.filter(F.col("vec_id") % 3 == 2).collect()
    }
    got = {
        r["id"]: r["label"]
        for r in rows
        if r["id"] % 3 == 2
    }
    assert got == src

    # the meta-blind exhaustive probe sees BOTH eras
    queries = emb.filter(F.col("vec_id") < 8)
    blind = ivf_topk_incremental(spark, state, queries, cents, k=5, nprobe=None)
    exact = S.cosine_topk(emb, queries, k=5)
    assert [tuple(r) for r in blind.orderBy("query_id", "rank").collect()] == [
        tuple(r) for r in exact.orderBy("query_id", "rank").collect()
    ]

    # the filtered probe matches only labeled-era rows (NULL never joins)
    filt = ivf_topk_incremental_filtered(
        spark, state, queries, cents, match_col="label", k=5, nprobe=None
    )
    neigh = [r["neighbor_id"] for r in filt.collect()]
    assert neigh and all(n % 3 == 2 for n in neigh)
