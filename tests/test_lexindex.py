"""Incrementally-maintained BM25 index (streaming/lexindex.py):
incremental == one-shot, bucket-pruned probes, retry idempotence, and
fold invariance (the t40 contract at unit scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from censo_escolar_spark.operators import retrieval
from censo_escolar_spark.streaming.lexindex import (
    apply_lex_index_batch,
    bm25_topk_indexed,
    compact_lex_store,
    lex_index_stats,
    _LAYOUT,
)

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple cherry cherry durian"),
    (3, "durian durian durian"),
    (4, "banana durian apple cherry"),
    (5, "elderberry fig grape"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _ingest(spark, state, *, compact_every=None):
    docs = _docs(spark)
    for bid, m in ((1, 0), (2, 1), (3, 2)):
        apply_lex_index_batch(
            docs.filter(F.col("doc_id") % 3 == m),
            bid,
            state_dir=state,
            compact_every=compact_every,
        )
    return docs


def _probe(spark, state, docs, qids=(0,)):
    termstats, _ = lex_index_stats(spark, state)
    qtf, _, _ = retrieval.corpus_stats(
        docs.filter(F.col("doc_id").isin(list(qids))), "doc_id", "text"
    )
    qterms = retrieval.rarest_query_terms(qtf, termstats, qids, n_terms=8)
    return bm25_topk_indexed(spark, state, qterms, k=5)


def test_incremental_equals_one_shot(spark, tmp_path):
    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)
    tf, dl, dfreq = retrieval.corpus_stats(docs, "doc_id", "text")
    qterms = retrieval.rarest_query_terms(tf, dfreq, [0], n_terms=8)
    one_shot = retrieval.bm25_topk(docs, qterms, k=5, stats=(tf, dl, dfreq))
    got = _probe(spark, state, docs)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["doc_id"], r["score_scaled"]) for r in got.collect()],
        key=lambda t: t[:2],
    ) == sorted(
        [
            (r["query_id"], r["rank"], r["doc_id"], r["score_scaled"])
            for r in one_shot.collect()
        ],
        key=lambda t: t[:2],
    )


def test_probe_scan_is_bucket_pruned(spark, tmp_path):
    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)
    plan = (
        _probe(spark, state, docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "BatchEvalPython" not in plan


def test_fold_preserves_probe_results(spark, tmp_path):
    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)
    before = _probe(spark, state, docs).collect()
    compact_lex_store(spark, state, upto=3)
    after = _probe(spark, state, docs).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, before), key=lambda t: t[:2]) == sorted(
        map(tuple, after), key=lambda t: t[:2]
    )
    # folded store answers from ONE batch partition per component
    import os

    for comp in _LAYOUT:
        dirs = [
            d
            for d in os.listdir(os.path.join(state, comp))
            if d.startswith("batch=")
        ]
        assert dirs == ["batch=3"], (comp, dirs)


def test_ingest_retry_idempotent(spark, tmp_path):
    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)
    first = _probe(spark, state, docs).collect()
    # re-run batch 3 (same id): fully overwrites its own partitions
    apply_lex_index_batch(
        docs.filter(F.col("doc_id") % 3 == 2), 3, state_dir=state
    )
    again = _probe(spark, state, docs).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))


def test_empty_index_probe_is_schema_stable(spark, tmp_path):
    state = str(tmp_path / "lex_empty")
    apply_lex_index_batch(_docs(spark, []), 1, state_dir=state)
    qterms = spark.createDataFrame(
        [(0, "apple", 1)], "qid bigint, term string, df bigint"
    )
    out = bm25_topk_indexed(spark, state, qterms, k=5)
    assert out.count() == 0
    assert dict(out.dtypes)["score_scaled"] == "bigint"


def test_deletes_leave_live_view_and_reingest_is_live(spark, tmp_path):
    from censo_escolar_spark.streaming.lexindex import apply_lex_delete_batch

    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)  # batches 1..3
    before = {r["doc_id"] for r in _probe(spark, state, docs).collect()}
    assert before  # doc 0's rarest terms hit other docs
    # forget doc 2 (appears in results for query doc 0 via "apple")
    apply_lex_delete_batch(
        spark.createDataFrame([(2,)], "doc_id bigint"), 4, state_dir=state
    )
    after = {r["doc_id"] for r in _probe(spark, state, docs).collect()}
    assert 2 not in after
    # re-ingest the same doc AFTER the tombstone: new live row
    apply_lex_index_batch(
        docs.filter(F.col("doc_id") == 2), 5, state_dir=state
    )
    again = {r["doc_id"] for r in _probe(spark, state, docs).collect()}
    assert 2 in again


def test_delete_updates_df_and_totals(spark, tmp_path):
    """Scoring after a delete uses LIVE df / N / avgdl, equal to the
    one-shot BM25 over the surviving docs."""
    from censo_escolar_spark.streaming.lexindex import (
        apply_lex_delete_batch,
        live_term_df,
    )

    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)
    apply_lex_delete_batch(
        spark.createDataFrame([(2,), (3,)], "doc_id bigint"), 4, state_dir=state
    )
    live_docs = docs.filter(~F.col("doc_id").isin([2, 3]))
    tf, dl, dfreq = retrieval.corpus_stats(live_docs, "doc_id", "text")
    qterms_ref = retrieval.rarest_query_terms(tf, dfreq, [0], n_terms=8)
    one_shot = retrieval.bm25_topk(live_docs, qterms_ref, k=5, stats=(tf, dl, dfreq))

    qtf, _, _ = retrieval.corpus_stats(
        docs.filter(F.col("doc_id") == 0), "doc_id", "text"
    )
    cand = [r["term"] for r in qtf.select("term").distinct().collect()]
    ldf = live_term_df(spark, state, cand)
    qterms = retrieval.rarest_query_terms(qtf, ldf, [0], n_terms=8)
    got = bm25_topk_indexed(spark, state, qterms, k=5)
    assert sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score_scaled"])
        for r in got.collect()
    ) == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score_scaled"])
        for r in one_shot.collect()
    )


def test_delete_fold_physically_reclaims(spark, tmp_path):
    import os

    from censo_escolar_spark.streaming.lexindex import (
        apply_lex_delete_batch,
    )

    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)
    apply_lex_delete_batch(
        spark.createDataFrame([(0,)], "doc_id bigint"), 4, state_dir=state
    )
    compact_lex_store(spark, state, upto=4)
    raw = spark.read.parquet(os.path.join(state, "postings"))
    assert 0 not in {r["doc_id"] for r in raw.collect()}
    raw_dl = spark.read.parquet(os.path.join(state, "doclens"))
    assert 0 not in {r["doc_id"] for r in raw_dl.collect()}
    assert spark.read.parquet(os.path.join(state, "deletes")).count() == 0
    # rebuilt termstats match live postings exactly
    ts = spark.read.parquet(os.path.join(state, "termstats"))
    live_df = raw.groupBy("term").count()
    got = {(r["term"], r["df"]) for r in ts.collect()}
    want = {(r["term"], r["count"]) for r in live_df.collect()}
    assert got == want


def test_delete_retry_idempotent(spark, tmp_path):
    from censo_escolar_spark.streaming.lexindex import apply_lex_delete_batch

    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)
    dels = spark.createDataFrame([(1,)], "doc_id bigint")
    apply_lex_delete_batch(dels, 4, state_dir=state)
    first = sorted(map(tuple, _probe(spark, state, docs).collect()))
    apply_lex_delete_batch(dels, 4, state_dir=state)
    assert sorted(map(tuple, _probe(spark, state, docs).collect())) == first


def test_lex_compaction_crash_after_marker_recovers(spark, tmp_path):
    """A crash after the lexical store's compaction commit marker
    (phase 2 unrun) is finished by the next probe/maintenance call —
    the same two-phase discipline as the dedup store, exercised
    through this store's 5-component delete-aware layout."""
    import os

    from censo_escolar_spark.streaming.lexindex import (
        _DEL_LAYOUT,
        _fold_lex_deletes,
        _read_component,
        _component,
        apply_lex_delete_batch,
    )

    from censo_escolar_spark.streaming.lexindex import live_term_df

    state = str(tmp_path / "lex")
    docs = _ingest(spark, state)  # batches 1..3
    apply_lex_delete_batch(
        spark.createDataFrame([(1,)], "doc_id bigint"), 4, state_dir=state
    )

    def live_probe():
        # the delete-aware probe (t41's contract): stored termstats
        # deliberately over-count between a delete and the next fold,
        # so df must come from the live pruned postings
        qtf, _, _ = retrieval.corpus_stats(
            docs.filter(F.col("doc_id") == 0), "doc_id", "text"
        )
        cand = [r["term"] for r in qtf.select("term").distinct().collect()]
        qterms = retrieval.rarest_query_terms(
            qtf, live_term_df(spark, state, cand), [0], n_terms=8
        )
        return bm25_topk_indexed(spark, state, qterms, k=5)

    before = sorted(map(tuple, live_probe().collect()))
    # phase 1 by hand (exactly what compact_lex_store does), then
    # "crash" before phase 2: folded temps + marker, old dirs intact
    frames = {
        comp: _read_component(
            spark, _component(state, comp), schema, 5, keep_batch=True
        )
        for comp, (schema, _) in _DEL_LAYOUT.items()
    }
    folded = _fold_lex_deletes(frames)
    for comp, (schema, parts) in _DEL_LAYOUT.items():
        w = folded[comp].write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(os.path.join(state, comp, "_compact_tmp_4"))
    open(os.path.join(state, "_compact_commit_4"), "w").close()
    # next probe recovers phase 2: identical results, marker gone,
    # one batch dir per component, tombstoned doc reclaimed
    after = sorted(map(tuple, live_probe().collect()))
    assert after == before
    assert not os.path.exists(os.path.join(state, "_compact_commit_4"))
    for comp in _DEL_LAYOUT:
        dirs = [
            d
            for d in os.listdir(os.path.join(state, comp))
            if d.startswith("batch=")
        ]
        assert dirs == ["batch=4"], (comp, dirs)
    raw = spark.read.parquet(os.path.join(state, "postings"))
    assert 1 not in {r["doc_id"] for r in raw.collect()}


def test_snapshot_probe_below_horizon(spark, tmp_path):
    """A `below` horizon resolves BM25 retrieval as of that batch — the
    s29 time-travel contract on the lexical store: stats (df, N, avgdl)
    and postings all come from the snapshot, so the probe equals the
    one-shot BM25 over exactly the documents committed before the
    horizon. Compaction bounds resolvable history: with the fold at
    upto=2 a below=3 read resolves via the folded partition."""
    from censo_escolar_spark.streaming.lexindex import live_term_df

    state = str(tmp_path / "lex_snap")
    docs = _docs(spark)
    # batches 1-3 with a fold at batch 3 (upto=2): history 1-2 collapses
    for bid, m in ((1, 0), (2, 1), (3, 2)):
        apply_lex_index_batch(
            docs.filter(F.col("doc_id") % 3 == m),
            bid,
            state_dir=state,
            compact_every=3 if bid == 3 else None,
        )
    snap_docs = docs.filter(F.col("doc_id") % 3 != 2)  # as of below=3

    qtf, _, _ = retrieval.corpus_stats(
        docs.filter(F.col("doc_id") == 0), "doc_id", "text"
    )
    cand = [r["term"] for r in qtf.select("term").distinct().collect()]
    snap_df = live_term_df(spark, state, cand, below=3)
    qterms = retrieval.rarest_query_terms(qtf, snap_df, [0], n_terms=8)

    tf, dl, dfreq = retrieval.corpus_stats(snap_docs, "doc_id", "text")
    one_shot = retrieval.bm25_topk(
        snap_docs, qterms, k=5, stats=(tf, dl, dfreq)
    )
    got = bm25_topk_indexed(spark, state, qterms, k=5, below=3)
    tup = lambda df: sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score_scaled"])
        for r in df.collect()
    )
    assert tup(got) == tup(one_shot)
    # live probe sees the batch-3 docs too (differs from the snapshot)
    termstats, _ = lex_index_stats(spark, state)
    qterms_live = retrieval.rarest_query_terms(qtf, termstats, [0], n_terms=8)
    live = bm25_topk_indexed(spark, state, qterms_live, k=5)
    live_ids = {r["doc_id"] for r in live.collect()}
    assert any(i % 3 == 2 for i in live_ids) or tup(live) != tup(got)
