"""Streaming corpus-stats maintenance (streaming/stats.py): document
batches fold into per-(lang, source) additive aggregates; any batch
split reproduces the one-shot aggregate; retries converge; write
amplification is O(touched buckets)."""

from __future__ import annotations

import os

from censo_escolar_spark.streaming.stats import (
    STATS_SCHEMA,
    apply_stats_batch,
    maintain_corpus_stats,
    read_stats_state,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string"

#: 12+ tokens, no digits, avg token len >= 2 -> passes quality_keep
GOOD = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu"
#: under 10 tokens -> fails quality_keep
SHORT = "too short to keep"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _snapshot(spark, state_dir):
    return {
        (r.lang, r.source): (r.n_docs, r.n_tokens, r.n_chars, r.n_kept)
        for r in read_stats_state(spark, state_dir).collect()
    }


def test_stats_batches_accumulate(spark, tmp_path):
    state = str(tmp_path / "state")
    b1 = _docs(spark, [(1, GOOD, "en", "web"), (2, SHORT, "en", "web")])
    apply_stats_batch(b1, 1, state_dir=state)
    assert _snapshot(spark, state) == {
        ("en", "web"): (2, 16, len(GOOD) + len(SHORT), 1)
    }
    # a second batch touching the same group ADDS; a new group appears
    b2 = _docs(spark, [(3, GOOD, "en", "web"), (4, GOOD, "pt", "books")])
    apply_stats_batch(b2, 2, state_dir=state)
    assert _snapshot(spark, state) == {
        ("en", "web"): (3, 28, 2 * len(GOOD) + len(SHORT), 2),
        ("pt", "books"): (1, 12, len(GOOD), 1),
    }


def test_stats_split_invariance(spark, tmp_path):
    """Any micro-batch slicing reproduces the one-shot aggregate — the
    e36 parity claim at unit scale."""
    rows = [
        (i, GOOD if i % 2 else SHORT, "en" if i % 3 else "pt", "web")
        for i in range(12)
    ]
    one = str(tmp_path / "one")
    apply_stats_batch(_docs(spark, rows), 1, state_dir=one)
    many = str(tmp_path / "many")
    for bid in (1, 2, 3):
        apply_stats_batch(
            _docs(spark, [r for r in rows if r[0] % 3 == bid - 1]),
            bid,
            state_dir=many,
        )
    assert _snapshot(spark, one) == _snapshot(spark, many)


def test_stats_batch_retry_is_idempotent(spark, tmp_path):
    """Addition is not idempotent — the versioned read discipline is what
    makes a replayed batch converge (it re-reads strictly below its own
    id, never its own half-written output)."""
    state = str(tmp_path / "state")
    apply_stats_batch(
        _docs(spark, [(1, GOOD, "en", "web")]), 1, state_dir=state
    )
    b2 = _docs(spark, [(2, GOOD, "en", "web")])
    apply_stats_batch(b2, 2, state_dir=state)
    first = _snapshot(spark, state)
    apply_stats_batch(b2, 2, state_dir=state)  # replay
    assert _snapshot(spark, state) == first == {("en", "web"): (2, 24, 2 * len(GOOD), 2)}


def test_stats_rewrites_only_touched_buckets(spark, tmp_path):
    """A batch touching one group writes only that group's bucket; prior
    versions' files stay byte-identical (immutable)."""
    from censo_escolar_spark.streaming.bucketstate import N_BUCKETS, bucket_of

    state = str(tmp_path / "state")
    seed = _docs(
        spark,
        [(i, GOOD, f"l{i}", f"s{i}") for i in range(16)],
    )
    apply_stats_batch(seed, 0, state_dir=state)
    v0 = os.path.join(state, "version=0")
    assert sum(d.startswith("bucket=") for d in os.listdir(v0)) > 1
    before = {}
    for root, _, files in os.walk(v0):
        for f in files:
            p = os.path.join(root, f)
            before[p] = open(p, "rb").read()

    one = _docs(spark, [(99, SHORT, "l7", "s7")])
    [b7] = (
        spark.createDataFrame([("l7|s7",)], "grp string")
        .select(bucket_of("grp", n_buckets=N_BUCKETS).alias("b"))
        .collect()
    )
    apply_stats_batch(one, 1, state_dir=state)
    v1 = os.path.join(state, "version=1")
    touched = [d for d in os.listdir(v1) if d.startswith("bucket=")]
    assert touched == [f"bucket={b7.b}"]
    for p, blob in before.items():
        assert open(p, "rb").read() == blob


def test_maintain_corpus_stats_end_to_end(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [(1, GOOD, "en", "web"), (2, SHORT, "en", "web"), (3, GOOD, "pt", "web")]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    docs = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    maintain_corpus_stats(docs, state_dir=state, checkpoint=ckpt)
    assert _snapshot(spark, state) == {
        ("en", "web"): (2, 16, len(GOOD) + len(SHORT), 1),
        ("pt", "web"): (1, 12, len(GOOD), 1),
    }
    assert any(d.startswith("version=") for d in os.listdir(state))


# ---------------------------------------------------------------------------
# Learned-quality score maintenance (apply_quality_batch / t43)
# ---------------------------------------------------------------------------


def _qsnapshot(spark, state_dir):
    from censo_escolar_spark.streaming.stats import read_quality_state

    return {
        (r.lang, r.grade): (r.n_docs, r.score_q)
        for r in read_quality_state(spark, state_dir).collect()
    }


def _one_shot_quality(spark, rows):
    from pyspark.sql import functions as F

    from censo_escolar_spark.functions.text import learned_quality

    q = learned_quality("text")
    return {
        (r.lang, r.grade): (r.n_docs, r.score_q)
        for r in spark.createDataFrame(rows, DOC_SCHEMA)
        .select(
            "lang",
            q["grade"].alias("grade"),
            F.round(q["score"] * F.lit(1e9)).cast("bigint").alias("sq"),
        )
        .groupBy("lang", "grade")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("sq").cast("bigint").alias("score_q"),
        )
        .collect()
    }


def test_quality_stats_split_invariance_and_retry(spark, tmp_path):
    """Any batch split reproduces the one-shot aggregate exactly (the
    additive BIGINT-quantization contract), and a retried batch
    converges instead of double-adding."""
    from censo_escolar_spark.streaming.stats import apply_quality_batch

    rows = [
        (1, GOOD, "en", "web"),
        (2, SHORT, "en", "web"),
        (3, GOOD + " 123 456", "de", "web"),
        (4, "uno dos tres quatro cinco seis siete ocho nueve diez once", "es", "web"),
    ]
    state = str(tmp_path / "state")
    apply_quality_batch(_docs(spark, rows[:2]), 1, state_dir=state)
    apply_quality_batch(_docs(spark, rows[2:]), 2, state_dir=state)
    # retry of batch 2 (same id) fully overwrites its own version
    apply_quality_batch(_docs(spark, rows[2:]), 2, state_dir=state)
    assert _qsnapshot(spark, state) == _one_shot_quality(spark, rows)


def test_learned_quality_grade_is_deterministic(spark):
    """Same text -> bit-identical score/grade across evaluations, and
    the grade stays in the contract range 0..4."""
    from censo_escolar_spark.functions.text import learned_quality

    rows = [
        (1, GOOD, "en", "web"),
        (2, "1 2 3 4 5 6 7 8 9 10 11 12", "en", "web"),  # digit-heavy
        (3, "word " * 50 + "word", "en", "web"),          # repetitive
    ]
    q = learned_quality("text")
    df = _docs(spark, rows).select("doc_id", q["score"].alias("s"), q["grade"].alias("g"))
    a = {r.doc_id: (r.s, r.g) for r in df.collect()}
    b = {r.doc_id: (r.s, r.g) for r in df.collect()}
    assert a == b
    assert all(0 <= g <= 4 for _, g in a.values())
