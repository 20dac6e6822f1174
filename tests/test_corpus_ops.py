"""Unit tests for round-2 corpus operators: embedding dedup clusters,
cross-corpus contamination, n-gram frequencies, web-curation functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.functions import text as T
from censo_escolar_spark.operators.dedup import (
    cross_corpus_overlap,
    ngram_doc_freq,
    shingle_strings,
)
from censo_escolar_spark.operators.similarity import cosine_dedup_clusters


def _vec_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_cosine_dedup_clusters_exact_and_lsh_agree(spark):
    # 0,1 identical; 2 = scaled copy of 0 (cos == 1); 3 orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = _vec_df(spark, rows)
    for method in ("exact", "lsh"):
        got = {
            r.vec_id: (r.cluster_id, r.keep)
            for r in cosine_dedup_clusters(
                df, vec_col="embedding", threshold=0.99, method=method
            ).collect()
        }
        assert got == {
            0: (0, True),
            1: (0, False),
            2: (0, False),
            3: (3, True),
        }, method


def test_cosine_dedup_clusters_bad_method(spark):
    df = _vec_df(spark, [(0, [1.0, 0.0, 0.0, 0.0])])
    with pytest.raises(ValueError, match="unknown method"):
        cosine_dedup_clusters(df, method="nope").collect()


def test_cross_corpus_overlap_counts_distinct_ngrams(spark):
    # eval doc 0 shares exactly the 3-gram windows of the copied span
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon unrelated tail words here"),
            (2, "totally different content with no shared span at all"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(0, "prefix words alpha beta gamma delta epsilon suffix")],
        "doc_id long, text string",
    )
    got = cross_corpus_overlap(ev, train, "doc_id", "text", n=3).collect()
    assert len(got) == 1
    r = got[0]
    # shared 3-grams: windows within "alpha beta gamma delta epsilon" -> 3
    assert (r.left_id, r.right_id, r.n_shared) == (0, 1, 3)


def test_cross_corpus_overlap_min_shared_and_hot_cut(spark):
    train = spark.createDataFrame(
        [(i, "common boiler plate line here") for i in range(1, 6)]
        + [(9, "unique span only in train nine plus common boiler plate line here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(0, "eval has common boiler plate line here and unique span only in")],
        "doc_id long, text string",
    )
    # without the cut: overlaps with all 6 train docs
    assert cross_corpus_overlap(ev, train, "doc_id", "text", n=3).count() == 6
    # the hot cut (df > 2 on train side) removes the boilerplate n-grams;
    # only doc 9's unique span survives
    got = cross_corpus_overlap(
        ev, train, "doc_id", "text", n=3, max_doc_freq=2
    ).collect()
    assert [(r.left_id, r.right_id) for r in got] == [(0, 9)]
    # min_shared filters low-overlap pairs
    assert (
        cross_corpus_overlap(ev, train, "doc_id", "text", n=3, min_shared=100).count()
        == 0
    )


def test_shingle_strings_and_doc_freq(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c"),
            (3, "a b c a b c"),  # repeats count once per doc
            (4, "x y"),  # too short for trigrams
        ],
        "doc_id long, text string",
    )
    sh = {
        (r.doc_id, r.shingle)
        for r in shingle_strings(docs, "doc_id", "text", 3).collect()
    }
    assert sh == {
        (1, "a b c"),
        (1, "b c d"),
        (2, "a b c"),
        (3, "a b c"),
        (3, "b c a"),
        (3, "c a b"),
    }
    freq = {
        r.shingle: r.doc_freq
        for r in ngram_doc_freq(docs, "doc_id", "text", n=3).collect()
    }
    assert freq == {"a b c": 3, "b c d": 1, "b c a": 1, "c a b": 1}
    top = ngram_doc_freq(docs, "doc_id", "text", n=3, top_k=1).collect()
    assert [(r.shingle, r.doc_freq) for r in top] == [("a b c", 3)]


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], "t string").select(expr.alias("v")).first().v


def test_url_count_and_domain(spark):
    s = "see https://a.example.com/x and http://b.org/path_%20ok end"
    assert _one(spark, s, T.url_count("t")) == 2
    assert _one(spark, s, T.first_domain("t")) == "a.example.com"
    assert _one(spark, "no links here", T.url_count("t")) == 0
    assert _one(spark, "no links here", T.first_domain("t")) == ""


def test_strip_boilerplate_blanks_only_matching_lines(spark):
    s = "keep this line\nCopyright 2020 Acme\nalso keep\nwe use COOKIES ok\nlast"
    out = _one(spark, s, T.strip_boilerplate("t"))
    assert out == "keep this line\n\nalso keep\n\nlast"
    assert _one(spark, s, T.nonempty_line_count(T.strip_boilerplate("t"))) == 3


def test_strip_boilerplate_no_match_is_identity(spark):
    s = "clean line one\nclean line two"
    assert _one(spark, s, T.strip_boilerplate("t")) == s
    assert _one(spark, s, T.nonempty_line_count("t")) == 2


def test_corpus_dedup_keep_flags(spark):
    docs = spark.createDataFrame(
        [
            (5, "the quick brown fox jumps over the lazy dog today"),
            (9, "the quick brown fox jumps over the lazy dog today"),
            (2, "totally unrelated text about completely different things here"),
        ],
        "doc_id long, text string",
    )
    from censo_escolar_spark.operators.dedup import corpus_dedup

    got = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in corpus_dedup(docs, "doc_id", "text").collect()
    }
    assert got == {5: (5, True), 9: (5, False), 2: (2, True)}


def test_duplicate_spans_merge_and_positions(spark):
    from censo_escolar_spark.operators.dedup import duplicate_spans

    shared = "one two three four five six seven eight nine ten"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " tail_a unique_a ending_a now_a"),
            (2, "head_b lead_b " + shared + " tail_b different"),
            (3, "no overlap with anything else at all in this document here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in duplicate_spans(docs, "doc_id", "text", min_len=8).collect()
    }
    # doc 1: shared span = tokens 0..9; doc 2: tokens 2..11; doc 3: nothing.
    # windows at pos 0,1,2 (doc 1) merge into one island covering 0..9.
    assert got == {(1, 0, 9, 10), (2, 2, 11, 10)}


def test_duplicate_spans_requires_two_distinct_docs(spark):
    from censo_escolar_spark.operators.dedup import duplicate_spans

    # a doc repeating ITS OWN 8-gram is not a cross-doc duplicate
    rep = "a b c d e f g h " * 2
    docs = spark.createDataFrame(
        [(1, rep.strip()), (2, "totally different words in this one my friend ok")],
        "doc_id long, text string",
    )
    assert duplicate_spans(docs, "doc_id", "text", min_len=8).count() == 0


def test_ivf_bucketed_pairs_subset_of_exact_with_dup_recall(spark):
    from censo_escolar_spark.operators.similarity import (
        cosine_pairs,
        ivf_bucketed_pairs,
        train_centroids,
    )

    rows = [  # cluster A: 0,1,2 (0 and 1 identical); cluster B: 3,4
        (0, [1.0, 0.0, 0.05, 0.0]),
        (1, [1.0, 0.0, 0.05, 0.0]),
        (2, [0.95, 0.05, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.05]),
        (4, [0.05, 0.98, 0.0, 0.0]),
    ]
    df = _vec_df(spark, rows)
    exact = {
        (r.id_a, r.id_b) for r in cosine_pairs(df, threshold=0.9).collect()
    }
    cents = train_centroids(df, n_centroids=2, iters=1)
    ivf = {
        (r.id_a, r.id_b)
        for r in ivf_bucketed_pairs(df, cents, threshold=0.9).collect()
    }
    assert ivf <= exact  # never a false pair (exact verification)
    assert (0, 1) in ivf  # identical vectors always share a cell


def test_quantize_embeddings_roundtrip_bound(spark):
    from censo_escolar_spark.functions import vectors as V

    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25, 0.0]), (1, [0.001, 0.002, -0.003, 0.004])],
        "vec_id long, embedding array<float>",
    ).select("vec_id", V.as_double_array("embedding").alias("v"))
    rows = (
        df.withColumn("scale", V.quantize_scale(F.col("v")))
        .select("vec_id", "scale", F.posexplode("v").alias("i", "x"))
        .select(
            "x", "scale", V.quantize_element(F.col("x"), F.col("scale")).alias("q")
        )
        .collect()
    )
    for r in rows:
        assert -127 <= r.q <= 127
        # dequantized value within half a quantization step
        assert abs(r.q / r.scale - r.x) <= 0.5 / r.scale + 1e-12


def test_operators_handle_degenerate_docs(spark):
    """Empty/short/whitespace docs must flow through (not crash) every
    corpus operator: too-short docs simply produce no grams/spans."""
    from censo_escolar_spark.operators.dedup import (
        duplicate_spans,
        ngram_doc_freq,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, None)],
        "doc_id long, text string",
    )
    assert ngram_doc_freq(docs, "doc_id", "text", n=3).count() == 0
    assert duplicate_spans(docs, "doc_id", "text", min_len=8).count() == 0
    assert cross_corpus_overlap(docs, docs, "doc_id", "text", n=8).count() == 0
    stats = T.repetition_stats("text")
    rows = docs.select(
        "doc_id", stats["dup_token_frac"].alias("dt"), stats["dup_bigram_frac"].alias("db")
    ).collect()
    by_id = {r.doc_id: (r.dt, r.db) for r in rows}
    assert by_id[2] == (0.0, 0.0)  # single token: no dups, no bigrams
    assert by_id[4] == (0.0, 0.0)  # NULL text -> guarded to 0.0


def test_quantize_zero_vector_yields_nulls(spark):
    from censo_escolar_spark.functions import vectors as V

    r = (
        spark.createDataFrame([(0, [0.0, 0.0])], "vec_id long, embedding array<float>")
        .select(V.as_double_array("embedding").alias("v"))
        .select(
            V.quantize_scale(F.col("v")).alias("scale"),
            V.quantize_element(F.element_at("v", 1), V.quantize_scale(F.col("v"))).alias("q"),
        )
        .first()
    )
    assert r.scale is None and r.q is None


def test_cosine_dedup_clusters_empty_corpus(spark):
    df = _vec_df(spark, []).filter("vec_id > 0")
    assert cosine_dedup_clusters(df, threshold=0.9, method="lsh").count() == 0


def test_grouped_zscore_constant_group_and_values(spark):
    from censo_escolar_spark.operators.standardize import grouped_zscore

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 7), (4, "b", 7)],
        "doc_id long, lang string, n_tokens int",
    )
    got = {r.doc_id: r.z for r in grouped_zscore(df, ["lang"], "n_tokens").collect()}
    # group a: mean 15, std 5 -> z = -1, +1; group b constant -> 0.0
    assert got[1] == -1.0 and got[2] == 1.0
    assert got[3] == 0.0 and got[4] == 0.0


def test_dedup_giant_cluster(spark):
    """200 identical docs form ONE cluster with one survivor — the
    worst-case near-dup clique (candidate fan-out + 1-round closure)."""
    from censo_escolar_spark.operators.dedup import corpus_dedup
    import pyspark.sql.functions as F

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the very same document body repeated verbatim many times over").alias(
            "text"
        ),
    )
    out = corpus_dedup(docs, "doc_id", "text", threshold=0.5)
    assert out.filter("keep").count() == 1
    assert out.filter(F.col("cluster_id") == 0).count() == 200


# ---------------------------------------------------------------------------
# incremental_dedup (increment vs published corpus)
# ---------------------------------------------------------------------------
def _inc_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_incremental_dedup_cross_and_within(spark):
    from censo_escolar_spark.operators.dedup import incremental_dedup

    published = _inc_docs(spark, [(2, _BASE)])
    batch = _inc_docs(
        spark,
        [
            (11, _BASE + " extra"),          # near-dup of published 2 -> dropped
            (13, "completely different words forming another document body here"),
            (15, "completely different words forming another document body now"),
            (17, "isolated unique content nothing shares any shingles with this"),
        ],
    )
    out = {r.doc_id: r for r in incremental_dedup(batch, published, "doc_id", "text").collect()}
    assert set(out) == {11, 13, 15, 17}
    assert out[11].dup_of_published and not out[11].keep
    assert out[11].cluster_id == 11  # cluster lives in the published corpus
    # 13/15 near-dup each other: min id wins
    assert not out[13].dup_of_published and out[13].keep and out[13].cluster_id == 13
    assert not out[15].dup_of_published and not out[15].keep and out[15].cluster_id == 13
    assert out[17].keep


def test_incremental_dedup_drop_before_cluster_order(spark):
    from censo_escolar_spark.operators.dedup import incremental_dedup

    # B' (15) is a near-dup of published P AND of batch-mate B (13).
    # Drop-then-cluster: 15 leaves via the published side, and 13 —
    # which has no published twin — is kept, NOT dragged out by 15's
    # contamination.
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    published = _inc_docs(spark, [(2, shared)])
    batch = _inc_docs(
        spark,
        [
            (13, shared.replace("alpha beta gamma delta epsilon zeta", "one two three four five six")),
            (15, shared + " tail"),
        ],
    )
    out = {r.doc_id: r for r in incremental_dedup(batch, published, "doc_id", "text").collect()}
    assert out[15].dup_of_published and not out[15].keep
    assert not out[13].dup_of_published and out[13].keep


def test_incremental_dedup_empty_published(spark):
    from censo_escolar_spark.operators.dedup import corpus_dedup, incremental_dedup

    batch = _inc_docs(
        spark,
        [(1, _BASE), (3, _BASE + " extra"), (5, "other text entirely unrelated to anything above")],
    )
    empty = _inc_docs(spark, []).filter("doc_id IS NOT NULL")
    inc = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in incremental_dedup(batch, empty, "doc_id", "text").collect()
    }
    # with no published corpus, incremental == plain corpus dedup
    full = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in corpus_dedup(batch, "doc_id", "text").select("doc_id", "cluster_id", "keep").collect()
    }
    assert inc == full


def test_label_conflict_pairs_semantics(spark):
    """Anchor = the member whose id equals its dup-cluster label; one
    pair per disagreeing (dup, distinct) group, min-id representative;
    agreeing groups and singletons mine nothing."""
    from censo_escolar_spark.operators.dedup import label_conflict_pairs

    labels = spark.createDataFrame(
        [
            # dup cluster 1 = {1,2,3}: anchor 1 has other=10; ids 2 (10),
            # 3 (20) -> one conflict pair (1, 3) for the 20-group
            (1, 1, 10),
            (2, 1, 10),
            (3, 1, 20),
            # singleton: nothing to mine
            (4, 4, 30),
            # dup cluster 5 = {5,6} all agreeing: nothing
            (5, 5, 40),
            (6, 5, 40),
            # dup cluster 7 = {7,8,9} with three distinct others:
            # pairs (7,8) and (7,9)
            (7, 7, 50),
            (8, 7, 60),
            (9, 7, 70),
        ],
        "doc_id bigint, dup bigint, other bigint",
    )
    out = label_conflict_pairs(
        labels,
        id_col="doc_id",
        dup_col="dup",
        distinct_col="other",
        pair_type="t",
    ).orderBy("anchor_id", "candidate_id")
    assert [(r.pair_type, r.anchor_id, r.candidate_id) for r in out.collect()] == [
        ("t", 1, 3),
        ("t", 7, 8),
        ("t", 7, 9),
    ]
