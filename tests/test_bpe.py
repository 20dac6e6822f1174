"""BPE training/segmentation pinned against a pure-Python reference."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.operators import bpe
from censo_escolar_spark.sources.readers import load_table


# --- pure-Python reference (Sennrich et al. 2016 algorithm) ---------------


def _ref_vocab(texts):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[w] += 1
    return {tuple(w): c for w, c in vocab.items()}


def _ref_pairs(vocab):
    pairs = Counter()
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    return pairs


def _ref_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts, n_merges, min_freq=2):
    vocab = _ref_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pairs = _ref_pairs(vocab)
        if not pairs:
            break
        # max freq, ties to lexicographically smallest (a, b)
        (a, b), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_freq:
            break
        merges.append((a, b, a + b, freq))
        vocab = {_ref_apply(s, a, b): c for s, c in vocab.items()}
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "aaaa aaaa baa",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")


def test_train_matches_reference(corpus):
    got = bpe.train_bpe_merges(corpus, n_merges=10)
    want = _ref_train(TEXTS, 10)
    assert got == want
    assert len(got) == 10  # corpus is rich enough that nothing stops early


def test_greedy_fold_chains_within_pass(spark):
    # aaaa + (a,a) must become [aa, aa], never [aa, a, a] or [aaa, a]
    df = spark.createDataFrame([("aaaa",)], "text string")
    merges = bpe.train_bpe_merges(df, n_merges=1, min_freq=1)
    assert merges[0][:3] == ("a", "a", "aa")
    seg = bpe.bpe_segment(df.withColumn("doc_id", F.lit(0)), merges).collect()[0]
    assert seg.n_tokens == 2


def test_segment_compresses_and_matches_reference(corpus):
    merges = bpe.train_bpe_merges(corpus, n_merges=8)
    seg = {r.doc_id: r for r in bpe.bpe_segment(corpus, merges).collect()}
    # reference segmentation: apply merges in order per word
    for i, t in enumerate(TEXTS):
        toks = 0
        for w in t.split():
            syms = tuple(w)
            for a, b, _m, _f in merges:
                syms = _ref_apply(syms, a, b)
            toks += len(syms)
        assert seg[i].n_tokens == toks
        assert seg[i].n_words == len(t.split())
        # merging can only shrink the token stream below raw chars
        assert seg[i].n_tokens < sum(len(w) for w in t.split())


def test_min_freq_stops_training(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")  # every pair unique
    assert bpe.train_bpe_merges(df, n_merges=5, min_freq=2) == []


def test_on_documents_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe.train_bpe_merges(docs, n_merges=4)
    assert len(merges) == 4
    # frequencies are non-increasing in merge order *per round maximum*
    # only within a round; across rounds they can interleave — just check
    # they're all above the floor and the merged symbol grows
    assert all(f >= 2 for _a, _b, _m, f in merges)
    assert all(m == a + b for a, b, m, _f in merges)


# --- property: Spark BPE == reference BPE on arbitrary small corpora -------

from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcxy", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=5))
def test_property_matches_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe.train_bpe_merges(df, n_merges=4, min_freq=2) == _ref_train(
        texts, 4, min_freq=2
    )
