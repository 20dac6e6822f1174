"""Byte-pair-encoding vocabulary training and segmentation.

The reference pipeline has no tokenizer training; this is north-star
surface for an LLM-data pipeline (SURVEY §2i: token counting's training
counterpart — the `t05` BPE-ish counter consumes a FIXED vocab, this
builds one from the corpus).

Design (Spark-first, Lloyd's-style driver loop like
``similarity.train_centroids``):

- The unit of work is the DISTINCT word with its corpus frequency —
  classic BPE: pair statistics are identical whether computed over raw
  text or over the (word, weight) vocabulary, and the vocabulary is
  orders of magnitude smaller than the corpus at scale.
- Each round: adjacent symbol pairs are counted with a codegen
  ``arrays_zip(slice, slice)`` fan-out + weighted groupBy (partial
  aggregation before the shuffle), the single best pair comes back via
  ``orderBy().limit(1)`` (TakeOrderedAndProject — a 1-row driver
  collect, exactly like k-means centroid pulls), and the vocabulary is
  rewritten with one greedy left-fold (``F.aggregate``) — merged
  symbols can chain within the same pass (``aaaa`` + (a,a) → ``aa aa``)
  but a merged symbol never re-merges with the next raw symbol, the
  standard greedy application order.
- The vocabulary frame is ``localCheckpoint``'d each round so lineage stays
  O(1) deep instead of O(rounds) — same rationale as
  ``dedup.connected_components``.

Scale: rounds are O(n_merges) Spark jobs over the distinct-word
vocabulary (≪ corpus); nothing driver-side ever exceeds one row per
round. Not SQL-expressible (inherently iterative), so the registry entry
is rows-only; correctness is pinned against a pure-Python BPE reference
in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _adjacent_pairs(syms: Column) -> Column:
    """All adjacent (a, b) symbol pairs of one symbol array — two aligned
    slices zipped, all codegen (same idiom as text.repetition_stats)."""
    n = F.size(syms)
    return F.arrays_zip(
        F.slice(syms, F.lit(1), n - 1).alias("a"),
        F.slice(syms, F.lit(2), n - 1).alias("b"),
    )


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge (a, b) → ab."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, weight, syms) vocabulary: distinct whitespace words with
    corpus frequencies and their initial character symbol arrays."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
        .withColumn("syms", F.filter(F.split(F.col("word"), ""), lambda s: s != ""))
    )


def train_bpe_merges(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 16,
    min_freq: int = 2,
) -> list[tuple[str, str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(left, right, merged,
    freq), ...] in merge order. Ties break lexicographically on (left,
    right) — fully deterministic. Stops early when the best pair's
    weighted frequency drops below ``min_freq``."""
    vocab = word_vocab(df, text_col).select("weight", "syms").localCheckpoint(eager=True)
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        top = (
            vocab.select(
                "weight", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("weight").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_freq:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["freq"])
        merges.append((a, b, a + b, freq))
        vocab = vocab.withColumn(
            "syms", _merge_fold(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, str, int]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment documents with a trained merge list: per word, chars are
    re-merged by applying every merge in training order (the standard
    application rule). Output: (id, n_words, n_tokens, compression) —
    token count under the vocab and chars-per-token compression.

    One fold per merge over each word's symbols — n_merges chained
    codegen expressions, no Python, no shuffle (per-row map only)."""
    words = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    syms = F.filter(F.split(F.col("word"), ""), lambda s: s != "")
    for a, b, _m, _f in merges:
        syms = _merge_fold(syms, a, b)
    return (
        words.select(F.col(id_col), "n_chars", F.size(syms).alias("n_toks"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            (
                F.max("n_chars").cast("double")
                / F.sum("n_toks").cast("double")
            ).alias("chars_per_token"),
        )
    )


def merges_df(spark: SparkSession, merges: list[tuple[str, str, str, int]]) -> DataFrame:
    """Merge list as a DataFrame (rank, left, right, merged, freq)."""
    rows = [(i + 1, a, b, m, f) for i, (a, b, m, f) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, freq bigint"
    )
