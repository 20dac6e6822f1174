"""Cross-engine parity on MULTIBYTE text.

The driver corpus is ASCII; these fixtures run the text-analysis
oracle pairs over CJK, emoji, combining marks, RTL, and mixed-width
content to pin that Spark (Java regex / UTF-8 semantics) and DuckDB
(RE2 / UTF-8) agree where the engine claims parity: char-based length,
whitespace tokenization, md5 over UTF-8 bytes, regex counts, and
content-hash splits.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from censo_escolar_spark.testing import assert_matches_oracle

_DOCS = [
    (1, "学习 大规模 数据 处理 需要 分布式 系统 学习 大规模 数据", "zh"),
    (2, "café naïve résumé façade über straße größer élève école été", "fr"),
    (3, "emoji \U0001f600 mixed \U0001f680 tokens \U0001f916 here \U0001f4da again \U0001f600 emoji", "en"),
    (4, "שלום עולם זה טקסט בעברית שלום עולם זה טקסט עוד", "he"),
    (5, "combining á é í ó ú marks á é repeated tokens", "en"),
    (6, "Köln ümläut ßharp mixed ascii and latin1 extras worte hier mehr", "de"),
    (7, "the quick brown fox jumps over the lazy dog again quickly", "en"),
]

#: text-surface oracle pairs that read ONLY the documents table.
_TEXT_QUERIES = [
    "t01_text_stats",
    "t02_lang_profile",
    "t03_fingerprints",
    "t04_language_id",
    "t05_bpe_token_count",
    "t06_quality_sample",
    "t07_chunk_documents",
    "t09_pii_redaction",
    "t10_repetition_stats",
    "t12_top_ngrams",
    "t15_dataset_split",
    "t18_readability",
    "t20_top_half_quality",
    "d01_dedup_exact",
    "d02_jaccard_pairs",
    "t26_gopher_rules",
    "t27_weighted_sample",
    "t28_ccnet_buckets",
    "t29_bigram_lm",
    "t19_bpe_vocab",  # char split parity: Spark split("") vs string_split(w,'')
    "t30_vocab_stats",
    "t33_mixture_reweighting",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(spark, tmp_path_factory):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("unicode_sf")
    pdf = pd.DataFrame(
        [
            {"doc_id": i, "text": t, "lang": lang, "source": "web", "n_chars": len(t)}
            for i, t, lang in _DOCS
        ]
    )
    # single FILE (not a Spark part-directory): DuckDB's read_parquet views
    # in testing.duckdb_connection expect one file per table
    pq.write_table(pa.Table.from_pandas(pdf), str(out / "documents.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _TEXT_QUERIES)
def test_unicode_matches_oracle(spark, unicode_sf_dir, name):
    oracle = entrymod.oracle_sql()[name]
    df = entrymod.queries()[name](spark, unicode_sf_dir)
    assert_matches_oracle(df, oracle, unicode_sf_dir)
