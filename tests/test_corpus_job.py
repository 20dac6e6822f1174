"""End-to-end corpus curation job: dedup, gate, partitioned sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.etl.corpus_job import (
    CorpusAuditError,
    CorpusJobConfig,
    run_corpus_job,
)
from censo_escolar_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # plant exact duplicates so the dedup stage has work to do
    dups = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    return base.unionByName(dups)


def test_job_end_to_end(spark, docs, tmp_path):
    out = str(tmp_path / "corpus")
    summary = run_corpus_job(spark, docs, out)
    assert summary["input_rows"] == 520
    # every planted duplicate was deduplicated away (min doc_id wins)
    assert summary["curated_rows"] <= 500
    assert set(summary["split_counts"]) <= {"train", "val", "test"}
    assert all(v == 0 for v in summary["audit"].values())

    back = spark.read.parquet(out)
    assert back.filter(F.col("doc_id") >= 100000).count() == 0
    # partition pruning works on the sink layout
    plan = back.filter(
        (F.col("split") == "train") & (F.col("lang") == "en")
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.filter(F.col("split") == "train").count() > 0


def test_job_is_deterministic(spark, docs, tmp_path):
    s1 = run_corpus_job(spark, docs, str(tmp_path / "a"))
    s2 = run_corpus_job(spark, docs, str(tmp_path / "b"))
    assert s1["split_counts"] == s2["split_counts"]
    assert s1["curated_rows"] == s2["curated_rows"]


def test_audit_gate_blocks_write(spark, docs, tmp_path):
    out = str(tmp_path / "gated")
    cfg = CorpusJobConfig(accepted_langs=["en"])  # de/fr/es/pt now violations
    with pytest.raises(CorpusAuditError) as e:
        run_corpus_job(spark, docs, out, config=cfg)
    assert any(c == "lang_accepted" for c, _v in e.value.failures)
    import os

    assert not os.path.exists(out)  # nothing was published
