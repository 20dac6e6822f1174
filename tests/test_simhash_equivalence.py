"""The vectorized simhash (dedup.simhash_fingerprints) must compute the
exact integer of the pure-JVM reference fold (functions.text.simhash) —
both feed oracle-checked queries, so equivalence is a correctness gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from censo_escolar_spark.functions import text as T
from censo_escolar_spark.operators import dedup
from censo_escolar_spark.sources.readers import load_table


def test_vectorized_simhash_equals_jvm_fold(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    fast = dedup.simhash_fingerprints(docs, "doc_id", "text")
    slow = docs.select("doc_id", T.simhash("text").alias("simhash_jvm"))
    diff = (
        fast.join(slow, "doc_id")
        .filter(F.col("simhash") != F.col("simhash_jvm"))
        .count()
    )
    assert diff == 0
