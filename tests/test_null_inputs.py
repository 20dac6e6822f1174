"""Every registered query must survive NULL-bearing input columns.

Real 100 TB tables carry NULLs in every nullable column (failed
upstream extracts, schema drift, optional fields). Injects NULLs into
every non-key column on ~10% of rows (deterministic, id-keyed) and
requires each query to execute without raising — numpy/pandas UDF
paths are where unguarded NULLs turn into task failures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from censo_escolar_spark.sources.readers import TEST_TABLES, load_table

#: first column of each table is its row key — never nulled, so joins
#: and dedup ids stay valid; everything else gets NULLs.
_KEEP = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


@pytest.fixture(scope="module")
def nully_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_sf")
    for t in TEST_TABLES:
        df = load_table(spark, sf_dir, t)
        key = F.col(df.columns[0])
        cols = [
            F.when(key % 10 == 3, F.lit(None)).otherwise(F.col(c)).alias(c)
            if c not in _KEEP.get(t, ())
            else F.col(c)
            for c in df.columns
        ]
        df.select(*cols).write.parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_survives_nulls(spark, nully_sf_dir, name):
    df = entrymod.queries()[name](spark, nully_sf_dir)
    assert df.count() >= 0
