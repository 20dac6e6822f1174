"""Every registered query must survive ZERO-ROW input tables.

At 100 TB a partition-pruned read, a fresh tenant, or a filtered branch
routinely hands an operator an empty frame; driver-side peeks
(`head(1)`, seed collects, centroid training) are where engines crash.
Each query must plan and execute to an empty (or aggregate-only) result
— never raise.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from censo_escolar_spark.sources.readers import TEST_TABLES, load_table


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TEST_TABLES:
        df = load_table(spark, sf_dir, t).limit(0)
        df.write.parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = entrymod.queries()[name](spark, empty_sf_dir)
    n = df.count()
    assert n >= 0  # global aggregates may emit one row over zero input
