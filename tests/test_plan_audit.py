"""plan_summary reads the right signals off known plans."""

from __future__ import annotations

import __spark_entry__ as entrymod
from censo_escolar_spark.plans.audit import plan_summary


def test_q01_shape(spark, sf_dir):
    s = plan_summary(entrymod.queries()["q01_pricing_summary"](spark, sf_dir))
    assert s.scans == 1
    assert s.scans_with_pushed_filters == 1  # shipdate filter reached parquet
    assert s.rowwise_python_nodes == 0
    assert s.arrow_python_nodes == 0
    assert s.unpartitioned_windows == 0
    assert s.exchanges >= 1  # the groupBy shuffle


def test_q03_broadcasts_dims(spark, sf_dir):
    s = plan_summary(entrymod.queries()["q03_acctbal_by_region"](spark, sf_dir))
    assert s.broadcast_joins >= 2  # nation and region ship, customer does not
    assert s.sort_merge_joins == 0


def test_s02_arrow_boundary_counted(spark, sf_dir):
    s = plan_summary(entrymod.queries()["s02_cosine_pairs"](spark, sf_dir))
    assert s.arrow_python_nodes >= 1  # the designed GEMM boundary
    assert s.rowwise_python_nodes == 0


def test_dict_roundtrip(spark, sf_dir):
    d = plan_summary(entrymod.queries()["q01_pricing_summary"](spark, sf_dir)).dict()
    assert set(d) >= {"exchanges", "broadcast_joins", "scans"}
