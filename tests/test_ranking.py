"""operators/ranking.py — two-phase global ranking must be bit-identical
to the single-partition window functions it replaces (row_number, ntile),
across remainder shapes (n % k != 0), n < k, and empty input."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from censo_escolar_spark.operators.ranking import global_ntile, global_row_number


def _fixture(spark, n):
    # Non-monotonic value column + unique id tiebreaker = total order
    # with plenty of cross-partition boundaries at 8 range partitions.
    return spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).alias("v"),
    )


def test_global_row_number_matches_window(spark):
    df = _fixture(spark, 997)
    order = [F.desc("v"), F.asc("k")]
    got = global_row_number(df, order, out_col="rn", num_partitions=8)
    want = df.select(
        "k", "v", F.row_number().over(Window.orderBy(*order)).alias("rn")
    )
    assert got.select("k", "v", "rn").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("k", "v", "rn")).count() == 0


@pytest.mark.parametrize("n,k", [(997, 4), (1000, 4), (1000, 7), (3, 5), (5, 5)])
def test_global_ntile_matches_window(spark, n, k):
    df = _fixture(spark, n)
    order = [F.desc("v"), F.asc("k")]
    got = global_ntile(df, order, k, out_col="b", num_partitions=8)
    want = df.select("k", F.ntile(k).over(Window.orderBy(*order)).alias("b"))
    joined = got.select("k", "b").join(want.withColumnRenamed("b", "wb"), "k")
    assert joined.filter(F.col("b") != F.col("wb")).count() == 0
    assert joined.count() == n


def test_global_ranking_empty_input(spark):
    df = _fixture(spark, 10).filter(F.lit(False))
    assert global_row_number(df, [F.asc("k")], out_col="rn").count() == 0
    assert global_ntile(df, [F.asc("k")], 4, out_col="b").count() == 0


def test_global_row_number_is_distributed(spark):
    """The whole point: no single-partition exchange feeding a window."""
    df = _fixture(spark, 997)
    got = global_row_number(df, [F.asc("v"), F.asc("k")], num_partitions=8)
    jplan = got._jdf.queryExecution().sparkPlan()
    stack = [jplan]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window":
            assert not node.partitionSpec().isEmpty()
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
