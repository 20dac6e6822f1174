"""Bucketed co-located join: the join of two tables bucketed on the join
key must plan WITHOUT a shuffle Exchange on either side, and its result
must equal the plain (shuffled) join.
"""

from __future__ import annotations

import pytest

from censo_escolar_spark.sources.bucketing import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders, "t_orders_b", bucket_cols=["o_custkey"], n_buckets=4, sort_cols=["o_custkey"]
    )
    write_bucketed(
        customer, "t_customer_b", bucket_cols=["c_custkey"], n_buckets=4, sort_cols=["c_custkey"]
    )
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_join_has_no_exchange_and_matches_plain(spark, bucketed_pair):
    ot, ct = bucketed_pair
    o, c = read_bucketed(spark, ot), read_bucketed(spark, ct)

    # force the sort-merge path: broadcast would hide the bucket layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # correctness: same rows as the shuffled join over the raw frames
        raw_o = spark.read.parquet(*[f for f in spark.table(ot).inputFiles()])
        raw_c = spark.read.parquet(*[f for f in spark.table(ct).inputFiles()])
        expected = raw_o.join(raw_c, raw_o.o_custkey == raw_c.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_pruning_note(spark, bucketed_pair):
    # groupBy on the bucket key must also be Exchange-free: the layout
    # satisfies the aggregation's required distribution too.
    ot, _ = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = read_bucketed(spark, ot).groupBy("o_custkey").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
