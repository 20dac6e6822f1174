"""Incremental rollup: merge is associative, order-free, full-recompute-equal."""

from __future__ import annotations

from pyspark.sql import functions as F

from censo_escolar_spark.operators import rollup
from censo_escolar_spark.sources.readers import load_table


def _full(e):
    return rollup.finalize(rollup.partials(e, ["user_id", "event_type"], "value"))


def test_three_way_merge_equals_full(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    d = F.dayofmonth("ts")
    batches = [
        rollup.partials(e.filter(cond), ["user_id", "event_type"], "value")
        for cond in [d <= 10, (d > 10) & (d <= 20), d > 20]
    ]
    inc = rollup.finalize(rollup.merge(*batches))
    full = _full(e)
    assert inc.exceptAll(full).count() == 0 and full.exceptAll(inc).count() == 0


def test_merge_order_free(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    d = F.dayofmonth("ts")
    a = rollup.partials(e.filter(d <= 15), ["user_id"], "value")
    b = rollup.partials(e.filter(d > 15), ["user_id"], "value")
    ab = rollup.finalize(rollup.merge(a, b)).collect()
    ba = rollup.finalize(rollup.merge(b, a)).collect()
    assert sorted(map(tuple, ab)) == sorted(map(tuple, ba))


def test_merged_state_is_remergeable(spark, sf_dir):
    """merge(merge(a,b), c) == merge(a, b, c): stored state re-enters."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    d = F.dayofmonth("ts")
    a = rollup.partials(e.filter(d <= 10), ["user_id"], "value")
    b = rollup.partials(e.filter((d > 10) & (d <= 20)), ["user_id"], "value")
    c = rollup.partials(e.filter(d > 20), ["user_id"], "value")
    nested = rollup.finalize(rollup.merge(rollup.merge(a, b), c)).collect()
    flat = rollup.finalize(rollup.merge(a, b, c)).collect()
    assert sorted(map(tuple, nested)) == sorted(map(tuple, flat))
