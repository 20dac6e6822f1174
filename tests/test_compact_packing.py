"""latest_by_key compaction and sequence-packing offsets.

Plan contracts, not just values: compaction must be an aggregate with
map-side partial aggregation (no sort, no window), and packing must be
a stream-partitioned window (never a global one).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from censo_escolar_spark.operators.compact import latest_by_key
from censo_escolar_spark.operators.packing import pack_offsets


def _changelog(spark):
    # key 1: three versions; key 2: tie on ts broken by event_id; key 3: one.
    rows = [
        (1, 10, 100, "a", 1.0),
        (1, 11, 300, "b", 2.0),
        (1, 12, 200, "c", 3.0),
        (2, 20, 500, "d", 4.0),
        (2, 21, 500, "e", 5.0),
        (3, 30, 900, "f", 6.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, event_type string, value double"
    )


def test_latest_by_key_picks_max_version_with_tiebreak(spark):
    out = latest_by_key(
        _changelog(spark), ["user_id"], [F.col("ts"), F.col("event_id")]
    )
    got = {r.user_id: (r.event_id, r.event_type) for r in out.collect()}
    assert got == {1: (11, "b"), 2: (21, "e"), 3: (30, "f")}
    # original column names and order of key+payload preserved
    assert out.columns == ["user_id", "event_id", "ts", "event_type", "value"]


def test_latest_by_key_plan_is_aggregate_not_window(spark):
    out = latest_by_key(
        _changelog(spark), ["user_id"], [F.col("ts"), F.col("event_id")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "Window" not in plan
    # partial aggregation before the exchange: a map-side combine exists
    assert "partial_max_by" in plan.lower() or "partial" in plan.lower()


def test_latest_by_key_payload_subset(spark):
    out = latest_by_key(
        _changelog(spark), ["user_id"], [F.col("ts"), F.col("event_id")],
        payload_cols=["event_type"],
    )
    assert out.columns == ["user_id", "event_type"]
    assert {r.event_type for r in out.collect()} == {"b", "e", "f"}


def test_pack_offsets_spans_and_offsets(spark):
    # stream x: 3 docs of 60 tokens, capacity 100 -> doc2 straddles packs 0/1,
    # doc3 starts at 120 (pack 1, offset 20).
    rows = [(1, "x", 60), (2, "x", 60), (3, "x", 60), (4, "y", 250), (5, "y", 0)]
    df = spark.createDataFrame(rows, "doc_id long, stream string, n int")
    out = {
        r.doc_id: (r.pack_first, r.pack_last, r.pack_offset, r.n_packs)
        for r in pack_offsets(
            df, "doc_id", "n", capacity=100, stream_cols=["stream"]
        ).collect()
    }
    assert out[1] == (0, 0, 0, 1)
    assert out[2] == (0, 1, 60, 2)  # straddles the 100-token cut
    assert out[3] == (1, 1, 20, 1)
    assert out[4] == (0, 2, 0, 3)  # one doc spanning three packs
    assert out[5] == (2, 2, 50, 1)  # empty doc: lands where the cursor is


def test_pack_offsets_window_is_stream_partitioned(spark):
    df = spark.createDataFrame([(1, "x", 5)], "doc_id long, stream string, n int")
    plan = (
        pack_offsets(df, "doc_id", "n", capacity=10, stream_cols=["stream"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the Window node must carry a partition spec (the stream column);
    # registered queries are additionally covered by the global
    # unpartitioned-window ban in test_plan_quality.py
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert window_lines and all("stream" in ln for ln in window_lines)
