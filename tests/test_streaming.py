"""Structured Streaming tests: the streaming-only semantics that the batch
oracles (plans/events.py) cannot check — watermark late-data eviction
across checkpointed restarts, streaming dedup, session windows, and the
applyInPandasWithState custom stateful operator.

All tests run file-source streams with trigger(availableNow) into memory
sinks, so they exercise the REAL streaming engine (state store,
watermark tracking, checkpoint recovery) without wall-clock waits.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from censo_escolar_spark.streaming import windows as W

SCHEMA = "ts timestamp, user_id bigint, event_type string, value double"


def _write_batch(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(df, name: str, checkpoint: str, mode: str) -> None:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _ts(h: int, m: int) -> datetime:
    return datetime(2024, 3, 1, h, m)


def _drain_to_files(df, sink: str, checkpoint: str) -> None:
    """File sink supports checkpoint recovery (memory sink does not)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tumbling_watermark_drops_late_rows(spark, tmp_path):
    """A row older than the persisted watermark must be dropped on restart:
    the closed window is emitted exactly once, WITHOUT the late row."""
    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    _write_batch(
        spark,
        src,
        [
            (_ts(10, 5), 1, "a", 1.0),
            (_ts(10, 20), 2, "a", 2.0),
            (_ts(13, 0), 3, "z", 100.0),  # advances watermark to 12:30
        ],
    )
    schema = spark.read.parquet(src).schema
    stream = W.tumbling_counts(
        W.read_event_stream(spark, src, schema), window="1 hour", watermark="30 minutes"
    )
    _drain_to_files(stream, sink, ckpt)

    # Late arrival: 10:07 is far behind the 12:30 watermark -> dropped.
    # 13:10 is on time but its window is still open -> not emitted.
    _write_batch(spark, src, [(_ts(10, 7), 4, "a", 50.0), (_ts(13, 10), 5, "b", 5.0)])
    stream = W.tumbling_counts(
        W.read_event_stream(spark, src, schema), window="1 hour", watermark="30 minutes"
    )
    _drain_to_files(stream, sink, ckpt)

    rows = spark.read.parquet(sink).collect()
    emitted = {(r.window_start, r.event_type): r for r in rows}
    key = (_ts(10, 0), "a")
    assert key in emitted, "closed 10:00 window was never emitted"
    assert emitted[key].n_events == 2, "late row leaked into a closed window"
    assert emitted[key].total_value == pytest.approx(3.0)
    # exactly once across restarts, and no open-window rows
    assert len(rows) == len(emitted)
    assert all(k[0] < _ts(13, 0) for k in emitted)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_batch(
        spark,
        src,
        [
            (_ts(9, 0), 1, "click", 1.0),
            (_ts(9, 1), 1, "click", 99.0),  # duplicate (user_id, event_type)
            (_ts(9, 2), 1, "view", 2.0),
            (_ts(9, 3), 2, "click", 3.0),
        ],
    )
    schema = spark.read.parquet(src).schema
    deduped = W.dedup_within_watermark(
        W.read_event_stream(spark, src, schema), keys=["user_id", "event_type"]
    )
    _drain(deduped, "dedup1", ckpt, "append")
    out = spark.table("dedup1").collect()
    assert len(out) == 3
    assert {(r.user_id, r.event_type) for r in out} == {(1, "click"), (1, "view"), (2, "click")}


def test_sessionize_matches_batch(spark, tmp_path):
    """Streaming session windows group identically to the batch
    session_window the e03 oracle verifies."""
    from pyspark.sql import functions as F

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    rows = [
        (_ts(9, 0), 1, "a", 1.0),
        (_ts(9, 10), 1, "a", 1.0),  # same session (gap 30m)
        (_ts(11, 0), 1, "a", 1.0),  # new session
        (_ts(9, 5), 2, "a", 1.0),
    ]
    _write_batch(spark, src, rows)
    batch_df = spark.read.parquet(src)
    expected = {
        (r.user_id, r["w"].start, r["w"].end, r.n)
        for r in batch_df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stream = W.sessionize(
        W.read_event_stream(spark, src, batch_df.schema), gap="30 minutes"
    )
    _drain(stream, "sessions1", ckpt, "complete")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sessions1").collect()
    }
    assert got == expected
    assert len(got) == 3


def test_running_user_stats_stateful(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: state from
    run 1 must survive the checkpoint into run 2."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_batch(spark, src, [(_ts(9, 0), 1, "a", 10.0), (_ts(9, 1), 1, "a", 30.0)])
    schema = spark.read.parquet(src).schema

    def drain_foreach(df, checkpoint: str) -> list:
        # foreachBatch supports checkpoint recovery; memory sink does not.
        batch_rows: list = []
        q = (
            df.writeStream.foreachBatch(
                lambda bdf, _id: batch_rows.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batch_rows

    stats = W.running_user_stats(W.read_event_stream(spark, src, schema))
    first = {r.user_id: r for r in drain_foreach(stats, ckpt)}
    assert first[1].n_events == 2 and first[1].max_value == pytest.approx(30.0)

    _write_batch(spark, src, [(_ts(9, 2), 1, "a", 20.0), (_ts(9, 3), 2, "b", 7.0)])
    stats = W.running_user_stats(W.read_event_stream(spark, src, schema))
    second = {r.user_id: r for r in drain_foreach(stats, ckpt)}
    assert second[1].n_events == 3, "state lost across restart"
    assert second[1].max_value == pytest.approx(30.0)
    assert second[2].n_events == 1 and second[2].max_value == pytest.approx(7.0)


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join within an event-time interval matches the
    identical batch join (both watermarked sides, bounded state)."""
    clicks_src, views_src = str(tmp_path / "clicks"), str(tmp_path / "views")
    ckpt = str(tmp_path / "ckpt")
    clicks = [
        (_ts(9, 0), 1, "click", 1.0),
        (_ts(9, 30), 1, "click", 2.0),
        (_ts(9, 5), 2, "click", 3.0),
    ]
    views = [
        (_ts(9, 2), 1, "view", 10.0),   # within 10m of 9:00 click
        (_ts(9, 29), 1, "view", 20.0),  # within 10m (backward) of 9:30 click
        (_ts(9, 50), 2, "view", 30.0),  # too far from 9:05 click
    ]
    _write_batch(spark, clicks_src, clicks)
    _write_batch(spark, views_src, views)
    schema = spark.read.parquet(clicks_src).schema

    def prep(df, prefix):
        cols = {"ts": f"{prefix}_ts", "event_type": f"{prefix}_type", "value": f"{prefix}_val"}
        for a, b in cols.items():
            df = df.withColumnRenamed(a, b)
        return df

    l_stream = prep(W.read_event_stream(spark, clicks_src, schema), "c")
    r_stream = prep(W.read_event_stream(spark, views_src, schema), "v")
    joined = W.interval_join(
        l_stream, r_stream, on="user_id", left_ts="c_ts", right_ts="v_ts",
        lower="5 minutes", upper="10 minutes",
    )
    _drain(joined, "sjoin", ckpt, "append")
    got = {(r.user_id, r.c_ts, r.v_ts) for r in spark.table("sjoin").collect()}

    expected = {
        (1, _ts(9, 0), _ts(9, 2)),
        (1, _ts(9, 30), _ts(9, 29)),
    }
    assert got == expected


def test_curation_functions_compose_with_streams(spark, tmp_path):
    """Stateless curation expressions (PII redaction, quality stats,
    boilerplate stripping) must run identically inside a streaming query —
    the streaming corpus-ingest shape: readStream → curate → sink."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from censo_escolar_spark.functions import text as T

    src, ckpt = str(tmp_path / "docs_src"), str(tmp_path / "docs_ckpt")
    doc_schema = "doc_id bigint, text string"
    rows = [
        (1, "contact me at a@b.co or 10.0.0.1\nCopyright 2024 Acme\nreal content"),
        (2, "clean document with nothing to redact at all"),
    ]
    spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(doc_schema).parquet(src)
        .select(
            "doc_id",
            T.redact_pii(T.strip_boilerplate("text")).alias("clean"),
            T.pii_count("text", "email").alias("n_emails"),
            T.token_count("text").alias("n_tokens"),
        )
    )
    assert stream.isStreaming
    _drain(stream, "curated_docs", ckpt, "append")
    got = {
        r.doc_id: (r.clean, r.n_emails)
        for r in spark.sql("SELECT * FROM curated_docs").collect()
    }
    assert got[1] == ("contact me at <EMAIL> or <IP>\n\nreal content", 1)
    assert got[2] == ("clean document with nothing to redact at all", 0)


def test_idempotent_sink_exactly_once(spark, tmp_path):
    """Retried/re-run batches replace their partition — never append."""
    import pyspark.sql.functions as F

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    batch1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "event_id long, event_type string, value double"
    )
    batch1.write.parquet(src)
    stream = spark.readStream.schema(batch1.schema).parquet(src)
    W.idempotent_parquet_sink(stream, path=out, checkpoint=ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 2

    # re-running the SAME drained stream (same checkpoint) writes nothing
    stream = spark.readStream.schema(batch1.schema).parquet(src)
    W.idempotent_parquet_sink(stream, path=out, checkpoint=ckpt)
    assert spark.read.parquet(out).count() == 2

    # a retry of batch 0 (fresh checkpoint, same input) OVERWRITES the
    # __batch_id=0 partition instead of duplicating it
    W.idempotent_parquet_sink(
        spark.readStream.schema(batch1.schema).parquet(src),
        path=out,
        checkpoint=str(tmp_path / "ck2"),
    )
    again = spark.read.parquet(out)
    assert again.count() == 2
    assert [r[0] for r in again.select(F.col("__batch_id")).distinct().collect()] == [0]

    # new data under a NEW batch id lands alongside, old batch untouched
    spark.createDataFrame(
        [(3, "c", 3.0)], "event_id long, event_type string, value double"
    ).write.mode("append").parquet(src)
    W.idempotent_parquet_sink(
        spark.readStream.schema(batch1.schema).parquet(src),
        path=out,
        checkpoint=ckpt,
    )
    final = spark.read.parquet(out)
    assert final.count() == 3
    assert final.filter(F.col("event_id") == 3).count() == 1


def test_streaming_hll_sketch_state_merges_with_batch(spark, tmp_path):
    """The streaming sink's HLL sketch column must be real mergeable
    state: unioning the emitted window sketches with hll_union_agg
    estimates the distinct keys across ALL closed windows, and matches
    the exact batch answer (exact-mode cardinalities)."""
    from pyspark.sql import functions as F

    src, ckpt, sink = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    rows = [(_ts(9, m % 50), 100 + (m % 7), "a", 1.0) for m in range(30)]
    rows += [(_ts(10, m % 50), 200 + (m % 5), "a", 1.0) for m in range(20)]
    rows += [(_ts(13, 0), 999, "z", 1.0)]  # watermark pusher
    _write_batch(spark, src, rows)
    schema = spark.read.parquet(src).schema
    stream = W.windowed_hll_sketches(
        W.read_event_stream(spark, src, schema),
        window="1 hour",
        watermark="30 minutes",
    )
    _drain_to_files(stream, sink, ckpt)

    out = spark.read.parquet(sink)
    closed = out.filter(F.col("event_type") == "a")
    # per-window estimates are exact at these cardinalities
    per_window = {
        r.window_start: r.approx_distinct_keys for r in closed.collect()
    }
    assert per_window[_ts(9, 0)] == 7.0
    assert per_window[_ts(10, 0)] == 5.0
    # the sketches merge across windows: 7 + 5 disjoint keys
    total = closed.agg(
        F.hll_sketch_estimate(F.hll_union_agg("key_sketch")).alias("e")
    ).collect()[0]["e"]
    assert total == 12.0


def test_streaming_kll_sketch_state_merges_across_windows(spark, tmp_path):
    """The emitted KLL state must merge across closed windows: the
    merged sketch's median over two disjoint-window populations equals
    the exact all-data median (exact regime: n < k buffer)."""
    from pyspark.sql import functions as F

    src, ckpt, sink = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    rows = [(_ts(9, m % 50), 1, "a", float(m)) for m in range(40)]       # 0..39
    rows += [(_ts(10, m % 50), 1, "a", float(100 + m)) for m in range(40)]  # 100..139
    rows += [(_ts(13, 0), 9, "z", 0.0)]  # watermark pusher
    _write_batch(spark, src, rows)
    schema = spark.read.parquet(src).schema
    stream = W.windowed_kll_sketches(
        W.read_event_stream(spark, src, schema),
        window="1 hour",
        watermark="30 minutes",
        k=200,
    )
    _drain_to_files(stream, sink, ckpt)

    closed = spark.read.parquet(sink).filter(F.col("event_type") == "a")
    per_window = {r.window_start: r.approx_median for r in closed.collect()}
    assert per_window[_ts(9, 0)] == 19.0   # exact-mode median of 0..39
    assert per_window[_ts(10, 0)] == 119.0
    merged = closed.agg(F.collect_list("value_sketch").alias("sks")).select(
        F.expr(
            "kll_sketch_get_quantile_double("
            "aggregate(slice(sks, 2, greatest(size(sks) - 1, 0)),"
            " element_at(sks, 1),"
            " (acc, x) -> kll_sketch_merge_double(acc, x)), 0.5)"
        ).alias("m")
    ).collect()[0]["m"]
    # exact regime: merged 80 values, lower-median semantics
    assert merged in (39.0, 100.0)


def test_stream_stream_interval_join_left_outer(spark, tmp_path):
    """leftOuter interval join emits unmatched left rows (right side
    NULL) once the watermark passes their match interval."""
    clicks_src, views_src = str(tmp_path / "oclicks"), str(tmp_path / "oviews")
    ckpt = str(tmp_path / "ockpt")
    # batch 1: the real data — user 2's click has no view within range
    _write_batch(spark, clicks_src, [
        (_ts(9, 0), 1, "click", 1.0),
        (_ts(9, 5), 2, "click", 3.0),
    ])
    _write_batch(spark, views_src, [
        (_ts(9, 2), 1, "view", 10.0),
        (_ts(9, 50), 2, "view", 30.0),  # outside [9:00, 9:15]
    ])
    # batch 2: watermark advancers (user 99/98 can't join each other)
    _write_batch(spark, clicks_src, [(_ts(11, 0), 99, "click", 0.0)])
    _write_batch(spark, views_src, [(_ts(11, 0), 98, "view", 0.0)])
    schema = spark.read.parquet(clicks_src).schema

    def prep(path, prefix):
        df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        for a, b in {
            "ts": f"{prefix}_ts",
            "event_type": f"{prefix}_type",
            "value": f"{prefix}_val",
        }.items():
            df = df.withColumnRenamed(a, b)
        return df

    joined = W.interval_join(
        prep(clicks_src, "c"), prep(views_src, "v"),
        on="user_id", left_ts="c_ts", right_ts="v_ts",
        lower="5 minutes", upper="10 minutes",
        watermark="30 minutes", how="leftOuter",
    )
    _drain(joined, "sjoin_outer", ckpt, "append")
    got = {
        (r.user_id, r.c_ts, r.v_ts)
        for r in spark.table("sjoin_outer").collect()
        if r.user_id in (1, 2)
    }
    assert (1, _ts(9, 0), _ts(9, 2)) in got           # matched pair
    assert (2, _ts(9, 5), None) in got                # unmatched left emitted
    assert all(v is not None for (u, c, v) in got if u == 1)


def test_late_drop_survives_failed_batch_retry(spark, tmp_path):
    """A late row dropped by the watermark must STAY dropped when its
    micro-batch fails mid-sink and is retried from the checkpoint with
    the same batch id (Structured Streaming's at-least-once replay).
    Uses the empirically-pinned fronts: the late filter for batch N is
    the EVICTION front of batch N-1 (max event time over batches < N-1,
    minus the delay), so the late row is planted in the THIRD file."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryException

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    fail_flag = str(tmp_path / "fail_once")
    # file 0: 10:05 'a' + 13:00 'z' -> front after batch 0 = 12:30
    _write_batch(spark, src, [(_ts(10, 5), 1, "a", 1.0), (_ts(13, 0), 3, "z", 100.0)])
    # file 1: on-time 13:30 'b' (batch 1's late front is still 0)
    _write_batch(spark, src, [(_ts(13, 30), 5, "b", 5.0)])
    # file 2: 10:07 'a' is behind batch 2's late front (12:30) -> DROPPED;
    # 14:30 'c' advances the final front to 14:00
    _write_batch(spark, src, [(_ts(10, 7), 4, "a", 50.0), (_ts(14, 30), 6, "c", 7.0)])

    schema = spark.read.parquet(src).schema
    open(fail_flag, "w").close()

    def write_batch(bdf, bid):
        # inject ONE failure on the batch that processes the late row
        if bid == 2 and os.path.exists(fail_flag):
            os.remove(fail_flag)
            raise RuntimeError("injected sink failure before commit")
        (
            bdf.withColumn("__batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(sink)
        )

    def run():
        source = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)  # one file per micro-batch
            .parquet(src)
        )
        stream = W.tumbling_counts(
            source, window="1 hour", watermark="30 minutes"
        )
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        run()  # batch 2 fails after the state update was planned
    run()  # retry: batch 2 re-runs with the same id and converges

    rows = spark.read.parquet(sink).collect()
    emitted = {(r.window_start, r.event_type): r for r in rows}
    # exactly-once despite the retry: no duplicate (window, type) rows
    assert len(rows) == len(emitted)
    # the closed 10:00 window was emitted once, WITHOUT the late row
    key = (_ts(10, 0), "a")
    assert emitted[key].n_events == 1
    assert emitted[key].total_value == pytest.approx(1.0)
    # the 13:00 windows closed at the final front (14:00) and emitted
    assert emitted[(_ts(13, 0), "z")].n_events == 1
    assert emitted[(_ts(13, 0), "b")].n_events == 1
    # the 14:00 window is still open at stream end: never emitted
    assert (_ts(14, 0), "c") not in emitted
    assert len(emitted) == 3


def test_restart_resumes_offsets_and_state(spark, tmp_path):
    """A brand-new query over the same checkpoint continues the batch-id
    sequence, processes ONLY files that arrived after the first
    incarnation died, and restores window state (spanning windows keep
    their earlier rows) — the e40 contract, auditable here via a
    recording sink."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime(2024, 1, 1, 10, 0, 0)

    def rows(*specs):
        return [(datetime(2024, 1, 1, h, m, 0), u, "c", 1.0) for h, m, u in specs]

    audit: list[tuple[int, dict]] = []

    def incarnation() -> None:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
        )

        def sink(bdf, bid: int) -> None:
            audit.append(
                (
                    bid,
                    {
                        (r["w"]["start"], r["user_id"]): r["n"]
                        for r in bdf.collect()
                    },
                )
            )

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase A: two files -> batches 0 and 1
    _write_batch(spark, src, rows((10, 0, 1), (10, 10, 1)))
    _write_batch(spark, src, rows((10, 20, 1), (11, 0, 2)))
    incarnation()
    phase_a_bids = [bid for bid, _ in audit]
    assert phase_a_bids[:2] == [0, 1]
    # the 10:00 window saw 2 rows in batch 0, then 3 cumulative in batch 1
    assert audit[0][1][(t0, 1)] == 2
    assert audit[1][1][(t0, 1)] == 3

    # phase B: one more file AFTER the first incarnation terminated
    n_before = len(audit)
    _write_batch(spark, src, rows((10, 40, 1), (11, 30, 2)))
    incarnation()
    data_batches = [
        (bid, seen) for bid, seen in audit[n_before:] if seen
    ]
    assert data_batches, "restarted query processed no data"
    # batch ids CONTINUE (offsets recovered, files 1-2 not reprocessed)
    assert min(bid for bid, _ in data_batches) >= 2
    # window state RESTORED: the 10:00 window's update reflects all 4
    # rows (3 from the dead incarnation's state + 1 new), not 1
    final_10 = data_batches[-1][1].get((t0, 1))
    assert final_10 == 4


def test_join_late_filter_front_and_state(spark, tmp_path):
    """Pins the stream-stream inner-join semantics e41's oracle models:
    (1) the late-input filter uses the LAGGED front (batch N drops
    ts <= min-over-sources max event time of batches < N-1, minus
    delay; the <= boundary is exact), and (2) state eviction never
    removes a partner a kept row needs — a kept late row still joins a
    right row from two eviction fronts ago."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ts(m, s=0):
        return t0 + timedelta(minutes=m, seconds=s)

    lsrc, rsrc = str(tmp_path / "L"), str(tmp_path / "R")
    ckpt = str(tmp_path / "ck")
    sch = "ts timestamp, uid bigint, tag string"

    def w(path, rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    # watermark 10m; join r.ts in [l.ts - 5m, l.ts + 5m] on uid
    w(lsrc, [(ts(0), 99, "l1")])
    w(rsrc, [(ts(0), 99, "r1"), (ts(50, 30), 21, "rOld5030"),
             (ts(47, 0), 22, "rOld4700"), (ts(52, 0), 23, "rOld5200")])
    # batch 2 advances both sides to 60:00 -> post-b2 front = 50:00
    w(lsrc, [(ts(60), 98, "l2")]); w(rsrc, [(ts(60), 98, "r2")])
    # batch 3 advances to 65:00 -> post-b3 front = 55:00
    w(lsrc, [(ts(65), 97, "l3")]); w(rsrc, [(ts(65), 97, "r3")])
    # batch 4 probes: the lagged front must be 50:00 (post-b2), the <=
    # boundary exact, and rOld4700 (two cleanup fronts old) joinable
    w(lsrc, [(ts(49, 59), 21, "lA"), (ts(50, 0), 21, "lB"),
             (ts(50, 1), 21, "lC"), (ts(54, 59), 23, "lD"),
             (ts(51, 0), 22, "lG")])
    w(rsrc, [(ts(66), 96, "r4")])

    def stream(path, pre):
        s = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        for a, b in (("ts", f"{pre}_ts"), ("uid", f"{pre}_uid"), ("tag", f"{pre}_tag")):
            s = s.withColumnRenamed(a, b)
        return s.withWatermark(f"{pre}_ts", "10 minutes")

    joined = stream(lsrc, "l").join(
        stream(rsrc, "r"),
        (F.col("l_uid") == F.col("r_uid"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("interval 5 minutes"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("interval 5 minutes")),
        "inner",
    )
    got: list[tuple[str, str]] = []
    q = (
        joined.writeStream.foreachBatch(
            lambda bdf, bid: got.extend(
                (r.l_tag, r.r_tag) for r in bdf.collect()
            )
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pairs = set(got)
    assert ("lA", "rOld5030") not in pairs  # 49:59 < front -> dropped
    assert ("lB", "rOld5030") not in pairs  # 50:00 == front -> dropped (<=)
    assert ("lC", "rOld5030") in pairs      # 50:01 > front -> joins
    assert ("lD", "rOld5200") in pairs      # well above the front
    # kept late row joins a partner two cleanup fronts old: state
    # eviction lags exactly enough that no kept row loses its partner
    assert ("lG", "rOld4700") in pairs


def test_session_late_drop_splits_session(spark, tmp_path):
    """e43 contract on a crafted stream: the provably-late bridge row
    (event_id % 7 == 0, oldest third) is DROPPED by the watermark, so
    the engine emits TWO sessions where a full-data batch recompute
    gives ONE merged [t+1000, t+5800) session — and the tail session
    beyond the final front stays in state, unemitted."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    import censo_escolar_spark.plans.events  # noqa: F401 - populates registry
    from censo_escolar_spark.plans.registry import QUERIES

    base = 1704067200  # 2024-01-01 00:00:00 UTC
    # span 517400s -> delay 86233, c1 = base+173466, m1 = base+150000,
    # late front for batch 3 = m1 - delay = base+63767: event 7 (ts
    # base+2500, window end base+4300) is provably late -> held+dropped.
    rows = [
        (1, 1000, 42, 10.0),   # session A starts
        (7, 2500, 42, 99.0),   # bridge: within 1800s of BOTH neighbors
        (2, 4000, 42, 20.0),   # 3000s after row 1: splits without bridge
        (3, 150000, 99, 1.0),  # slice-1 max -> m1
        (4, 200000, 99, 1.0),  # slice 2 (keeps every batch non-empty)
        (5, 518400, 99, 1.0),  # hi; session end > final front: unemitted
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime.utcfromtimestamp(base + r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["c"] * len(rows)),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = QUERIES["e43_streaming_session_late_drop"](spark, str(tmp_path))
    got = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }

    def t(off: int) -> dt.datetime:
        return dt.datetime.utcfromtimestamp(base + off)

    assert got == {
        (42, t(1000), t(2800), 1, 10.0),   # split half 1 (bridge dropped)
        (42, t(4000), t(5800), 1, 20.0),   # split half 2
        (99, t(150000), t(151800), 1, 1.0),
        (99, t(200000), t(201800), 1, 1.0),
        # NOT the merged (42, t(1000), t(5800), 3, ...) a batch recompute
        # over all rows would give; NOT (99, t(518400), ...) - beyond front
    }


def test_stateful_timeout_boundary_strict(spark, tmp_path):
    """Pin the timeout-vs-watermark boundary of user_activity_segments
    (the e45 operator): an event-time timeout fires only when the
    watermark ends up STRICTLY above the armed timestamp — a segment
    whose last+gap equals the final front stays OPEN (never emits),
    one strictly below it closes, and an on-time successor row merges
    while a watermark-passed successor starts a new segment.

    Fixture (delay 100 s, gap 50 s), epoch-relative seconds; the
    watermark during file N reflects files < N only (max ts - delay,
    0-initial), so wm = -100 during file 1 and 900 during file 2:
      u1: @0 (file 0) then @1000 (file 2) -> at file 2 the wm (900)
          strictly passed 0+50, so the @0 segment CLOSES via the
          data path (n=1) and @1000 starts fresh; the final front
          1900 > 1050 closes that too (n=1).
      u2: @900 (file 1) then @940 (file 2) -> 900 < 900+50: the
          on-time successor MERGES (one segment, n=2); 1900 > 990
          closes it at the trailing batch.
      u3: @930 (file 1)   -> armed 980: 900 < 980 at file 2 (no fire),
          1900 > 980 at the trailing no-data batch -> timeout (n=1).
      u4: @1850 (file 2)  -> armed 1900 == final front 1900: equality
          must NOT fire — no emission for u4.
      u5: @1000 (file 1, pins wm(2) = 900) then @2000 (file 2, pins
          the final front at exactly 1900): merges, armed 2050 > 1900
          -> still open, never emits.
    """
    import glob
    import os
    import shutil
    from datetime import timedelta, timezone

    import pyspark.sql.functions as F

    base = datetime(2024, 3, 1, tzinfo=timezone.utc)

    def row(u, s):
        return (
            (base + timedelta(seconds=s)).replace(tzinfo=None),
            u,
            "x",
            1.0,
        )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    files = [
        [row(1, 0)],
        [row(2, 900), row(3, 930), row(5, 1000)],
        [row(1, 1000), row(2, 940), row(4, 1850), row(5, 2000)],
    ]
    for i, rows in enumerate(files):
        p = str(tmp_path / f"s{i}")
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(p)
        for f in sorted(glob.glob(p + "/*.parquet")):
            dst = os.path.join(src, f"s{i}_{os.path.basename(f)}")
            shutil.copyfile(f, dst)
            os.utime(dst, (3_000_000 + i, 3_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "user_id",
            "ts",
            F.unix_timestamp("ts").alias("ts_s"),
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .withWatermark("ts", "100 seconds")
    )
    segs = W.user_activity_segments(stream, gap_s=50)
    _drain_to_files(segs, sink, ckpt)
    got = {
        (r["user_id"], r["first_s"] - int(base.timestamp())): r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        (1, 0): 1,  # closed by the data-path check at file 2 (900 > 50)
        (1, 1000): 1,  # closed by the trailing batch (1900 > 1050)
        (2, 900): 2,  # 900 < 950: on-time successor merged, closed at end
        (3, 930): 1,  # timeout at the trailing batch (1900 > 980)
        # u4 absent: armed 1900 == final front 1900, strict fire
        # u5 absent: armed 2050 > 1900, still open
    }


def test_ddww_eviction_and_late_boundaries(spark, tmp_path):
    """Pin dropDuplicatesWithinWatermark's engine semantics (the fronts
    the e47 oracle models). Delay 300 s, epoch-relative seconds, three
    single-file micro-batches; wm_evict(N) = max ts over batches < N
    minus delay (0-init), wm_late(N) = wm_evict(N-1):

    - state PRESENCE governs suppression during batch N: cleanup at the
      end of batch N uses the DURING-batch front wm_evict(N), so k1
      (expiry 400 <= wm_evict(2)=700) still suppresses its batch-2 dup
      (it is evicted only at the END of batch 2);
    - eviction fires at EQUALITY: k2's expiry 400+300=700 == the
      end-of-batch-2 front 700 -> evicted -> its batch-3 dup @900
      RE-EMITS;
    - a suppressed duplicate does NOT refresh expiry: k1's dup @500
      would push expiry to 800 > 700 if it did; the batch-3 dup @950
      re-emits, so it did not;
    - the late filter drops ts == wm_late(N) (equality drops): new keys
      @700 and @699 in batch 3 (wm_late(3)=700) both vanish, @1800
      survives.
    """
    import glob
    import os
    import shutil
    from datetime import timedelta, timezone

    base = datetime(2024, 3, 1, tzinfo=timezone.utc)

    def row(k, s, tag):
        return ((base + timedelta(seconds=s)).replace(tzinfo=None), k, tag, 1.0)

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    files = [
        [row(1, 100, "b1-k1"), (row(2, 400, "b1-k2")), row(9, 1000, "b1-front")],
        [row(1, 500, "b2-k1-dup"), row(10, 2000, "b2-front")],
        [
            row(2, 900, "b3-k2-dup-after-equality-evict"),
            row(1, 950, "b3-k1-dup-no-refresh"),
            row(20, 700, "b3-late-eq"),
            row(21, 699, "b3-late-below"),
            row(22, 1800, "b3-new"),
        ],
    ]
    for i, rows in enumerate(files):
        p = str(tmp_path / f"s{i}")
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(p)
        for f in sorted(glob.glob(p + "/*.parquet")):
            dst = os.path.join(src, f"s{i}_{os.path.basename(f)}")
            shutil.copyfile(f, dst)
            os.utime(dst, (3_000_000 + i, 3_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "300 seconds")
        .dropDuplicatesWithinWatermark(["user_id"])
    )
    _drain_to_files(stream, sink, ckpt)
    base_s = int(base.timestamp())
    got = {
        (r.user_id, int(r.ts.replace(tzinfo=timezone.utc).timestamp()) - base_s)
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        (1, 100), (2, 400), (9, 1000),       # batch 1 all emit
        (10, 2000),                          # batch 2: k1 dup suppressed
        (2, 900),                            # equality eviction -> re-emit
        (1, 950),                            # no expiry refresh -> re-emit
        (22, 1800),                          # on-time new key
        # (20,700)/(21,699) late-dropped at ts <= wm_late(3)=700
    }


def test_stream_stream_interval_join_full_outer(spark, tmp_path):
    """Pin fullOuter interval-join emission fronts (the e48 oracle
    model): matched pairs emit on arrival; an unmatched LEFT row's
    null-row emits iff l_ts + upper < fw (STRICT — e42's pinned rule);
    an unmatched RIGHT row's null-row emits iff r_ts + lower < fw,
    also STRICT (its match interval on the left timeline is
    [r_ts - upper, r_ts + lower]). fw = min over sources of max event
    time, minus delay. Fixture: delay 100 s, lower=upper=10 s,
    front-setters at 2000 on both sides -> fw = 1900; boundary rows at
    1890 (interval end == 1900, must NOT emit) and 1889 (emits)."""
    import glob
    import os
    import shutil
    from datetime import timedelta, timezone

    base = datetime(2024, 3, 1, tzinfo=timezone.utc)

    def row(u, s, tag):
        return ((base + timedelta(seconds=s)).replace(tzinfo=None), u, tag, 1.0)

    lsrc, rsrc = str(tmp_path / "fol"), str(tmp_path / "for")
    ckpt = str(tmp_path / "fockpt")
    os.makedirs(lsrc)
    os.makedirs(rsrc)
    files = {
        lsrc: [
            [row(7, 1500, "L-pair"), row(5, 1890, "L-boundary-eq"),
             row(6, 1889, "L-below")],
            [row(99, 2000, "L-front")],
        ],
        rsrc: [
            [row(7, 1505, "R-pair"), row(3, 1890, "R-boundary-eq"),
             row(4, 1889, "R-below")],
            [row(98, 2000, "R-front")],
        ],
    }
    for src, batches in files.items():
        for i, rows in enumerate(batches):
            p = str(tmp_path / f"{os.path.basename(src)}_s{i}")
            spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(p)
            for f in sorted(glob.glob(p + "/*.parquet")):
                dst = os.path.join(src, f"s{i}_{os.path.basename(f)}")
                shutil.copyfile(f, dst)
                os.utime(dst, (3_000_000 + i, 3_000_000 + i))

    schema = spark.read.parquet(lsrc).schema

    def prep(path, prefix):
        df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        for a, b in {
            "ts": f"{prefix}_ts",
            "event_type": f"{prefix}_type",
            "value": f"{prefix}_val",
        }.items():
            df = df.withColumnRenamed(a, b)
        return df

    joined = W.interval_join(
        prep(lsrc, "l"), prep(rsrc, "r"),
        on="user_id", left_ts="l_ts", right_ts="r_ts",
        lower="10 seconds", upper="10 seconds",
        watermark="100 seconds", how="fullOuter",
    )
    _drain(joined, "sjoin_full", ckpt, "append")
    base_s = int(base.timestamp())

    def rel(ts):
        return (
            None
            if ts is None
            else int(ts.replace(tzinfo=timezone.utc).timestamp()) - base_s
        )

    got = {
        (r.user_id, rel(r.l_ts), rel(r.r_ts))
        for r in spark.table("sjoin_full").collect()
    }
    assert got == {
        (7, 1500, 1505),   # matched pair
        (6, 1889, None),   # left null-row: 1899 < 1900
        (4, None, 1889),   # right null-row: 1899 < 1900
        # u5/u3 boundary-eq (interval end == fw) stay in state;
        # u99/u98 fronts end above fw
    }


def test_full_outer_right_front_uses_lower_bound(spark, tmp_path):
    """Pin the ASYMMETRIC-bounds case of the fullOuter right-side
    emission rule (e48's symmetric ±up fixture cannot distinguish
    +lower from +upper): with lower=5 s, upper=20 s, a right row's
    match interval on the left timeline is [r_ts − upper, r_ts + lower],
    so its null row emits iff r_ts + lower < fw — rows at 1879/1880/
    1894 clear the 1900 front, the 1895 boundary row (1900 == fw,
    strict) does not."""
    import glob
    import os
    import shutil
    from datetime import timedelta, timezone

    base = datetime(2024, 3, 1, tzinfo=timezone.utc)

    def row(u, s):
        return ((base + timedelta(seconds=s)).replace(tzinfo=None), u, "x", 1.0)

    lsrc, rsrc = str(tmp_path / "asl"), str(tmp_path / "asr")
    ckpt, sink = str(tmp_path / "asckpt"), str(tmp_path / "asout")
    os.makedirs(lsrc)
    os.makedirs(rsrc)
    files = {
        lsrc: [[row(50, 100)], [row(99, 2000)]],
        rsrc: [[row(3, 1879), row(4, 1880), row(7, 1894), row(8, 1895)],
               [row(98, 2000)]],
    }
    for src, batches in files.items():
        for i, rows in enumerate(batches):
            p = str(tmp_path / f"{os.path.basename(src)}_s{i}")
            spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(p)
            for f in sorted(glob.glob(p + "/*.parquet")):
                dst = os.path.join(src, f"s{i}_{os.path.basename(f)}")
                shutil.copyfile(f, dst)
                os.utime(dst, (3_000_000 + i, 3_000_000 + i))

    schema = spark.read.parquet(lsrc).schema

    def prep(path, prefix):
        df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        for a, b in {
            "ts": f"{prefix}_ts",
            "event_type": f"{prefix}_type",
            "value": f"{prefix}_val",
        }.items():
            df = df.withColumnRenamed(a, b)
        return df

    joined = W.interval_join(
        prep(lsrc, "l"), prep(rsrc, "r"),
        on="user_id", left_ts="l_ts", right_ts="r_ts",
        lower="5 seconds", upper="20 seconds",
        watermark="100 seconds", how="fullOuter",
    )
    _drain_to_files(joined, sink, ckpt)
    got = sorted(r.user_id for r in spark.read.parquet(sink).collect())
    # 3/4/7: r_ts + 5 < 1900 -> right null rows; 8: 1900 == fw stays;
    # 50: left null row (100 + 20 < 1900); 99/98 fronts stay in state
    assert got == [3, 4, 7, 50]
