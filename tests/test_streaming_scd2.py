"""Streaming SCD2 maintenance: incremental == batch, retry-safe."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from censo_escolar_spark.operators.scd2 import scd2_intervals
from censo_escolar_spark.streaming import scd2 as S
from censo_escolar_spark.streaming.windows import read_event_stream

SCHEMA = "ts timestamp, user_id bigint, event_type string, event_id bigint"


def _ts(m: int) -> datetime:
    return datetime(2024, 3, 1, 10, m)


ROWS_B1 = [
    (_ts(0), 1, "view", 1),
    (_ts(1), 1, "view", 2),
    (_ts(2), 1, "click", 3),
    (_ts(0), 2, "view", 4),
]
ROWS_B2 = [
    (_ts(5), 1, "click", 5),   # continues user 1's open 'click' run -> merge
    (_ts(6), 1, "view", 6),    # new run
    (_ts(5), 2, "purchase", 7),  # closes user 2's open 'view' run
    (_ts(5), 3, "view", 8),    # brand-new key
]


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _canon(df):
    cols = ["user_id", "run_id", "state", "valid_from", "valid_to", "is_current", "n_events"]
    return sorted(map(tuple, df.select(*cols).collect()))


def test_incremental_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.createDataFrame([], SCHEMA).schema

    _write(spark, src, ROWS_B1)
    S.maintain_scd2(read_event_stream(spark, src, schema), state_dir=state, checkpoint=ckpt)
    _write(spark, src, ROWS_B2)
    S.maintain_scd2(read_event_stream(spark, src, schema), state_dir=state, checkpoint=ckpt)

    streamed = _canon(S.read_scd2_state(spark, state))
    batch = _canon(scd2_intervals(spark.createDataFrame(ROWS_B1 + ROWS_B2, SCHEMA)))
    assert streamed == batch


def test_merge_and_close_semantics(spark, tmp_path):
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(ROWS_B1, SCHEMA)
    b2 = spark.createDataFrame(ROWS_B2, SCHEMA)
    S.apply_scd2_batch(b1, 0, state_dir=state)
    S.apply_scd2_batch(b2, 1, state_dir=state)
    rows = {
        (r.user_id, r.run_id): r
        for r in S.read_scd2_state(spark, state).collect()
    }
    # user 1: view(2 events) -> click MERGED across batches (2 events) -> view open
    assert rows[(1, 1)].state == "view" and rows[(1, 1)].n_events == 2
    assert rows[(1, 2)].state == "click" and rows[(1, 2)].n_events == 2
    assert rows[(1, 2)].valid_from == _ts(2)  # carried from batch 1
    assert rows[(1, 3)].state == "view" and rows[(1, 3)].is_current
    # user 2: open 'view' closed at the batch-2 purchase
    assert rows[(2, 1)].state == "view" and rows[(2, 1)].valid_to == _ts(5)
    assert rows[(2, 2)].state == "purchase" and rows[(2, 2)].is_current
    # user 3: fresh key numbered from 1
    assert rows[(3, 1)].state == "view" and rows[(3, 1)].is_current


def test_retry_same_batch_id_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(ROWS_B1, SCHEMA)
    b2 = spark.createDataFrame(ROWS_B2, SCHEMA)
    S.apply_scd2_batch(b1, 0, state_dir=state)
    S.apply_scd2_batch(b2, 1, state_dir=state)
    first = _canon(S.read_scd2_state(spark, state))
    # failure replay: the SAME batch id runs again — must read version 0
    # (not its own half-written output) and reproduce identical state
    S.apply_scd2_batch(b2, 1, state_dir=state)
    assert _canon(S.read_scd2_state(spark, state)) == first


def test_untouched_keys_pass_through(spark, tmp_path):
    state = str(tmp_path / "state")
    S.apply_scd2_batch(spark.createDataFrame(ROWS_B1, SCHEMA), 0, state_dir=state)
    only_user3 = spark.createDataFrame([(_ts(9), 3, "view", 9)], SCHEMA)
    S.apply_scd2_batch(only_user3, 1, state_dir=state)
    out = S.read_scd2_state(spark, state)
    u1 = _canon(out.filter(F.col("user_id") == 1))
    base = _canon(
        scd2_intervals(spark.createDataFrame(ROWS_B1, SCHEMA)).filter(
            F.col("user_id") == 1
        )
    )
    assert u1 == base


def test_random_streams_incremental_equals_batch(spark, tmp_path):
    """Property: for random in-order event streams split at arbitrary
    batch boundaries, N stitched micro-batches == one batch build."""
    import numpy as np

    from datetime import timedelta

    rng = np.random.RandomState(11)
    rows = []
    eid = 0
    base_ts = datetime(2024, 3, 1)
    for user in range(6):
        t = 0
        for _ in range(rng.randint(3, 25)):
            t += int(rng.randint(1, 30))
            eid += 1
            rows.append(
                (base_ts + timedelta(seconds=t), user,
                 ["view", "click", "purchase"][rng.randint(0, 3)], eid)
            )
    rows.sort(key=lambda r: (r[0], r[3]))  # global time order across users
    cuts = sorted(rng.choice(range(1, len(rows)), size=3, replace=False))
    batches = [rows[a:b] for a, b in zip([0] + list(cuts), list(cuts) + [len(rows)])]

    state = str(tmp_path / "state")
    for i, b in enumerate(batches):
        S.apply_scd2_batch(spark.createDataFrame(b, SCHEMA), i, state_dir=state)
    streamed = _canon(S.read_scd2_state(spark, state))
    batch = _canon(scd2_intervals(spark.createDataFrame(rows, SCHEMA)))
    assert streamed == batch
