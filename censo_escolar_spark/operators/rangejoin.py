"""Bounded range (interval) join — an operator Spark lacks natively.

For each left row, attach every right row with the same key and
``right_ts`` within ``[left_ts + lower, left_ts + upper]`` (bounds
inclusive, in seconds; ``lower < upper``). The as-of join
(operators/asof.py) picks the single nearest match; this returns ALL
matches in a bounded window — the shape behind "views in the 5 minutes
before each click", sensor alignment, and stream-stream interval joins
(streaming/windows.py implements the streaming twin with watermarks).

Why not ``left.join(right, key & between)``: Catalyst plans a non-equi
condition as a broadcast-nested-loop (or a sort-merge over the key alone
with a post-filter when the equi-key is present — correct, but every
(key-partition) pair is still materialized before filtering, and a hot
key degenerates to O(n·m)). The scale-correct plan *bucketizes time*:

1. bucket width W = upper - lower, so a left row's window
   ``[t+lower, t+upper]`` overlaps at most TWO width-W buckets;
2. replicate each left row to those two bucket ids (2× the small,
   fixed-width probe columns — not the payload);
3. each right row belongs to exactly ONE bucket — so an equi-join on
   (key, bucket) sees every true pair exactly once: no dedup pass;
4. the exact ``between`` predicate filters the candidates.

Shuffle volume is 2|L| + |R| rows keyed by (key, bucket) — time-locality
splits hot keys across buckets, which is exactly what AQE cannot do for
a post-filtered sort-merge join on the key alone.

The reference has no joins beyond a tiny equi-join (SURVEY §2c,
transform.py:159); this is a north-star operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
) -> DataFrame:
    """Inner interval join: pairs where ``l.left_ts + lower <= r.right_ts
    <= l.left_ts + upper`` and the key columns match. Column names (other
    than the key) must not collide. For left-outer semantics, aggregate
    the pairs and left-join back onto ``left`` (see plans/events.py e05)
    — outer-joining the bucket replicas directly would fabricate rows.
    """
    if not upper > lower:
        raise ValueError(f"need lower < upper, got [{lower}, {upper}]")
    keys = [on] if isinstance(on, str) else list(on)
    collisions = (set(left.columns) & set(right.columns)) - set(keys)
    if collisions:
        raise ValueError(f"non-key columns collide: {sorted(collisions)}")

    lo_us = int(round(lower * 1_000_000))
    hi_us = int(round(upper * 1_000_000))
    w_us = hi_us - lo_us

    # cast("timestamp") makes this NTZ-safe: parquet micros with no zone
    # arrive as TIMESTAMP_NTZ, which unix_micros rejects. Under the
    # engine's pinned UTC session zone (session.ensure_session_tuned) the
    # NTZ->LTZ cast is an exact, monotonic epoch interpretation; for LTZ
    # inputs the cast is a no-op.
    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt = F.unix_micros(F.col(right_ts).cast("timestamp"))

    first_bucket = F.floor((lt + F.lit(lo_us)) / F.lit(w_us))
    l2 = left.withColumn("__bucket", F.explode(F.array(first_bucket, first_bucket + 1)))
    r2 = right.withColumn("__bucket", F.floor(rt / F.lit(w_us)))

    return (
        l2.join(r2, on=keys + ["__bucket"], how="inner")
        .filter(rt.between(lt + F.lit(lo_us), lt + F.lit(hi_us)))
        .drop("__bucket")
    )
