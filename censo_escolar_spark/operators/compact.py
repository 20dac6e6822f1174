"""Latest-by-key compaction (CDC / changelog -> snapshot).

The reference's load stage rebuilds full snapshots (drop + recreate,
load_external_tables.sql:3-55); a changelog-shaped input needs the
complementary operator: collapse many versions of a key to the single
newest one. This is the standard "compaction" step of any incremental
100 TB table (CDC ingest, upsert merge, event-log snapshot).

Scale shape — aggregation, NOT a window: ``row_number() = 1`` over a
per-key window sorts every version of every key (full shuffle of all
payload bytes, then a per-partition sort). ``max_by(payload, version)``
is an ordinary aggregate: partial aggregation combines map-side, so
each input partition ships at most ONE candidate row per key it holds —
on a changelog with many updates per key that is a large constant-factor
shuffle reduction, and there is no sort at all. AQE handles skewed keys
(a hot key still reduces tree-wise).

Determinism: the version expression must be a total order per key; pass
a tie-breaker (e.g. a unique event id) so two rows can never compare
equal. Struct comparison is lexicographic field-by-field in both Spark
and DuckDB/ANSI (``ORDER BY a, b``), so results are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str | Column],
    *,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the row with the greatest ``order_cols`` tuple.

    Output columns: ``key_cols`` then ``payload_cols`` (default: every
    non-key column), original names preserved.
    """
    if payload_cols is None:
        payload_cols = [c for c in df.columns if c not in key_cols]
    version = F.struct(*order_cols)
    winner = F.max_by(F.struct(*payload_cols), version).alias("__w")
    out = df.groupBy(*key_cols).agg(winner)
    return out.select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload_cols])
