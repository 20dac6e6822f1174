"""Sequence packing: assign documents to fixed-capacity token bins.

Training-data pipelines concatenate tokenized documents into
fixed-length sequences (e.g. 2048 tokens) — "concatenation packing":
lay documents end to end in a deterministic order and cut every
``capacity`` tokens. A document whose tokens straddle a cut belongs to
more than one pack (it is split at training time). This operator
computes, per document, its pack span and offset — the shuffle-side
bookkeeping of a packing job; the actual token copy happens downstream
at write time.

Scale shape: packing is a prefix sum, inherently serial PER STREAM.
The scalable formulation runs many independent streams: documents are
routed to a stream (here: the caller's ``stream_cols``, e.g. language
— or a hash-salted ``pmod(xxhash64(id), k)`` for k× parallelism), and
the running-offset window partitions by stream. Each stream's window
is a partitioned sort, never a global one (the plan-quality gate bans
unpartitioned windows). Pack ids are per-stream; a global id is
``(stream, pack)`` — no coordination between streams is ever needed,
which is exactly why this shape survives 100 TB.

All arithmetic is integer (exact cross-engine): exclusive running sum
``s``, pack span [floor(s/C), floor((s+n-1)/C)] and offset ``s % C``.
Empty documents (n=0) occupy no tokens: they get the pack that starts
at their offset and span 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    *,
    capacity: int,
    stream_cols: list[str],
) -> DataFrame:
    """Concatenation-packing bookkeeping per document.

    Adds: ``pack_first``, ``pack_last`` (0-based pack ids within the
    stream), ``pack_offset`` (token offset inside the first pack),
    ``n_packs`` (packs spanned). Order within a stream is ``id_col``
    ascending — deterministic and engine-stable.
    """
    w = (
        Window.partitionBy(*stream_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.col(token_count_col).cast("long")
    s = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("long")
    first = F.floor(s / capacity)
    last = F.floor((s + F.greatest(n, F.lit(1)) - 1) / capacity)
    return df.select(
        *df.columns,
        first.alias("pack_first"),
        last.alias("pack_last"),
        (s % capacity).alias("pack_offset"),
        (last - first + 1).alias("n_packs"),
    )
