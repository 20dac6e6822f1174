"""Structured-streaming maintenance operators (dedup / MERGE / SCD2).

Production deployments keep their snapshot state directory permanently;
the batch-parity plans (d19/q72/e33) instead build a THROWAWAY state
dir per invocation, so they must detach their result from the on-disk
parquet before the directory is removed — `detach_from_state` below.
"""

from __future__ import annotations

import atexit
import glob
import os
import posixpath
import shutil
import tempfile
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame


def detach_from_state(df: DataFrame, state_dir: str) -> DataFrame:
    """Eagerly materialize `df` off its on-disk state, then delete the
    state directory.

    ``localCheckpoint(eager=True)`` computes the result into executor
    block storage, cutting the plan's lineage to the snapshot parquet —
    after which the throwaway state dir can be removed without breaking
    the (lazy) DataFrame handed back to the caller.  Without this,
    every correctness sweep / bench run / determinism double-run leaked
    a ``/tmp`` state directory per invocation.
    """
    out = df.localCheckpoint(eager=True)
    shutil.rmtree(state_dir, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Shared time-sliced stream sources.
#
# The streaming parity rows (e37-e43) replay the events table as a
# file-source stream cut into time-range slices. Two fixed costs
# dominated their wall time: (a) every row re-ran the slicing jobs
# (bounds agg + one filtered write per slice) even though e38/e39 — and
# e41/e42's right side — replay IDENTICAL arrival constructions, and
# (b) replay order rested on filesystem mtime granularity (Spark's file
# source orders by modification time with path as tie-break; two slices
# written within the same clock tick could reorder, shifting watermark
# progression and flaking a bitwise oracle). The helpers below fix
# both: slice ONCE per (key, sf_dir) per process into a cached
# directory, then hardlink the part files into each query's fresh
# source dir with explicitly pinned, strictly-increasing mtimes.
# ---------------------------------------------------------------------------

#: (key, abspath(sf_dir)) -> (cache_root, meta). Process-lifetime cache;
#: directories are removed at interpreter exit.
_SLICE_CACHE: dict[tuple[str, str], tuple[str, object]] = {}


def _purge_slice_cache() -> None:  # pragma: no cover - exit hook
    for root, _ in _SLICE_CACHE.values():
        shutil.rmtree(root, ignore_errors=True)
    _SLICE_CACHE.clear()


atexit.register(_purge_slice_cache)


@contextmanager
def state_shuffle(spark, n: int = 8):
    """Bound state-store parallelism for a throwaway parity stream.

    A streaming query creates (#shuffle partitions) state-store
    instances PER stateful operator PER micro-batch; the parity rows
    run 3–5 micro-batches over kB-to-MB-scale slices, where 32
    partitions' worth of store open/snapshot/commit is pure fixed
    overhead. 8 keeps the rows parallel while cutting that overhead 4×.
    Production streams at real volume should NOT use this — there the
    state partition count must match data volume, and it is frozen
    into the checkpoint at first start (which is also why e40 wraps
    BOTH incarnations: recovery must see the same count).

    Results are unaffected: partitioning only routes keys to stores,
    and every parity aggregate is exact (decimal/bigint).
    """
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def shared_slices(key: str, sf_dir: str, build) -> tuple[str, object]:
    """Build-once cache for a parity row's slice files.

    ``build(root)`` must write each slice's parquet under
    ``root/s{i:02d}`` (one ``coalesce(1)`` write per slice) and return
    any metadata the stream construction needs (watermark delay, cut
    points, ...; use the string ``"EMPTY"`` for an empty source). The
    result is memoized per (key, sf_dir) for the life of the process,
    so N parity rows over the same arrival construction pay the Spark
    slicing jobs once.
    """
    k = (key, os.path.abspath(sf_dir))
    hit = _SLICE_CACHE.get(k)
    if hit is not None and os.path.isdir(hit[0]):
        return hit
    root = tempfile.mkdtemp(prefix=f"slices_{key}_")
    try:
        meta = build(root)
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise
    _SLICE_CACHE[k] = (root, meta)
    return root, meta


def slice_dir(root: str, i: int) -> str:
    """Canonical subdir for slice ``i`` under a ``shared_slices`` root."""
    return posixpath.join(root, f"s{i:02d}")


def deploy_slices(root: str, src: str, which=None) -> None:
    """Materialize cached slices into a stream-source dir, in order.

    Copies the part files of each selected slice into ``src`` under
    lexically-ordered names and pins strictly-increasing mtimes — write
    order therefore IS replay order for the file stream source,
    independent of filesystem timestamp granularity. (Copy, not
    hardlink: linked inodes would share mtimes across deployments, so a
    later query's re-pin could reorder an earlier still-draining
    stream's listing.) ``which`` selects slice indices (default: all,
    ascending); phased-arrival rows (e40-style restarts) call this
    twice with disjoint index lists — monotonic wall clock keeps the
    later phase's pinned mtimes above the earlier one's.
    """
    os.makedirs(src, exist_ok=True)
    subs = sorted(d for d in os.listdir(root) if d.startswith("s"))
    if which is not None:
        wanted = {f"s{i:02d}" for i in which}
        subs = [d for d in subs if d in wanted]
    base = time.time()
    for i, d in enumerate(subs):
        ts = base + i
        for f in sorted(glob.glob(posixpath.join(root, d, "*.parquet"))):
            dst = posixpath.join(src, f"{d}_{posixpath.basename(f)}")
            shutil.copyfile(f, dst)
            os.utime(dst, (ts, ts))
