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
import threading
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

#: (key, abspath(sf_dir), fingerprint) -> (cache_root, meta).
#: Keys and consumers assume a SEQUENTIAL harness (the driver sweep,
#: bench, and pytest all run rows one at a time in-process): two rows
#: deploying into one shared src concurrently could re-pin mtimes under
#: a still-draining stream (deploy_slices skips content-identical
#: files, which covers the sequential re-deploy case, not true races).
#: Process-lifetime cache; directories are removed at interpreter exit.
#: The fingerprint (stat of every file under sf_dir) means regenerating
#: the data under sf_dir within one process invalidates the cache
#: instead of silently serving stale slices to later parity rows.
_SLICE_CACHE: dict[tuple[str, str, int], tuple[str, object]] = {}


def _dir_fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of a data dir: sha256 over every file's
    (relpath, mtime_ns, size). Pure stat calls — no reads — so it costs
    microseconds per table dir and catches in-process regeneration.
    Collision-resistant by construction (unlike Python's built-in
    ``hash``, whose 64-bit in-process collisions could silently serve a
    stale fixture); the remaining blind spot is inherent to stat-only
    fingerprints — a rewrite that preserves both mtime_ns and size is
    undetected."""
    import hashlib

    acc: list[tuple[str, int, int]] = []
    for root, _dirs, files in os.walk(sf_dir):
        rel = os.path.relpath(root, sf_dir)
        for f in files:
            st = os.stat(os.path.join(root, f))
            acc.append((posixpath.join(rel, f), st.st_mtime_ns, st.st_size))
    return hashlib.sha256(repr(sorted(acc)).encode()).hexdigest()


def _purge_slice_cache() -> None:  # pragma: no cover - exit hook
    for root, _ in _SLICE_CACHE.values():
        shutil.rmtree(root, ignore_errors=True)
    _SLICE_CACHE.clear()


atexit.register(_purge_slice_cache)


@contextmanager
def state_shuffle(spark, n: int = 4):
    """Bound state-store parallelism for a throwaway parity stream.

    A streaming query creates (#shuffle partitions) state-store
    instances PER stateful operator PER micro-batch; the parity rows
    run 3–5 micro-batches over kB-to-MB-scale slices, where 32
    partitions' worth of store open/snapshot/commit is pure fixed
    overhead. 4 keeps the rows parallel while cutting that overhead 8×
    (round 11 measured the per-stream floor at 8/4/2 partitions:
    1.47/1.25/1.32 s warm — 4 is the knee).
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


#: Per-fixture-key build locks: the parallel priming pass (plans/
#: fixtures.prime) runs independent family chains on driver threads,
#: and two chains may depend on the SAME sub-fixture (cdc_wave_slices
#: feeds both the streamed merge base and the compacted merge base) —
#: without the lock both threads would miss the cache and build
#: duplicate slicing jobs.
_FIXTURE_LOCKS: dict = {}
_FIXTURE_LOCKS_GUARD = threading.Lock()


def _shared_fixture(key: str, sf_dir: str, build) -> tuple[str, object]:
    k = (key, os.path.abspath(sf_dir), _dir_fingerprint(sf_dir))
    with _FIXTURE_LOCKS_GUARD:
        lock = _FIXTURE_LOCKS.setdefault(k, threading.Lock())
    with lock:
        hit = _SLICE_CACHE.get(k)
        if hit is not None and os.path.isdir(hit[0]):
            return hit
        root = tempfile.mkdtemp(prefix=f"fixture_{key}_")
        try:
            meta = build(root)
        except BaseException:
            shutil.rmtree(root, ignore_errors=True)
            raise
        _SLICE_CACHE[k] = (root, meta)
        return root, meta


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
    return _shared_fixture(key, sf_dir, build)


def shared_state(key: str, sf_dir: str, build) -> tuple[str, object]:
    """Build-once cache for a maintainer parity row's STATE fixture —
    ``shared_slices`` generalized to stored-index / checkpoint trees.

    ``build(root)`` populates ``root`` with whatever the fixture is (a
    batch store's state dir, or a full src/ckpt/state streaming root)
    and returns any metadata later consumers need. The result is
    memoized per (key, sf_dir, content-fingerprint) for the life of the
    process, so the N rows of a maintainer family (d19/d22/d23,
    t40/t41/t44, s23/s28/s29, q72/q74) pay the shared base-store
    construction ONCE.

    Consumers must treat the cached tree as IMMUTABLE: rows that only
    probe it read it in place (and detach with ``detach``, never
    ``detach_from_state`` — deleting the cache would break later rows);
    rows that extend or mutate it (more batches, staged crashes, new
    checkpoints) work on a ``clone_state`` hardlink clone. This is a
    BENCH-HARNESS amortization exactly like ``shared_slices``: a
    production maintainer owns its one state dir for its whole life and
    never clones it.
    """
    return _shared_fixture(key, sf_dir, build)


def link_tree(src: str, dst: str) -> None:
    """Recursively hardlink ``src``'s files into ``dst`` (directories
    recreated; cross-device falls back to copy). Safe for Spark state /
    checkpoint trees because nothing ever mutates those files IN PLACE
    — parquet data, offset logs, and compaction temps are all
    create-then-rename — so a clone shares inodes but owns its own
    directory entries and may add, replace, or delete files freely
    without affecting the cached original."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        tgt = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(tgt, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(tgt, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copyfile(s, d)


def clone_state(cache_root: str, *, prefix: str = "stateclone_") -> str:
    """Hardlink-clone a ``shared_state`` fixture into a fresh temp dir
    the caller owns (and must remove). Clone, don't share: restart
    parities mutate checkpoints and stage crashes, and two rows folding
    the same store would race."""
    dst = tempfile.mkdtemp(prefix=prefix)
    link_tree(cache_root, dst)
    return dst


def detach(df: DataFrame) -> DataFrame:
    """Materialize ``df`` off whatever on-disk state its plan reads —
    the shared-cache variant of ``detach_from_state``: the cache
    outlives the query, so nothing is deleted."""
    return df.localCheckpoint(eager=True)


#: abspath(src) -> highest mtime ever pinned into that stream-source
#: dir. Keeps phased deployments strictly ordered without trusting the
#: wall clock to be monotonic.
_LAST_PINNED: dict[str, float] = {}


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
    twice with disjoint index lists. Ordering across phases does NOT
    rest on the wall clock (``time.time()`` is not monotonic — an NTP
    step backward, or two phases inside one second, could otherwise
    pin a later phase at or below an earlier one): the last pinned
    mtime is tracked per destination dir and each deployment starts
    strictly above it.
    """
    os.makedirs(src, exist_ok=True)
    subs = sorted(d for d in os.listdir(root) if d.startswith("s"))
    if which is not None:
        wanted = {f"s{i:02d}" for i in which}
        subs = [d for d in subs if d in wanted]
    import filecmp

    src_key = os.path.abspath(src)
    base = max(time.time(), _LAST_PINNED.get(src_key, 0.0) + 1.0)
    last_pinned = None
    for i, d in enumerate(subs):
        ts = base + i
        for f in sorted(glob.glob(posixpath.join(root, d, "*.parquet"))):
            dst = posixpath.join(src, f"{d}_{posixpath.basename(f)}")
            # idempotent re-deploy (a shared-fixture row deploying a
            # slice an earlier row already placed): a content-identical
            # file keeps its live, already-ordered mtime instead of
            # being re-pinned under a possibly still-listing stream
            if os.path.exists(dst) and filecmp.cmp(f, dst, shallow=False):
                continue
            shutil.copyfile(f, dst)
            os.utime(dst, (ts, ts))
            last_pinned = ts
    if last_pinned is not None:
        _LAST_PINNED[src_key] = max(
            _LAST_PINNED.get(src_key, 0.0), last_pinned
        )
