"""Structured-streaming maintenance operators (dedup / MERGE / SCD2).

Production deployments keep their snapshot state directory permanently;
the batch-parity plans (d19/q72/e33) instead build a THROWAWAY state
dir per invocation, so they must detach their result from the on-disk
parquet before the directory is removed — `detach_from_state` below.
"""

from __future__ import annotations

import shutil

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
