"""Incremental view maintenance (IVM) for join views — delta rules.

A materialized join view V = A ⋈ B updates under insert batches dA, dB
without recomputing the full join:

    dV = (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB)

(the standard delta rule; e.g. Griffin & Libkin, "Incremental
maintenance of views with duplicates", SIGMOD 1995). The maintained
view is V_old ∪ dV, identical to recomputing A' ⋈ B' from scratch —
which is exactly what the q66 oracle checks.

Scale shape: the three delta joins each put a DELTA (small) on one
side — broadcast when it fits — so maintenance cost scales with the
increment, not the view. The aggregate counterpart (algebraic partial
merge) lives in operators/rollup.py; this is the join half of the IVM
story. Deletes/updates extend the same rules with signed multiplicities
— out of scope here, by contract inserts-only (the append-only fact
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    base_a: DataFrame,
    base_b: DataFrame,
    delta_a: DataFrame,
    delta_b: DataFrame,
    on: str | list[str],
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Delta rows of the inner-join view under insert batches.

    Returns dV = (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB); union with the old
    view to maintain it. Delta sides are broadcast by default (the
    whole point of IVM is |delta| ≪ |base|).
    """
    maybe = F.broadcast if broadcast_deltas else (lambda df: df)
    return (
        maybe(delta_a).join(base_b, on)
        .unionByName(base_a.join(maybe(delta_b), on))
        .unionByName(maybe(delta_a).join(maybe(delta_b), on))
    )
