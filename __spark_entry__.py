"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` exposes every implemented operator as (spark, sf_dir) ->
DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL the
driver hash-compares against at sf0.01.

The implementations live in the ``censo_escolar_spark`` package; this
module only aggregates the registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the plan modules populates the registry.
import censo_escolar_spark.plans.censo  # noqa: F401
import censo_escolar_spark.plans.events  # noqa: F401
import censo_escolar_spark.plans.multimodal  # noqa: F401
import censo_escolar_spark.plans.northstar  # noqa: F401
import censo_escolar_spark.plans.relational  # noqa: F401
import censo_escolar_spark.plans.sketches  # noqa: F401
from censo_escolar_spark.plans.registry import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, SMOKE_SF_DIR)


# The driver's correctness sweep walks queries() in dict order and grades
# only the first ~50 it has budget for (CORRECTNESS_r01-r03 are each a
# registration-order prefix).  Order the registry so the sweep window
# covers queries with NO green artifact row before the ones already
# proven green.  Provenance of "green": the union of green rows across
# CORRECTNESS_r01+r02+r03 (hash_match AND rows_match) — nothing else
# counts (judge re-runs at HEAD are advisory, not artifact rows).
_DRIVER_GREEN = {
    "c01",
    *(f"d{i:02d}" for i in (*range(1, 11), *range(15, 19))),
    *(f"e{i:02d}" for i in (*range(1, 10), *range(21, 33))),
    "g02", "m01", "m05", "m06", "m07",
    *(f"q{i:02d}" for i in range(1, 26) if i not in (13, 20)),
    "q60", "q61", *(f"q{i}" for i in range(63, 72)),
    *(f"s{i:02d}" for i in (*range(1, 7), *range(11, 19))),
    *(f"t{i:02d}" for i in (*range(1, 18), *range(26, 33))),
}

# Queries whose ONLY driver rows are red, fixed since — re-grade before
# everything else: q62 (hash red r3, decimal-exact 1.1 bump landed this
# round), m02 (graded `no_oracle` r1/r2; splitmix64 SQL oracle exists
# now), m03 (same oracle family, never graded), q13/q20 (hash red r1,
# fixed in round 2).
_REGRADE_FIRST = ["q62", "m02", "m03", "q13", "q20"]

# Round-4 additions needing their first artifact row. CORE carries the
# round's verdict asks (t19's new oracle, the three streaming-parity
# entries, mixture weights); EXTRA holds the optional additions — they
# rank BELOW the never-graded backlog so the ~50-query window still
# covers >=45 of the 65 backlog entries (the round-3 verdict target).
_R4_NEW_CORE = {"t19", "d19", "q72", "e33", "t33"}
_R4_NEW_EXTRA = {"s19", "d20", "s20", "e35", "m08"}


def _sweep_order(names) -> list[str]:
    def tier(n: str) -> int:
        p = n.split("_", 1)[0]
        if p in _REGRADE_FIRST:
            return _REGRADE_FIRST.index(p)
        base = len(_REGRADE_FIRST)
        if p in _R4_NEW_CORE:
            return base
        if p in _R4_NEW_EXTRA:
            return base + 4
        if p not in _DRIVER_GREEN:
            # never driver-graded: the relational surface (q26-q59) is
            # the most user-visible — grade it before the events tail,
            # then everything else (s07-s10, t18-t25, d11-d14, m04,
            # g01, c02), then this round's extras
            if p.startswith("q"):
                return base + 1
            if p.startswith("e"):
                return base + 2
            return base + 3
        return base + 5  # green driver artifact row exists

    order = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (tier(n), order[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _sweep_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (where expressible)."""
    return {n: ORACLE[n] for n in _sweep_order(QUERIES) if n in ORACLE}
