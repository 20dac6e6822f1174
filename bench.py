"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
parallelism from $SPARK_GRAFT_CPUS (default 32). Each query is forced to
full materialization through the noop sink (no collect -> no driver
transfer skew, no count() projection pruning).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


#: Budget for the FINAL stdout line: the r4 driver captured exactly 2000
#: bytes of tail, so a 2000-char line + trailing newline pushed the
#: opening "{" out of the window (BENCH_r04 parsed:null, tail was the
#: full JSON minus its first byte). Keep a wide safety margin.
HEADLINE_BUDGET = 1500


def headline_line(
    timings: dict[str, float], sf, *, budget: int = HEADLINE_BUDGET
) -> str:
    """The bench's LAST stdout line: compact JSON under ``budget`` bytes.

    The driver parses only the tail of stdout, so this line must always
    fit and always be valid JSON. When the full per-query dict would
    blow the budget, it is trimmed to the slowest entries (the ones a
    reader acts on) with ``queries_truncated_to_slowest`` recording the
    cut; the headline metric/value/n_queries always cover ALL queries.
    Contract unit-tested in tests/test_bench_headline.py at the current
    registry size + synthetic growth."""
    total = round(sum(t for t in timings.values() if t >= 0), 2)
    headline = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": timings,
    }
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) > budget:
        slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
        while len(line) > budget and slowest:
            slowest.pop(next(reversed(slowest)))
            headline["queries"] = slowest
            headline["queries_truncated_to_slowest"] = len(slowest)
            line = json.dumps(headline, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label

    from censo_escolar_spark.session import get_spark

    spark = get_spark("censo_escolar_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warm-up (not timed).
    run(queries["q01_pricing_summary"](spark, sf_dir))

    # Python-worker warm-up (not timed), the Arrow-side analogue of the
    # JVM warm-up above: local[N] spawns one Python worker per core on
    # the FIRST vectorized-UDF stage, each paying the pandas/numpy
    # import (~4 s total for 32 workers, measured) — a one-time process
    # cost that otherwise lands on whichever Arrow query happens to run
    # first and reads as that row's regression. Workers are reused
    # afterwards (spark.python.worker.reuse default), so every timed row
    # sees the same warm state it would see mid-run.
    def _warm(batches):
        import numpy  # noqa: F401  # the import IS the warm-up
        import pandas  # noqa: F401

        yield from batches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    run(spark.range(0, 100 * cpus, 1, cpus).mapInPandas(_warm, "id long"))

    timings: dict[str, float] = {}

    # Shared maintainer-store fixture construction, timed as its OWN
    # line item: the maintainer parity families reuse process-lifetime
    # base stores (plans/fixtures.py), and without this the whole base
    # build lands on whichever family row runs first (round 10 charged
    # d19 13 s for stores d22/d23/d25 then reused). The total still
    # counts every second; the per-row numbers report steady state.
    from censo_escolar_spark.plans import fixtures

    t0 = time.perf_counter()
    try:
        fixtures.prime(spark, sf_dir)
        timings["fixtures"] = round(time.perf_counter() - t0, 2)
    except Exception as exc:
        timings["fixtures"] = -1.0
        print(f"bench error priming fixtures: {exc}", file=sys.stderr)

    # Keyed by the short query id (prefix before the first underscore:
    # "q01_pricing_summary" -> "q01"). Full names made the one-line JSON
    # ~3.4 kB, past the driver's output-capture window -> "parsed": null
    # in BENCH_r01/r02.json. Short ids keep the whole line under ~1.5 kB.
    for name in sorted(queries):
        short = name.split("_", 1)[0]
        t0 = time.perf_counter()
        try:
            run(queries[name](spark, sf_dir))
            timings[short] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # keep benching; a broken query shows as -1
            timings[short] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    # The driver captures only the TAIL of stdout (~2.9 kB in r01-r03)
    # and parses the last JSON line — a single line carrying all ~200
    # per-query timings exceeds the window, loses its "{"metric" prefix,
    # and lands as parsed:null. So: per-query detail first on its own
    # line (archival; may truncate harmlessly), then the compact
    # headline line LAST (see headline_line).
    print(json.dumps({"queries_full": timings}, separators=(",", ":")))
    print(headline_line(timings, sf))


if __name__ == "__main__":
    main()
