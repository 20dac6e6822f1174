"""Per-query job/stage profiling harness (guide §1: measure first).

Runs the named queries (or the N slowest from a bench JSON) through the
noop sink with the Spark UI enabled, labels every job with its query
name, then pulls the UI REST API to attribute wall time to jobs/stages
per query. Prints a compact per-query breakdown: total wall, number of
Spark jobs, sum of job times, and the slowest stages with their names.

Usage:
  python scripts/profile_queries.py q01 d19 e33         # specific rows
  python scripts/profile_queries.py --prime             # prime fixtures first
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    prime = "--prime" in sys.argv

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from censo_escolar_spark.session import get_spark

    spark = get_spark(
        "censo-profile", **{"spark.ui.enabled": "true", "spark.ui.port": "4047"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up
    run(queries["q01_pricing_summary"](spark, sf_dir))

    if prime:
        from censo_escolar_spark.plans import fixtures

        t0 = time.perf_counter()
        sc.setJobDescription("PRIME")
        fixtures.prime(spark, sf_dir)
        print(f"fixtures.prime: {time.perf_counter() - t0:.2f}s")

    wanted = [n for n in sorted(queries) if any(n.startswith(a) for a in args)]
    walls: dict[str, float] = {}
    for name in wanted:
        short = name.split("_", 1)[0]
        sc.setJobDescription(f"Q::{short}")
        t0 = time.perf_counter()
        run(queries[name](spark, sf_dir))
        walls[name] = time.perf_counter() - t0
        sc.setJobDescription(None)

    app_id = sc.applicationId
    base = f"http://localhost:4047/api/v1/applications/{app_id}"

    def get(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    jobs = get("/jobs?status=succeeded") + get("/jobs?status=failed")
    by_q: dict[str, list] = {}
    for j in jobs:
        desc = j.get("description") or ""
        if desc.startswith("Q::") or desc == "PRIME":
            by_q.setdefault(desc, []).append(j)

    stages = {s["stageId"]: s for s in get("/stages?status=complete")}

    for name in wanted + (["PRIME"] if prime else []):
        short = name.split("_", 1)[0] if name != "PRIME" else "PRIME"
        key = f"Q::{short}" if name != "PRIME" else "PRIME"
        qjobs = by_q.get(key, [])
        job_sum = 0.0
        stage_rows = []
        for j in qjobs:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second resolution from the GMT suffix
            ms0 = float(j["submissionTime"][20:23] or 0) / 1000
            ms1 = float(j["completionTime"][20:23] or 0) / 1000
            dur = (time.mktime(t1) + ms1) - (time.mktime(t0) + ms0)
            job_sum += dur
            for sid in j["stageIds"]:
                if sid in stages:
                    s = stages[sid]
                    stage_rows.append(
                        (
                            s.get("executorRunTime", 0) / 1000.0,
                            sid,
                            s["name"].split("\n")[0][:60],
                            s.get("numTasks", 0),
                            s.get("shuffleWriteBytes", 0),
                        )
                    )
        wall = walls.get(name, float("nan"))
        print(
            f"\n=== {name}: wall={wall:.2f}s jobs={len(qjobs)} "
            f"job_time_sum={job_sum:.2f}s"
        )
        for rt, sid, sname, ntasks, swb in sorted(stage_rows, reverse=True)[:8]:
            print(
                f"  stage {sid}: exec_run={rt:.2f}s tasks={ntasks} "
                f"shufW={swb / 1e6:.1f}MB  {sname}"
            )

    print("\nwalls:", json.dumps({k: round(v, 2) for k, v in walls.items()}))


if __name__ == "__main__":
    main()
