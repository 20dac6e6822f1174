"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <outdir> <suffix> <query-prefix> ...
Writes <outdir>/<short>_<suffix>.txt for each matching registry query.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    outdir, suffix, *prefixes = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from censo_escolar_spark.session import get_spark

    spark = get_spark("censo-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    for name in sorted(queries):
        short = name.split("_", 1)[0]
        if not any(short == p or name.startswith(p) for p in prefixes):
            continue
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{short}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
