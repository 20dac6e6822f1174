"""Compare two arms of ab_bench.sh by per-row MIN across runs.

Usage: ab_compare.py <outdir> [threshold_sec]
Reads A*.json / B*.json (bench stdout: last line is the headline JSON,
first line is {"queries_full": {...}} with every row untruncated).
"""

from __future__ import annotations

import glob
import json
import sys


def rows(path: str) -> dict[str, float]:
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.startswith("{")]
    for ln in lines:
        d = json.loads(ln)
        if "queries_full" in d:
            return d["queries_full"]
    raise SystemExit(f"no queries_full in {path}")


def mins(paths: list[str]) -> dict[str, float]:
    out: dict[str, float] = {}
    for p in paths:
        for k, v in rows(p).items():
            if v < 0:
                print(f"WARN {p}: {k} errored ({v})")
                continue
            out[k] = min(out.get(k, 1e9), v)
    return out


def main() -> None:
    outdir = sys.argv[1]
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15
    a = mins(sorted(glob.glob(f"{outdir}/A*.json")))
    b = mins(sorted(glob.glob(f"{outdir}/B*.json")))
    common = sorted(set(a) & set(b))
    deltas = [(b[k] - a[k], k) for k in common]
    print(f"{'row':10} {'A(base)':>8} {'B(var)':>8} {'B-A':>7}")
    for d, k in sorted(deltas):
        if abs(d) >= thr:
            print(f"{k:10} {a[k]:8.2f} {b[k]:8.2f} {d:+7.2f}")
    ta, tb = sum(a.values()), sum(b.values())
    print(f"\nper-row-min totals: A={ta:.1f}s  B={tb:.1f}s  B-A={tb - ta:+.1f}s")
    print(f"rows |delta|>= {thr}: {sum(1 for d, _ in deltas if abs(d) >= thr)}"
          f" of {len(common)}")


if __name__ == "__main__":
    main()
