"""Render SCALEBENCH.md from two bench runs: the split-layout 1x
baseline (.scale/sf0.1s) and the 10x probe (.scale/sf1).

Usage: make_scalebench.py <sf0.1s.log> <sf1.log> — each the stdout of a
bench.py run (the queries_full line is used).
"""

from __future__ import annotations

import json
import sys


def _full(path: str) -> dict[str, float]:
    for line in open(path):
        line = line.strip()
        if line.startswith('{"queries_full"'):
            return json.loads(line)["queries_full"]
    raise SystemExit(f"no queries_full line in {path}")


def main() -> None:
    base, probe = _full(sys.argv[1]), _full(sys.argv[2])
    rows = []
    for k in sorted(set(base) & set(probe)):
        b, p = base[k], probe[k]
        if b < 0 or p < 0:
            rows.append((float("inf"), k, b, p, None))
            continue
        # floor tiny baselines: ratios of sub-300ms timings are job-
        # overhead noise, not scaling signal
        ratio = p / max(b, 0.3)
        rows.append((ratio, k, b, p, ratio))
    rows.sort(reverse=True)
    total_b = sum(b for _, _, b, p, _ in rows if b >= 0 and p >= 0)
    total_p = sum(p for _, _, b, p, _ in rows if b >= 0 and p >= 0)

    out = []
    out.append("# SCALEBENCH — empirical 10× scaling probe (round 10)\n")
    out.append(
        "Per-query wall time at 1× vs 10× data, same 32-file parquet\n"
        "layout for both sides (`scripts/make_scale_probe.py`: the 10×\n"
        "probe replicates sf0.1 with FK-consistent key offsets,\n"
        "token-namespaced document replicas, and rotated embedding\n"
        "replicas, so dedup/ANN neighborhood structure scales honestly\n"
        "instead of degenerating into replica cliques). local[32],\n"
                "24 GiB heap, idle host, min of two runs per layout — treat\n"
        "±30% as noise;\n"
        "the signal is the ORDER of the ratios, not their decimals.\n"
        "Ratios computed against max(baseline, 0.3 s): sub-300 ms\n"
        "baselines are fixed job overhead, not data-proportional work.\n"
    )
    out.append(
        f"\nTotals: {total_b:.1f} s at 1× → {total_p:.1f} s at 10× "
        f"(**{total_p / total_b:.1f}× for 10× data**).\n"
    )
    out.append(
        "\n## Flag criterion and findings\n\n"
        "A query is flagged when wall time grows MATERIALLY faster than\n"
        "the data (ratio ≫ 10 for 10× rows); a sub-10 ratio is at-or-\n"
        "below linear. Probe round findings (fixed in-round, re-measured\n"
        "in this table):\n\n"
        "- **m10** — the record-level Hamming band join put every staged\n"
        "  dup clique through all 4 bands (candidates ∝ clique², ×4,\n"
        "  then a record-pair distinct): 201 s. Rewritten two-level\n"
        "  (bands over DISTINCT hash values + output-proportional\n"
        "  expansion): 45 s. m10's OUTPUT is quadratic by construction\n"
        "  (fixed 40 dup classes of growing size → ~100× pairs at 10×),\n"
        "  so its residual ratio tracks output rows, not wasted work.\n"
        "- **q49** — (brand, length-band) blocking is quadratic in block\n"
        "  size under fixed brand cardinality: 36→50 s at 10×. Rewritten\n"
        "  as lossless PassJoin segment filtering (candidates scale with\n"
        "  true-match density): the operator runs in ~6.5 s at 10×; the\n"
        "  residual time is the deterministic-gate global sort of the\n"
        "  ~11M output pairs (eager-cut so the pipeline runs once).\n"
        "- **d07/s03** (hyperplane-LSH pair generation) — a FIXED band\n"
        "  width makes within-bucket candidates C(occupancy, 2), i.e.\n"
        "  quadratic in corpus size (d07 measured 17×: 5.2 → 91 s in\n"
        "  round 6). `lsh_bucketed_pairs` auto-sizes band width to hold\n"
        "  occupancy near a constant (bits ~ log₂ n, the FAISS-style\n"
        "  index-to-corpus sizing; identical vectors share every band\n"
        "  key at any width, so exact-dup recall stays 1), and — new in\n"
        "  round 7 — the band COUNT scales alongside (`auto_n_bands`:\n"
        "  minimal bands holding recall ≥ 0.95 at the cos-0.9 design\n"
        "  threshold; 4 bits → 4 bands, 7 bits → 8 bands), so tail\n"
        "  recall no longer silently degrades as bands widen.\n"
        "- **s05/s04/s13/s17** (IVF) — round 6 left the cell count FIXED\n"
        "  at the graded parameterization while the corpus grew (within-\n"
        "  cell pairs ~ C(occupancy, 2)); s05 measured 8.1× at 10×.\n"
        "  Fixed in round 7: `train_centroids` defaults to\n"
        "  `auto_n_centroids` = ⌈n / 512⌉ cells (floor 8 — every graded\n"
        "  fixture unchanged), holding cell occupancy constant; the\n"
        "  top-k probes pass nprobe=None (exhaustive at any cell count),\n"
        "  so results are invariant to the sizing. Re-measured in the\n"
        "  table below.\n"
        "- **m11** (round 7) — the cluster-label contract over m10's\n"
        "  pair graph: 100-TB consumers read O(images) labels, never the\n"
        "  O(clique²) pair list; m10's output-quadratic residual is a\n"
        "  property of the PAIR contract, and m11 is the scale-safe\n"
        "  consumer API for it.\n"
        "- **round-8 additions** — the retrieval stack (t39 BM25, s24\n"
        "  RRF, s25 maxsim, t40/t41 maintained lexical index), the\n"
        "  stored-index family completions (s26 filtered, s27 IVF-PQ\n"
        "  codes, s22/s23 incremental+deletes), the forget path (d22),\n"
        "  and the streaming parities (e38-e41) all measured 1.0-2.9× at\n"
        "  10× in their same-commit probes: the maintainer rows are\n"
        "  fixed-job-overhead-dominated, the retrieval rows ride pruned\n"
        "  posting/cell scans, and the index-build halves (s26/s27) are\n"
        "  the data-proportional cost by design.\n"
        "- **round-9 additions** — the restart parities (d23 dedup-store\n"
        "  mid-compaction crash, q74 bucket-store crash, s29 snapshot\n"
        "  reads), the session late-drop row (e43), the classifier lane\n"
        "  (t42 per-row scoring, t43 additive maintained stats), and the\n"
        "  filtered incremental probe (s28) are all maintainer/parity\n"
        "  shapes: per-batch work is O(batch) by construction and their\n"
        "  wall time is fixed job overhead (same-commit probe ratios in\n"
        "  the table). Round 9 also CUT the streaming-parity fixed cost\n"
        "  itself: slice sources are built once per (layout, sf) and\n"
        "  deployed per query with pinned mtimes, and state_shuffle\n"
        "  bounds throwaway parity streams to 8 state partitions —\n"
        "  e41 15.5 -> ~6.6 s, e42 13.6 -> ~5.0 s at sf0.1.\n"
        "- **round-10 additions** — the snapshot-read rows (d25 dedup\n"
        "  corpus, q75 MERGE table, joining s29/t44) read the SAME\n"
        "  pruned plans as the live views with a horizon predicate; the\n"
        "  stateful-timeout parity (e45) holds one int64 4-tuple per\n"
        "  live key; the incremental IVF-PQ store (s30) appends m-byte\n"
        "  codes per batch against frozen codebooks; the schema-\n"
        "  evolution row (s31) adds only a NULL-filled explicit-schema\n"
        "  read; the gated image ingest (m14) rejects inside the\n"
        "  batch's single decode. Round 10 also cut the maintainer\n"
        "  FIXTURE cost itself: the d19/t41/s23-s29/q72-family base\n"
        "  stores build once per process (plans/fixtures.py,\n"
        "  shared_state + hardlink clones), and the batch-apply parity\n"
        "  rows now run under state_shuffle(8) like the streaming ones\n"
        "  — idle sf0.1 bench 455.9 s at 230 queries (r9) -> ~444 s at\n"
        "  235 before d25/q75 landed.\n"
        "- Everything else is at/below linear; sub-second rows are\n"
        "  job-overhead-dominated.\n"
    )
    out.append(
        "\n## Bench methodology (round-over-round comparisons)\n\n"
        "BENCH_r*.json artifacts are SINGLE runs on a shared host —\n"
        "round 4's \"+5%\" and round 6's \"+19%\" artifact regressions\n"
        "both dissolved under idle-host retiming. The committed\n"
        "discipline: before reading any round-over-round delta, re-run\n"
        "`bench.py` n=3 on an idle host (load < 2) and compare PER-QUERY\n"
        "MEDIANS; only deltas that survive the medians are engine signal.\n\n"
        "Round-7 idle n=3 at HEAD (202 queries, sf0.1, local[32]):\n"
        "run totals 259.4 / 302.4 / 269.6 s, median-of-3 total 272.7 s.\n"
        "Against BENCH_r06's artifact the common-query ratio is 0.878 —\n"
        "i.e. the r6 artifact ran ~12% hot, confirming its +19%-vs-r5\n"
        "total was host load, not plans. Against BENCH_r05 the idle\n"
        "medians are +5.7% on common queries, concentrated ENTIRELY in\n"
        "the round-6 engine rewrites: d19/q72/e33 (bucketed versioned\n"
        "state: per-batch manifest + touched-bucket jobs, constant at\n"
        "fixture scale, the price of O(touched) write amplification at\n"
        "100 TB), c02 (single-pass curation materializes one checkpoint),\n"
        "and d07/s05 (corpus-sizing count jobs for the occupancy autos).\n"
        "Each is a deliberate, documented scale trade; no untouched\n"
        "query moved above noise.\n\n"
        "Round 8 regenerated this table at round-8 HEAD (min of two runs\n"
        "per layout, idle host) after 16 new queries landed with same-commit\n"
        "provisional rows; round 9 again at round-9 HEAD after 7 new\n"
        "queries and the streaming-parity harness amortization (a first\n"
        "round-9 regeneration ran under a transient external host load\n"
        "and was re-done idle). Round 10 regenerated it at round-10 HEAD\n"
        "(same min-of-2 idle discipline, full registry both layouts) after\n"
        "7 new queries (e45, s30, s31, t44, m14, d25, q75) and the\n"
        "maintainer-fixture amortization (shared base stores +\n"
        "state_shuffle on batch-apply parity rows) — so every new row\n"
        "has a same-commit 1x/10x pair, and the fixture savings and\n"
        "their 10x behavior are measured in the same table. At sf0.1\n"
        "(idle, single run) the round-over-round headline is 455.9 s /\n"
        "230 queries (r9 artifact) -> 444.3 s / 235 queries mid-round:\n"
        "the shared fixtures cut the d19/d22/d23 family ~13 s, t41 ~4 s,\n"
        "s28+s29 ~7 s, q74 ~5 s, while the five new maintainer rows\n"
        "added ~31 s of their own fixed overhead.\n"
    )
    out.append("\n| query | 1× sec | 10× sec | ratio |\n|---|---|---|---|\n")
    for ratio, k, b, p, r in rows:
        rs = "ERR" if r is None else f"{r:.1f}"
        out.append(f"| {k} | {b} | {p} | {rs} |\n")
    open("SCALEBENCH.md", "w").writelines(out)
    print(f"totals {total_b:.1f} -> {total_p:.1f}; worst:")
    for ratio, k, b, p, r in rows[:12]:
        print(f"  {k}: {b} -> {p} ({'ERR' if r is None else f'{r:.1f}x'})")


if __name__ == "__main__":
    main()
