"""Build the sf1 scale-probe dataset: 10 replicas of sf0.1 with
key-consistent offsets, written to .scale/sf1 (git-ignored).

The probe's purpose is empirical scaling ratios (SCALEBENCH.md): run
bench.py at sf0.1 and at this sf1 and compare per-query wall time. A
query whose time grows materially faster than the data is hiding a
super-linear shape.

Replication preserves the DISTRIBUTION, not just the row count:

- All FK chains stay intact — every key column of replica k is offset
  by k·OFFSET on both sides of each relationship (customer/orders,
  orders/lineitem, part+supplier/lineitem, events.user_id).
- region/nation are fixed dimensions (their keys appear as FK targets
  with a fixed domain) — copied once, not replicated.
- documents.text gets a per-replica TOKEN NAMESPACE (every token of
  replica k > 0 is suffixed `~k`): naive replication would give every
  doc a 10-clique of near-dups and turn the pair-generating dedup
  queries quadratic BY CONSTRUCTION, while word-permutation (the first
  attempt) is WORSE on a small synthetic vocabulary — random triples
  from a tiny vocab collide massively (measured: max shingle doc-freq
  13,410 and Σf² = 8.6e9 candidate pairs at 10×). Namespacing keeps
  each replica's internal token/shingle structure EXACTLY the original
  corpus's (planted near-dups included) and makes cross-replica
  overlap zero, so shingle frequencies — and every pair-generating
  term — scale precisely linearly with the data.
- part.p_name gets the same per-replica namespace suffix: q49's fuzzy
  matcher is value-level (candidates over DISTINCT names), so verbatim
  name replicas made every name a 10-record group and the distance-0
  OUTPUT quadratic by construction (measured 23× at 10×). The suffix
  shifts every name's length by the same 2 chars, so within-replica
  length-band blocking structure is exactly the base catalog's.
  p_brand stays fixed (TPC-H holds brand cardinality constant across
  SF — blocks legitimately grow with the catalog).
- embeddings are circularly ROTATED by k·5 positions per replica:
  norm-preserving but decorrelating, so the cosine-neighborhood
  structure (not a 10× duplicate cloud) is what scales.

Deterministic throughout (no RNG): replica k of any row is a pure
function of the row and k.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
_SCALE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)
# argv: [replicas] [dst_name] — default the 10x probe; `1 sf0.1s` builds
# the SAME-LAYOUT 1x baseline so sf1/sf0.1 ratios compare data volume,
# not file layout.
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = os.path.join(_SCALE_ROOT, sys.argv[2] if len(sys.argv) > 2 else "sf1")
OFFSET = 1_000_000_000

#: table -> columns that carry a replica key offset
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def _namespace_text(text: str, k: int) -> str:
    """Suffix every non-empty token with ``~<letter>`` (k=1 -> ``~a``).

    Letters only — a digit suffix would raise ``digit_ratio`` and flip
    the corpus-curation ``quality_keep`` gate for replica docs, deflating
    the 10x load the probe exists to measure. Empty tokens (space runs)
    are left as-is so the token-emptiness structure matches the base.
    """
    suffix = "~" + chr(ord("a") + k - 1)
    return " ".join(t + suffix if t else t for t in text.split(" "))


N_FILES = 32


def _write_split(tbl: pa.Table, dest: str) -> None:
    """Write as a DIRECTORY of N_FILES parquet parts (small row groups).

    A single-file single-row-group table scans as ONE Spark task no
    matter the size — the known fixture artifact (SCALE.md). The probe
    exists to measure scaling, so its layout must parallelize the way
    real data does: `<table>.parquet/` directories read fine with
    `spark.read.parquet` (and DuckDB via `<dir>/*.parquet` globs)."""
    shutil_rm = __import__("shutil").rmtree
    if os.path.isdir(dest):
        shutil_rm(dest)
    os.makedirs(dest)
    n = tbl.num_rows
    step = max(1, (n + N_FILES - 1) // N_FILES)
    for i, off in enumerate(range(0, n, step)):
        pq.write_table(
            tbl.slice(off, step),
            os.path.join(dest, f"part-{i:05d}.parquet"),
            row_group_size=max(1024, step // 4),
        )


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for t in FIXED:
        _write_split(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(t, "copied")
    for t, keys in KEYED.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        reps = []
        for k in range(REPLICAS):
            tbl = base
            if k > 0:
                for c in keys:
                    idx = tbl.schema.get_field_index(c)
                    shifted = pa.compute.add(tbl.column(c), k * OFFSET)
                    tbl = tbl.set_column(idx, c, shifted)
                if t == "documents":
                    idx = tbl.schema.get_field_index("text")
                    texts = [
                        _namespace_text(v.as_py(), k) for v in tbl.column("text")
                    ]
                    tbl = tbl.set_column(idx, "text", pa.array(texts, pa.string()))
                if t == "part":
                    idx = tbl.schema.get_field_index("p_name")
                    suffix = "~" + chr(ord("a") + k - 1)
                    names = [v.as_py() + suffix for v in tbl.column("p_name")]
                    tbl = tbl.set_column(idx, "p_name", pa.array(names, pa.string()))
                if t == "embeddings":
                    idx = tbl.schema.get_field_index("embedding")
                    col = tbl.column("embedding").combine_chunks()
                    rolled = [
                        np.roll(np.asarray(v.as_py()), k * 5).tolist()
                        if v.as_py() is not None
                        else None
                        for v in col
                    ]
                    tbl = tbl.set_column(
                        idx, "embedding", pa.array(rolled, col.type)
                    )
            reps.append(tbl)
        out = pa.concat_tables(reps)
        _write_split(out, f"{DST}/{t}.parquet")
        print(t, f"{base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    sys.exit(main())
