#!/bin/bash
# Cold-JVM full-bench A/B driver: alternates variants (env toggles) so
# host noise spreads over both arms; per-row mins are compared offline.
# Usage: ab_bench.sh <outdir> <n_pairs> <VAR=value ...>
# Arm A = baseline env, arm B = baseline + the given VAR=value settings.
set -u
outdir=$1; shift
pairs=$1; shift
mkdir -p "$outdir"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
for i in $(seq 1 "$pairs"); do
  echo "=== pair $i arm B ($*) $(date +%T)"
  env "$@" python bench.py >"$outdir/B$i.json" 2>"$outdir/B$i.err"
  echo "rc=$? $(tail -c 120 "$outdir/B$i.json")"
  echo "=== pair $i arm A (baseline) $(date +%T)"
  python bench.py >"$outdir/A$i.json" 2>"$outdir/A$i.err"
  echo "rc=$? $(tail -c 120 "$outdir/A$i.json")"
done
