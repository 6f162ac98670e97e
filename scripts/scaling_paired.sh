#!/bin/bash
# Affinity-isolated N-vs-4N scaling measurement (BASELINE.json north_rule).
#
# Each leg runs in its OWN JVM under a CPU-affinity mask matching its core
# count, so the JVM's GC/JIT/IO thread pools — which size themselves from
# the VISIBLE core count — scale with the leg, exactly as they would on a
# real n-core executor. (A shared 32-core-host JVM lets the local[8] leg
# borrow host-width GC threads, silently inflating its throughput.)
#
# Usage: scripts/scaling_paired.sh [nDocs] [rounds] [outMd]
set -e
cd "$(dirname "$0")/.."
NDOCS=${1:-96000}
ROUNDS=${2:-3}
OUT=${3:-BENCH/scaling_rows.md}
CSV=$(mktemp /tmp/scaling_raw.XXXX.csv)
sbt -batch compile > /dev/null 2>&1   # compile once, outside any mask

for r in $(seq 1 "$ROUNDS"); do
  for c in 8 32; do
    echo "[scaling-driver] round $r local[$c] (taskset 0-$((c-1)))"
    taskset -c 0-$((c-1)) env SPARK_DRIVER_MEM=24g \
      sbt -batch "runMain graft.app.ScalingBench level $c $NDOCS $CSV" \
      2>&1 | grep -E "\[scaling\]" || true
  done
done
sbt -batch "runMain graft.app.ScalingBench summarize $CSV $OUT" 2>&1 | grep -E "\[scaling\]|^\|"
echo "[scaling-driver] raw legs in $CSV"
