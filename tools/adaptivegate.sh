#!/bin/bash
# Above-floor adaptive-parameter hash gate, re-runnable end-to-end
# (engine pass + DuckDB oracle compare). r10 sized the corpus so the
# oracle side took ~2.2 h; the current 10k-doc/10.2k-vector corpus keeps
# every parameter above its floor with the whole gate under ~15 min.
# Usage: tools/adaptivegate.sh [outdir=/tmp/graft_adaptive]
set -e
cd /root/repo
OUT="${1:-/tmp/graft_adaptive}"
t0=$(date +%s)
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" tools/run.sh AdaptiveGate "$OUT"
t1=$(date +%s)
echo "== adaptive engine pass: $((t1 - t0)) s"
python3 tools/selfcheck.py "$OUT-data" "$OUT"
t2=$(date +%s)
echo "== adaptive oracle pass: $((t2 - t1)) s (total $((t2 - t0)) s)"
