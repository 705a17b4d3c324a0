#!/bin/bash
# Round-14 task #1: A/B-adjudicate the r13 driver-run bench regressors
# (q44, s08, q41, t05, d14, p20, q16) at canary parity.
# Protocol per CLAUDE.md: git worktree at the r12 tree (8608bb8) vs HEAD,
# SPARK_GRAFT_BENCH_ONLY subset, interleaved legs (A B A B) so host-noise
# windows hit both trees, min-over-runs per leg.
set -u
ONLY="q44,s08,q41,t05,d14,p20,q16"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${1:-/tmp/ab_r14}"
mkdir -p "$OUT"
run_leg() {  # $1=tree dir, $2=tag, $3=round
  cd "$1" || exit 1
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$ONLY" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' \
    > "$OUT/${2}_${3}.json"
  echo "[ab] leg $2 round $3 done: $(cat "$OUT/${2}_${3}.json")"
}
for r in 1 2; do
  run_leg /root/repo head "$r"
  run_leg /tmp/graft_r12_tree r12 "$r"
done
echo "[ab] all legs complete"
