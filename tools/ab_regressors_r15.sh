#!/bin/bash
# Round-15 task #1: A/B-adjudicate the r14 driver-run bench regressors
# (s10, p23, d19, t17, t19, q51) at canary parity.
# Protocol per CLAUDE.md: git worktree at the r13-end tree (d1bd142, the
# code BENCH_r13 measured) vs HEAD, SPARK_GRAFT_BENCH_ONLY subset,
# interleaved legs (A B A B) so host-noise windows hit both trees,
# min-over-runs per leg.
#
# r14 ADVICE fixes over ab_regressors_r14.sh: set -e so a failed leg
# kills the run instead of printing "all legs complete" over empty
# JSON; the baseline worktree is created when absent; every leg's JSON
# is checked non-empty before the script claims success.
set -euo pipefail
ONLY="s10,p23,d19,t17,t19,q51"
BASE_REF="d1bd142"
BASE_TREE="/tmp/graft_r13_tree"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${1:-/tmp/ab_r15}"
LEGS="${2:-2}"
mkdir -p "$OUT"
if [ ! -d "$BASE_TREE" ]; then
  echo "[ab] creating baseline worktree $BASE_TREE at $BASE_REF" >&2
  git -C /root/repo worktree add "$BASE_TREE" "$BASE_REF" >&2
fi
run_leg() {  # $1=tree dir, $2=tag, $3=round
  local out="$OUT/${2}_${3}.json"
  ( cd "$1" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$ONLY" \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' > "$out" )
  [ -s "$out" ] || { echo "[ab] FATAL: leg $2 round $3 wrote empty $out" >&2; exit 1; }
  echo "[ab] leg $2 round $3 done: $(cat "$out")"
}
for r in $(seq 1 "$LEGS"); do
  run_leg /root/repo head "$r"
  run_leg "$BASE_TREE" r13 "$r"
done
echo "[ab] all legs complete"
