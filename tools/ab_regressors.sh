#!/bin/bash
# Generic same-protocol bench A/B: adjudicate driver-run regressions
# against the tree that produced the baseline BENCH (CLAUDE.md rule).
# Interleaved legs (head base head base ...) so host-noise windows hit
# both trees; compare min-over-legs per tree. Subset lines are
# full-precision (Bench emits fmtSeconds under SPARK_GRAFT_BENCH_ONLY).
#
# Usage:
#   tools/ab_regressors.sh <base_ref> <only> [out_dir] [legs] [head_ref]
#   e.g. tools/ab_regressors.sh 5e13cd3 "s10,p23,d19" /tmp/ab_r16 3
#
# head_ref (optional): pin the "head" side to a worktree at that ref
# instead of the live /root/repo working tree — REQUIRED when editing
# the repo while the A/B runs, or head legs silently measure a moving
# tree (r17).
#
# NOTE: <only> matches FULL query names by prefix, not bench display
# keys — the board's "m3" row is query m03_*, so pass "m03" (zero-
# padded), never the display key (r16: "m3,p3,d9" silently matched
# nothing and the first A/B batch ran 3 rows instead of 6).
#
# <base_ref> = the commit the baseline BENCH_r{N}.json measured (the
# round-N "verdict/advice/correctness/bench" commit's tree).
set -euo pipefail
BASE_REF="${1:?usage: ab_regressors.sh <base_ref> <only> [out] [legs]}"
ONLY="${2:?need a comma-separated query prefix list}"
OUT="${3:-/tmp/ab_${BASE_REF}}"
LEGS="${4:-3}"
HEAD_REF="${5:-}"
BASE_TREE="/tmp/graft_ab_${BASE_REF}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
mkdir -p "$OUT"
if [ ! -d "$BASE_TREE" ]; then
  echo "[ab] creating baseline worktree $BASE_TREE at $BASE_REF" >&2
  git -C /root/repo worktree add "$BASE_TREE" "$BASE_REF" >&2
fi
HEAD_TREE=/root/repo
if [ -n "$HEAD_REF" ]; then
  HEAD_TREE="/tmp/graft_ab_head_${HEAD_REF}"
  if [ ! -d "$HEAD_TREE" ]; then
    echo "[ab] creating pinned head worktree $HEAD_TREE at $HEAD_REF" >&2
    git -C /root/repo worktree add "$HEAD_TREE" "$HEAD_REF" >&2
  fi
fi
run_leg() {  # $1=tree dir, $2=tag, $3=round
  local out="$OUT/${2}_${3}.json"
  # '|| true': under pipefail a leg whose output has no '"metric"' line
  # makes grep (and the subshell) exit non-zero, which would abort the
  # script BEFORE the intended empty-output diagnostic below (r15 ADVICE)
  ( cd "$1" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$ONLY" \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' > "$out" ) || true
  [ -s "$out" ] || { echo "[ab] FATAL: leg $2 round $3 wrote empty $out" >&2; exit 1; }
  echo "[ab] leg $2 round $3 done: $(cat "$out")"
}
for r in $(seq 1 "$LEGS"); do
  run_leg "$HEAD_TREE" head "$r"
  run_leg "$BASE_TREE" base "$r"
done
echo "[ab] all legs complete — compare min-over-legs per tree in $OUT"
