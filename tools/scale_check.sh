#!/bin/bash
# Opt-in /verify stage: regenerate the 1x-vs-Nx scaling slope board
# (SCALE_NOTES.md) instead of leaving it a one-off campaign.
#
# Usage: tools/scale_check.sh [factor] [only]
#   factor  integer scale-up of /root/testdata/sf0.1 (default 10)
#   only    optional comma-separated query prefixes (e.g. d06,p06) to
#           restrict the bench board — a cheap spot-check of the queries
#           a round actually changed
#
# Output: one markdown slope table on stdout (and the two raw bench JSON
# lines under /tmp). Slopes >= factor are flagged: a query whose cost
# grows as fast as the data is scan-bound at best, super-linear at worst.
set -euo pipefail
cd "$(dirname "$0")/.."
FACTOR="${1:-10}"
ONLY="${2:-}"
SRC=/root/testdata/sf0.1
DST="/tmp/graft_scale_${FACTOR}x"
# regenerate when missing OR stale (the driver regenerates testdata in
# place; benching a scale-up of the PREVIOUS generation silently skews
# every slope)
if [ ! -d "$DST" ] || [ "$(find "$SRC" -newer "$DST" -print -quit 2>/dev/null)" ]; then
  echo "[scale_check] generating ${FACTOR}x data at $DST" >&2
  rm -rf "$DST"
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.tools.ScaleData $SRC $DST $FACTOR" >&2
fi
run_bench() { # dir out
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ITERS=2 \
    SPARK_GRAFT_BENCH_ONLY="$ONLY" sbt -batch "runMain graft.Bench" 2>&1 \
    | grep '"metric"' | tail -1 > "$2"
}
echo "[scale_check] bench 1x ($SRC)" >&2
run_bench "$SRC" /tmp/graft_bench_1x.json
echo "[scale_check] bench ${FACTOR}x ($DST)" >&2
run_bench "$DST" "/tmp/graft_bench_${FACTOR}x.json"
python3 tools/slope_table.py /tmp/graft_bench_1x.json "/tmp/graft_bench_${FACTOR}x.json" "$FACTOR"
