#!/bin/bash
# Round-5 SUPPLEMENTARY dedup scaling session (the first session's dedup
# pairs carried a measured mid-session co-tenant burst; this re-runs the
# same pre-registered estimator in a clean window, on the round's final
# code incl. the single-evaluation verify pass). Run EXCLUSIVELY.
set -u
cd /root/repo
TS=$(date -u +%Y%m%dT%H%M%SZ)
LOG=bench_logs/round5_dedup_session2_${TS}.log
steal() { # avg stolen cores over $1 seconds
  local d=${1:-10}
  local s1 s2
  s1=$(awk '/^cpu /{print $9}' /proc/stat); sleep "$d"
  s2=$(awk '/^cpu /{print $9}' /proc/stat)
  awk -v a="$s1" -v b="$s2" -v d="$d" 'BEGIN{printf "%.2f", (b-a)/100/d}'
}
{
echo "== round-5 supplementary dedup session $(date -u) head=$(git rev-parse --short HEAD) =="
echo "pre-check steal (60s):"
PRE=$(steal 60)
echo "steal_pre=$PRE"
if awk -v p="$PRE" 'BEGIN{exit !(p>=0.5)}'; then
  echo "GATE FAILED (steal >= 0.5) — aborting session"
  exit 1
fi
for i in 1 2 3 4; do
  echo "--- dedup pair $i ---"
  echo "dpair${i} steal_before=$(steal 10)"
  sbt -batch "runMain graft.ScalingBench run-dedup /tmp/graft_docs 2" 2>&1 | grep '"level"'
  sbt -batch "runMain graft.ScalingBench run-dedup /tmp/graft_docs 8" 2>&1 | grep '"level"'
  echo "dpair${i} steal_after=$(steal 10)"
done
echo "== session done $(date -u) =="
} 2>&1 | tee "$LOG"
