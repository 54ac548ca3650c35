#!/bin/bash
# Opportunistic scaling-sample collector (multi-tenant host): measure
# only when load is low; min-of-samples reported by BENCH/report.py.
cd /root/repo
OUT=BENCH/scaling_samples.jsonl
N_DOCS=${1:-8000000}
ROUNDS=${2:-30}
CPUS=${3:-"8 32"}
for i in $(seq "$ROUNDS"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
  if [ "$LOAD" -lt 3 ]; then
    for C in $CPUS; do
      R=$(timeout 700 python bench.py --validate-only --cpus "$C" --n-docs "$N_DOCS" --runs 1 2>/dev/null | tail -1)
      [ -n "$R" ] && echo "{\"load_at_start\": $LOAD, \"sample\": $R}" >> "$OUT"
    done
  else
    sleep 60
  fi
done
