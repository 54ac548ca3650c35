#!/bin/bash
# Opportunistic scaling-sample collector for the noisy multi-tenant
# sandbox: only measure when load average is low, append JSONL samples;
# BENCH/BASELINE.md reports min-of-samples per cpu config.
cd /root/repo
OUT=BENCH/scaling_samples.jsonl
N_DOCS=${1:-8000000}
ROUNDS=${2:-30}
for i in $(seq "$ROUNDS"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
  if [ "$LOAD" -lt 4 ]; then
    for C in 2 8 32; do
      R=$(timeout 700 python bench.py --validate-only --cpus "$C" --n-docs "$N_DOCS" --runs 1 2>/dev/null | tail -1)
      [ -n "$R" ] && echo "{\"load_at_start\": $LOAD, \"sample\": $R}" >> "$OUT"
    done
  else
    sleep 75
  fi
done
