#!/bin/bash
# Opportunistic cross-JVM scaling-sample collector (multi-tenant host):
# run one interleaved single-vs-sharded pair only when load is low;
# results append to BENCH/crossjvm_samples.jsonl (min across samples is
# the least-contended estimate).
cd /root/repo
OUT=BENCH/crossjvm_samples.jsonl
N_DOCS=${1:-32000000}
ROUNDS=${2:-6}
for i in $(seq "$ROUNDS"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
  if [ "$LOAD" -lt 3 ]; then
    # --pin: per-worker cpuset isolation (see bench.py run_crossjvm) —
    # without it, 4 co-scheduled JVMs lose ~2x to scheduler migration
    # on this host even at zero steal, which starved every unpinned
    # sharded phase in rounds 4-5.
    R=$(timeout 1800 python bench.py --crossjvm --pin --n-docs "$N_DOCS" --repeats 1 2>/dev/null | tail -1)
    [ -n "$R" ] && echo "{\"load_at_start\": $LOAD, \"sample\": $R}" >> "$OUT"
  else
    sleep 120
  fi
done
