"""Generate BENCH/BASELINE.md from collected scaling samples + a fresh
headline bench JSON. Uses min-per-config across samples (least-contended
estimate on this multi-tenant box; see collect_scaling.sh)."""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))


def load_samples(path: str) -> dict[int, dict]:
    best: dict[int, dict] = {}
    counts: dict[int, int] = defaultdict(int)
    if not os.path.exists(path):
        return {}
    for line in open(path):
        s = json.loads(line)["sample"]
        if s.get("mode") != "storage":
            continue
        c = s["cpus"]
        counts[c] += 1
        if c not in best or s["validate_sec"] < best[c]["validate_sec"]:
            best[c] = s
    for c in best:
        best[c]["n_samples"] = counts[c]
    return best


def main():
    samples_path = os.path.join(HERE, "scaling_samples.jsonl")
    bench_json_path = sys.argv[1] if len(sys.argv) > 1 else None
    best = load_samples(samples_path)
    bench = json.load(open(bench_json_path)) if bench_json_path else None

    lines = [
        "# BENCH/BASELINE — engine performance baseline (BASELINE.json metric)",
        "",
        "**Metric:** validated docs/sec, full rule-set (span kind/mutex/monotone",
        "+ doc rules + referential vs broadcast dim + salted uniqueness) over the",
        "deterministic synthetic `(doc_id, spans)` table, read from parquet",
        "storage (generation excluded). Two-parallelism-level scaling evidence in",
        "sandbox form (no real cluster): the SAME job on the SAME stored input at",
        "`local[N]` and `local[4N]`, fresh JVM per sample, min-of-samples per",
        "config (this box is multi-tenant; load averages 4-20 on 32 CPUs, so the",
        "minimum is the least-contended estimate — see collect_scaling.sh).",
        "",
        "## Throughput & scaling",
        "",
        "| config | wall sec | docs/sec | samples |",
        "|---|---|---|---|",
    ]
    n_docs = None
    for c in sorted(best):
        s = best[c]
        n_docs = s["n_docs"]
        lines.append(
            f"| local[{c}] | {s['validate_sec']:.1f} | {s['n_docs']/s['validate_sec']:,.0f} | {s['n_samples']} |"
        )
    lines.append("")
    if n_docs:
        lines.append(f"Input: {n_docs:,} documents (~{n_docs*6.5:,.0f} spans), 64 parquet files.")
    pairs = [(2, 8), (8, 32)]
    lines += ["", "| pair (N→4N) | speedup | scaling efficiency |", "|---|---|---|"]
    for lo, hi in pairs:
        if lo in best and hi in best:
            sp = best[lo]["validate_sec"] / best[hi]["validate_sec"]
            lines.append(f"| local[{lo}] → local[{hi}] | {sp:.2f}× | {sp/4:.2f} |")
    lines += [
        "",
        "Reference point: the reference service validates one document per",
        "sequential HTTP round-trip (gpt_intent_classifier.py:868-882) — on the",
        "order of 1-10 docs/sec. This engine's single-node throughput replaces",
        "that path outright; the distributed design (broadcast dims, salted",
        "aggregation, single fused scan, AQE) is what the 1000-executor story",
        "rests on.",
        "",
    ]
    if bench:
        lines += [
            "## Headline query bench (driver contract, sf0.1)",
            "",
            "| query | sec |",
            "|---|---|",
        ]
        for name, sec in bench["queries"].items():
            lines.append(f"| {name} | {sec} |")
        lines += [
            "",
            f"Total: {bench['value']}s; validate headline: "
            f"{bench.get('docs_per_sec', '?')} docs/sec at {bench.get('n_bench_docs', '?')} docs.",
        ]
    out = os.path.join(HERE, "BASELINE.md")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
