"""Extra benchmarks + plan capture for the optimization rounds.

NOT the driver contract (that is bench.py, frozen): this harness
isolates each declared query with the noop sink (guide §1.4 — times
the computation, not the sink or a count's column pruning), labels
jobs (§1.5), and dumps .explain("formatted") per query so plan claims
in OPTIMIZATION_r*.md are checkable offline.

Usage:
  python bench_extra.py --plans plans/r09 --suffix before
  python bench_extra.py --only lm_quality_scores,minhash_lsh_pairs \
      --plans plans/r09 --suffix after --runs 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all bench queries)")
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip the timed noop runs")
    args = ap.parse_args()

    import bench as B
    from intent_classifier_service_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=args.cpus)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    queries = B._headline_queries()
    if args.only:
        keep = set(args.only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}
        missing = keep - set(queries)
        if missing:
            print(f"unknown queries: {sorted(missing)}", file=sys.stderr)
            return 2

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    timings: dict[str, float] = {}
    samples: dict[str, list] = {}
    for run in range(max(1, args.runs)):
        for name, fn in queries.items():
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            if args.plans and run == 0:
                p = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
                with open(p, "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            if args.no_time:
                continue
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            samples.setdefault(name, []).append(sec)
            timings[name] = min(timings.get(name, float("inf")), sec)
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"queries": timings, "samples": samples,
                      "sf": args.sf_dir, "sink": "noop",
                      "runs": args.runs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
