"""Strict local replica of the driver's correctness gate.

The driver converts both the Spark result and the DuckDB oracle result
to pandas, sorts columns by name, sorts rows, then hashes the values —
so a dtype or repr difference (Decimal vs float, int64 vs float64 from
HUGEINT, -0.0 vs 0.0) fails the hash even when `%.6f` canonicalization
matches. This script compares at that same strictness: identical
stringified cell values AND identical dtypes after sorting.

Usage: python tools/strict_parity.py [query ...]
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # stringify cells the way a hash of values would see them
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names):
    from intent_classifier_service_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("strict-parity", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = entry.oracle_sql()
    queries = entry.queries()
    targets = names or sorted(oracles)
    bad = []
    for name in targets:
        if name not in oracles:
            print(f"{name}: NO ORACLE")
            continue
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad.append(name)
            continue
        issues = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            issues.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        else:
            s_dt = {c: str(sdf[c].dtype) for c in sdf.columns}
            d_dt = {c: str(ddf[c].dtype) for c in ddf.columns}
            dt_diff = {c: (s_dt[c], d_dt[c]) for c in s_dt if s_dt[c] != d_dt[c]}
            if dt_diff:
                issues.append(f"dtypes {dt_diff}")
            if len(sdf) != len(ddf):
                issues.append(f"rows {len(sdf)} vs {len(ddf)}")
            else:
                cs, cd = canon(sdf), canon(ddf)
                neq = (cs != cd).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    issues.append(
                        f"values differ in {int(neq.sum())}/{len(cs)} rows; first:"
                        f"\n  spark:  {cs.iloc[i].to_dict()}"
                        f"\n  oracle: {cd.iloc[i].to_dict()}"
                    )
        if issues:
            print(f"{name}: FAIL  " + " | ".join(issues))
            bad.append(name)
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    print(f"\n{len(targets) - len(bad)}/{len(targets)} strict-green; failing: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
