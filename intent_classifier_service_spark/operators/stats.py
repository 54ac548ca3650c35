"""Per-partition column statistics (north rule: null rate, min/max,
approx-distinct via HyperLogLog sketches merged treewise).

Engine analog of the reference's exploration stats — counts, min/max/mean
of lengths (notebooks/data_exploration.ipynb cells 22-23) and nunique
(gpt_intent_classifier.py:745) — promoted to a distributed single-pass
``groupBy(partition).agg(...)``.

Scale notes: one hash aggregation, partial (map-side) + final; HLL
sketches (Spark ≥3.5 ``hll_sketch_agg``) are merged per-partition then
unioned to a global sketch with ``hll_union_agg`` — a tree-style merge
that never ships raw values, only 16-KB-ish sketches. No sort, no
window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: list[str], by: tuple[str, ...] = (),
                 exact_distinct: bool = False) -> DataFrame:
    """One pass: per group (or global) null_rate / min / max /
    approx_distinct per requested column, long-form output
    (group..., column, null_rate, min_value, max_value, approx_distinct).

    exact_distinct=True swaps HLL for exact count_distinct — used by
    oracle-parity checks (HLL estimates aren't reproducible across
    engines); production stays approximate."""
    distinct_of = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
            distinct_of(F.col(c)).alias(f"_adist_{c}"),
        ]
    tot = df.groupBy(*by).agg(*aggs)
    per_col = [
        tot.select(
            *by,
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col(f"_nulls_{c}") / F.col("_n")).alias("null_rate"),
            F.col(f"_min_{c}").cast("string").alias("min_value"),
            F.col(f"_max_{c}").cast("string").alias("max_value"),
            F.col(f"_adist_{c}").alias("approx_distinct"),
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


def hll_partition_sketches(df: DataFrame, col: str, by: tuple[str, ...] = ("part_key",)) -> DataFrame:
    """Per-partition HLL sketches (binary). Kept as a table so the global
    distinct is a cheap union of sketches, and so resumed runs can merge
    only new partitions' sketches (checkpoint lineage)."""
    return df.groupBy(*by).agg(F.hll_sketch_agg(col).alias("sketch"))


def hll_global_distinct(sketches: DataFrame) -> DataFrame:
    """Union all partition sketches → one global approx-distinct."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct")
    )
