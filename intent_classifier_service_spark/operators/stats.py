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


def embedding_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Embedding-column validation: one scan, one global aggregate row —
    n_vecs, null vectors, min/max dimensionality, vectors containing a
    non-finite (null/NaN/±Inf) element, and min/max L2 norm.

    The norm is computed per row with an ordered ``F.aggregate`` fold
    (deterministic left-to-right FP accumulation) and rounded to 6
    decimals BEFORE the min/max aggregate, so the reduction itself is
    order-independent — the oracle-parity trick for FP reductions
    (CLAUDE.md decimal rules, applied to doubles). Everything is JVM
    higher-order functions over the array column: no explode (which
    would multiply 10^12 rows by the dimension), no Python, no shuffle
    beyond the single-row final aggregate."""
    v = F.col(vec_col).cast("array<double>")
    dim = F.size(v)
    nonfinite = F.exists(
        v, lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    norm = F.round(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)), 6
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col(vec_col).isNull().cast("long")).alias("n_null_vec"),
        F.min(dim).alias("min_dim"),
        F.max(dim).alias("max_dim"),
        F.sum(F.coalesce(nonfinite.cast("long"), F.lit(0))).alias("n_nonfinite"),
        F.min(norm).alias("min_norm"),
        F.max(norm).alias("max_norm"),
    )


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
