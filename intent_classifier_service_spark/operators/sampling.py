"""Sampling: capped per-group take, stratified equal-allocation, and
remainder top-up — window-rank re-expressions of the reference's
per-class Python loops.

  capped_per_group       — ≤ k rows per class (ref pick_training_examples,
                           gpt_intent_classifier.py:128-169)
  stratified_sample      — test_size // n_classes per class, all rows if
                           the class is smaller, then random top-up to
                           exactly test_size (ref sample_evaluation_data,
                           :717-787) — "take all if fewer" falls out of
                           row_number() <= k
  dense ids              — 0..N−1 in first-seen order (ref :113-125)

All randomness is seeded ``F.rand(seed)`` (the reference is unseeded;
the engine must be deterministic for golden tests — SURVEY §2.5 O1).
``order_col`` swaps the random order for a deterministic key so results
are reproducible across engines (used by the DuckDB oracle checks).

Scale shape: one shuffle on the group key per call. The window is
rank-only (row_number), so AQE can still coalesce; no global sort. The
remainder top-up uses a global orderBy(rand).limit(n) — Spark plans
TakeOrderedAndProject (per-partition top-n + driver merge of n), not a
full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def capped_per_group(df: DataFrame, group: str, k: int, seed: int = 42,
                     order_col: str | None = None) -> DataFrame:
    order = F.col(order_col) if order_col else F.rand(seed)
    w = Window.partitionBy(group).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def stratified_sample(df: DataFrame, group: str, total: int, seed: int = 42,
                      order_col: str | None = None) -> DataFrame:
    """Equal allocation per class + top-up to exactly ``total`` rows.
    Mirrors reference semantics including the small-total fallback
    (total < n_classes → dedup per class, then take ``total``).

    ONE auxiliary driver action: a ``groupBy(group).count()`` collect
    (one row per class — metadata-sized) yields both n_classes and the
    base allocation Σ min(count, per_class). The earlier two extra
    actions (distinct().count() + base.count()) were two extra full
    scans of the fact table per call at 100 TB.

    Precondition when ``order_col`` is given: (group, order_col) must
    identify a row. The top-up anti-join keys on that pair; duplicate
    keys would both exclude too many rows from top-up eligibility
    (silently returning < total) AND make row_number() ordering
    nondeterministic across runs. The seeded-random path has the same
    tie hazard on F.rand collisions (measure-zero)."""
    class_counts = {
        r["_g"]: r["_n"]
        for r in df.groupBy(F.col(group).alias("_g"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    n_classes = len(class_counts)
    if n_classes == 0 or total <= 0:
        return df.limit(0)
    order = F.col(order_col) if order_col else F.rand(seed)

    if total < n_classes:  # ref :780-784
        one_per = capped_per_group(df, group, 1, seed, order_col)
        return one_per.orderBy(order).limit(total)

    per_class = total // n_classes
    base = capped_per_group(df, group, per_class, seed, order_col)
    n_base = sum(min(c, per_class) for c in class_counts.values())
    remaining = total - n_base
    if remaining <= 0:
        return base
    # ref :772-778 — random top-up from unsampled rows (anti-join).
    # With order_col the (group, order_col) pair identifies a row, so
    # the anti-join keys on it (an all-columns key would silently never
    # match null-valued columns); without one, fall back to all columns
    # (seeded-random path, null-keyed rows just stay top-up-eligible).
    key = [group, order_col] if order_col else df.columns
    top_up = (
        df.join(base, on=key, how="left_anti").orderBy(order).limit(remaining)
    )
    return base.unionByName(top_up)


def dense_ids(df: DataFrame, col: str, order_col: str) -> DataFrame:
    """(value, label) with dense ids 0..N−1 ordered by first appearance
    (min of order_col) — ref label_counter loop (:113-125). Runs on the
    small distinct-class table, so the global window is fine."""
    firsts = df.groupBy(col).agg(F.min(order_col).alias("_first_seen"))
    w = Window.orderBy("_first_seen", col)
    return firsts.select(
        F.col(col), (F.row_number().over(w) - 1).alias("label")
    )


# -------------------------------------------------- deterministic splits

def split_expr(key, weights: dict[str, float], buckets: int = 10_000,
               portable: bool = False):
    """Column expression assigning a split name from a key column:
    bucket = hash(key) mod ``buckets``, split = the name whose
    cumulative-weight bucket range contains it. Deterministic,
    storage-free, and stable under corpus growth — a doc keeps its
    split forever, the property a training pipeline needs so eval
    contamination can't creep in across re-runs (contrast
    randomSplit(), which re-deals on every execution/partitioning).

    Default hash: xxhash64(key) (uniform for ANY key distribution).
    ``portable=True`` swaps in a Knuth multiplicative hash
    ((key * 2654435761) mod 2^32) that the DuckDB oracle reproduces
    verbatim — exact cross-engine assignment equality, used by the
    driver queries; production callers keep the default. ANSI-safe:
    bigint keys up to ~3.4e9 can't overflow the 64-bit multiply; the
    xxhash64 path has no such bound."""
    key = F.col(key) if isinstance(key, str) else key
    if portable:
        h = F.pmod(key.cast("long") * F.lit(2654435761), F.lit(2**32))
    else:
        h = F.xxhash64(key)
    bucket = F.pmod(h, F.lit(buckets))
    total = sum(weights.values())
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", split_col: str = "split",
               buckets: int = 10_000, portable: bool = False) -> DataFrame:
    """df + a deterministic ``split_col`` (train/val/test/...) from
    hash(key_col) — see split_expr. One projection, no shuffle, no
    state: the split of a row is a pure function of its key."""
    return df.withColumn(
        split_col, split_expr(key_col, weights, buckets, portable)
    )


def leakage_safe_split(docs: DataFrame, clusters: DataFrame,
                       weights: dict[str, float], id_col: str = "doc_id",
                       split_col: str = "split", buckets: int = 10_000,
                       portable: bool = False) -> DataFrame:
    """hash_split keyed by near-dup CLUSTER, not document: every member
    of a duplicate cluster lands in the SAME split, so a train doc's
    near-copy can never leak into eval — the standard dedup-aware split
    discipline for LLM training corpora (splitting after dedup is not
    enough when survivors of different policies, or un-deduped raw
    corpora, feed different stages). ``clusters`` is neardup_clusters'
    (id, cluster_id); non-candidate docs (absent there) key on their
    own id via coalesce. One broadcast-or-shuffle left join against the
    candidates-only cluster table, then the stateless split projection."""
    cl = clusters.select(F.col("id").alias(id_col),
                         F.col("cluster_id").alias("_split_key"))
    joined = docs.join(cl, id_col, "left")
    key = F.coalesce(F.col("_split_key"), F.col(id_col))
    return joined.withColumn(
        split_col, split_expr(key, weights, buckets, portable)
    ).drop("_split_key")


def mixture_sample(df: DataFrame, group: str, weights: dict[str, float],
                   total: int, order_col: str | None = None,
                   seed: int = 42) -> DataFrame:
    """Sample to a TARGET MIXTURE: per group g, take
    min(floor(total * w_g / sum(w)), available) rows — the corpus-
    curation primitive ("40% web, 30% code, 30% books") that stratified
    equal-allocation can't express. Groups absent from ``weights`` are
    excluded (weight 0). Deterministic with ``order_col`` (the oracle
    path); seeded-random otherwise. Under-full groups are NOT topped up
    from other groups — substituting mass across sources silently
    changes the mixture, which is the bug this operator exists to
    prevent; the caller sees the shortfall in the output counts.

    Scale shape: one broadcast join against the weights dim (len(
    weights) rows) + one row_number window partitioned by group — the
    same single group-key shuffle as capped_per_group."""
    wsum = sum(weights.values())
    quotas = [(g, int(total * w / wsum)) for g, w in weights.items()]
    spark = df.sparkSession
    qdf = spark.createDataFrame(quotas, f"{group} string, _quota long")
    order = F.col(order_col) if order_col else F.rand(seed)
    w = Window.partitionBy(group).orderBy(order)
    return (
        df.join(F.broadcast(qdf), group)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )
