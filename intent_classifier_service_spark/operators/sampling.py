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
                   seed: int = 42, method: str = "hash",
                   buckets: int = 4096, portable: bool = False) -> DataFrame:
    """Sample to a TARGET MIXTURE: per group g, take
    min(floor(total * w_g / sum(w)), available) rows — the corpus-
    curation primitive ("40% web, 30% code, 30% books") that stratified
    equal-allocation can't express. Groups absent from ``weights`` are
    excluded (weight 0). Under-full groups are NOT topped up from other
    groups — substituting mass across sources silently changes the
    mixture, which is the bug this operator exists to prevent; the
    caller sees the shortfall in the output counts.

    ``method="hash"`` (default — the 100 TB path): source-mixture
    groups are FEW and HUGE (5-20 sources over 10^12 docs), so a
    row_number window partitioned by group would sort each group's
    entire row set through a single task. Instead the quota is resolved
    in two phases against a uniform hash rank:
      1. one map-side-combinable groupBy(group, bucket) histogram
         (≤ len(weights) × ``buckets`` rows — metadata-sized collect),
         where bucket = hash(rank key) mod ``buckets``;
      2. driver-side cumulative scan finds each group's boundary bucket
         t_g; rows in buckets < t_g are selected by a stateless filter
         (no shuffle at all), and ONLY the boundary bucket's rows
         (~group_size/buckets — dimension-sized; size ``buckets`` so
         this fits a task) flow through the exact top-up window.
    The selected set equals "top quota_g rows by (bucket, rank key)
    per group" exactly — deterministic, and SQL-expressible as a plain
    window for the oracle. The rank key is ``order_col`` when given,
    else a seeded xxhash64 over all columns (deterministic pseudo-
    random). ``portable=True`` swaps xxhash64 for the Knuth
    multiplicative hash on an integral key (cross-engine oracle
    parity, as in split_expr).

    ``method="window"`` keeps the single-window implementation for
    dimension-sized inputs where one task per group is fine and the
    seeded ``F.rand`` order is wanted."""
    wsum = sum(weights.values())
    quotas = {g: int(total * w / wsum) for g, w in weights.items()}
    if method == "window":
        spark = df.sparkSession
        qdf = spark.createDataFrame(
            list(quotas.items()), f"{group} string, _quota long")
        order = F.col(order_col) if order_col else F.rand(seed)
        w = Window.partitionBy(group).orderBy(order)
        return (
            df.join(F.broadcast(qdf), group)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_quota")
        )
    if method != "hash":
        raise ValueError(f"unknown mixture_sample method {method!r}")
    if not quotas:
        return df.limit(0)
    if order_col is not None:
        key = F.col(order_col)
        order = F.col(order_col)
    else:
        key = F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])
        order = key
    if portable:
        # Knuth multiplicative hash — DuckDB-reproducible (split_expr's
        # portable path; integral keys ≤ ~3.4e9 under ANSI)
        h = F.pmod(key.cast("long") * F.lit(2654435761), F.lit(2**32))
    else:
        h = F.xxhash64(F.lit(seed), key)
    with_bkt = df.withColumn("_mbkt", F.pmod(h, F.lit(buckets)))
    hist: dict[tuple, int] = {
        (r["_g"], r["_b"]): r["_n"]
        for r in with_bkt.groupBy(
            F.col(group).alias("_g"), F.col("_mbkt").alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    # boundary bucket per group: rows in buckets < t_g are all taken
    # (cum rows), plus exactly quota - cum from bucket t_g
    thresholds: dict[object, tuple[int, int]] = {}
    for g, q in quotas.items():
        if q <= 0:
            thresholds[g] = (-1, 0)
            continue
        cum, t, need = 0, buckets, 0  # defaults: group smaller than quota
        for bk in sorted(b for gg, b in hist if gg == g):
            n = hist[(g, bk)]
            if cum + n >= q:
                t, need = bk, q - cum
                break
            cum += n
        thresholds[g] = (t, need)
    t_expr = need_expr = None
    for g, (t, need) in thresholds.items():
        cond = F.col(group) == F.lit(g)
        t_expr = (F.when(cond, F.lit(t)) if t_expr is None
                  else t_expr.when(cond, F.lit(t)))
        need_expr = (F.when(cond, F.lit(need)) if need_expr is None
                     else need_expr.when(cond, F.lit(need)))
    sel = (
        with_bkt.withColumn("_t", t_expr.otherwise(F.lit(None)))
        .withColumn("_need", need_expr.otherwise(F.lit(None)))
        .filter(F.col("_t").isNotNull())  # unweighted groups excluded
    )
    below = sel.filter(F.col("_mbkt") < F.col("_t"))
    w = Window.partitionBy(group).orderBy(order)
    boundary = (
        sel.filter(F.col("_mbkt") == F.col("_t"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_need"))
        .drop("_rn")
    )
    return below.unionByName(boundary).drop("_mbkt", "_t", "_need")


def mixture_sample_tokens(df: DataFrame, group: str,
                          weights: dict[str, float], total_tokens: int,
                          tokens_col: str = "n_tokens",
                          order_col: str | None = None, seed: int = 42,
                          buckets: int = 4096,
                          portable: bool = False) -> DataFrame:
    """mixture_sample at TOKEN grain — the unit training mixtures are
    actually stated in: per group g, take the greedy prefix of rows in
    (hash bucket, rank key) order until the group's token quota
    floor(total_tokens · w_g / Σw) is reached (a row is taken iff the
    tokens BEFORE it are still under quota, so the crossing row is
    included and every group overshoots by < one document). Groups
    absent from ``weights`` are excluded; under-full groups surface as
    shortfall, never cross-group substitution.

    Same two-phase scale shape as mixture_sample's hash path, with SUM
    histograms: one map-side groupBy(group, bucket).sum(tokens) →
    driver boundary scan → stateless filter for below-boundary buckets
    + an exact running-sum window over ONLY the boundary bucket
    (~group/buckets rows). The selected set equals the declarative
    'running-sum-before < quota over (bucket, key) order' definition —
    SQL-expressible for the oracle. Rows with a NULL token count are
    excluded (a doc of unknown length can't be budgeted)."""
    wsum = sum(weights.values())
    quotas = {g: int(total_tokens * w / wsum) for g, w in weights.items()}
    if not quotas:
        return df.limit(0)
    if order_col is not None:
        key = F.col(order_col)
        order = F.col(order_col)
    else:
        key = F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])
        order = key
    if portable:
        h = F.pmod(key.cast("long") * F.lit(2654435761), F.lit(2**32))
    else:
        h = F.xxhash64(F.lit(seed), key)
    toks = F.col(tokens_col).cast("long")
    with_bkt = df.filter(toks.isNotNull()).withColumn(
        "_mbkt", F.pmod(h, F.lit(buckets)))
    hist: dict[tuple, int] = {
        (r["_g"], r["_b"]): r["_s"]
        for r in with_bkt.groupBy(
            F.col(group).alias("_g"), F.col("_mbkt").alias("_b"))
        .agg(F.sum(toks).alias("_s")).collect()
    }
    # boundary bucket per group: buckets < t_g are fully under quota
    # cumulatively; bucket t_g is where the running token sum crosses
    thresholds: dict[object, tuple[int, int]] = {}
    for g, q in quotas.items():
        if q <= 0:
            thresholds[g] = (-1, 0)
            continue
        cum, t, rem = 0, buckets, 0  # defaults: group's tokens < quota
        for bk in sorted(b for gg, b in hist if gg == g):
            s = hist[(g, bk)]
            if cum + s >= q:
                t, rem = bk, q - cum  # token budget left inside bucket t
                break
            cum += s
        thresholds[g] = (t, rem)
    t_expr = rem_expr = None
    for g, (t, rem) in thresholds.items():
        cond = F.col(group) == F.lit(g)
        t_expr = (F.when(cond, F.lit(t)) if t_expr is None
                  else t_expr.when(cond, F.lit(t)))
        rem_expr = (F.when(cond, F.lit(rem)) if rem_expr is None
                    else rem_expr.when(cond, F.lit(rem)))
    sel = (
        with_bkt.withColumn("_t", t_expr.otherwise(F.lit(None)))
        .withColumn("_rem", rem_expr.otherwise(F.lit(None)))
        .filter(F.col("_t").isNotNull())
    )
    below = sel.filter(F.col("_mbkt") < F.col("_t"))
    w = (Window.partitionBy(group).orderBy(order)
         .rowsBetween(Window.unboundedPreceding, -1))
    boundary = (
        sel.filter(F.col("_mbkt") == F.col("_t"))
        .withColumn("_before", F.coalesce(F.sum(toks).over(w), F.lit(0)))
        .filter(F.col("_before") < F.col("_rem"))
        .drop("_before")
    )
    return below.unionByName(boundary).drop("_mbkt", "_t", "_rem")


def mixture_epoch_plan(df: DataFrame, group: str,
                       weights: dict[str, float], total_tokens: int,
                       tokens_col: str = "n_tokens") -> DataFrame:
    """The data-mixing PLAN a token-budgeted run needs before sampling:
    per weighted group — (group, available_tokens, target_tokens,
    epochs) where target = floor(total_tokens · w_g / Σw) and epochs =
    target / available (the repetition factor: > 1 means the source
    must be up-sampled/repeated to hit its share, the standard
    small-high-quality-source situation; < 1 means sub-sampling, i.e.
    mixture_sample_tokens territory). Groups with no corpus rows still
    appear with available_tokens = 0 and NULL epochs — a silent
    missing source is exactly the planning bug to surface.

    One map-side-combinable agg over two narrow columns + literal
    arithmetic; metadata-sized output (one row per weighted source)."""
    wsum = sum(weights.values())
    spark = df.sparkSession
    gtype = df.schema[group].dataType.simpleString()
    tdf = spark.createDataFrame(
        [(g, int(total_tokens * w / wsum)) for g, w in weights.items()],
        f"{group} {gtype}, target_tokens long")
    avail = (
        df.filter(F.col(group).isin(list(weights)))
        .groupBy(group)
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("available_tokens"))
    )
    return (
        tdf.join(avail, group, "left")
        .select(
            group,
            F.coalesce("available_tokens", F.lit(0)).alias("available_tokens"),
            "target_tokens",
            F.when(F.coalesce("available_tokens", F.lit(0)) > 0,
                   F.round(F.col("target_tokens")
                           / F.col("available_tokens"), 6))
            .alias("epochs"),
        )
    )


def split_leakage_violations(assigned: DataFrame, clusters: DataFrame,
                             id_col: str = "doc_id",
                             split_col: str = "split") -> DataFrame:
    """Validation twin of leakage_safe_split: AUDIT an existing split
    assignment for near-dup leakage — one row per cluster whose members
    landed in more than one split: (cluster_id, n_members, n_splits,
    splits [sorted comma-joined]). Empty output == the assignment is
    leakage-free; leakage_safe_split's output always audits clean
    (pinned in tests), a plain per-doc hash_split over clustered docs
    does not.

    Scale shape: one equi-join of the assignment against the
    candidates-only cluster table (dimension-sized vs the corpus;
    AQE broadcasts it) + one map-side-combinable groupBy per cluster.
    The per-cluster split list is bounded by the number of split
    names, never by corpus size."""
    j = assigned.select(id_col, split_col).join(
        clusters.select(F.col("id").alias(id_col), "cluster_id"), id_col)
    return (
        j.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct(split_col).alias("n_splits"),
            F.array_join(F.array_sort(F.collect_set(split_col)), ",")
            .alias("splits"),
        )
        .filter(F.col("n_splits") > 1)
    )
