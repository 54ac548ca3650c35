from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import sampling


def _df(spark):
    rows = [(f"r{i}", ["a", "b", "c", "d"][i % 4] if i < 40 else "e") for i in range(42)]
    # classes a-d: 10 each; class e: 2 rows (smaller than allocation)
    return spark.createDataFrame(rows, "id string, cls string")


def test_capped_per_group(spark):
    out = sampling.capped_per_group(_df(spark), "cls", 3, order_col="id")
    counts = {r["cls"]: r["count"] for r in out.groupBy("cls").count().collect()}
    assert counts == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 2}


def test_capped_per_group_seeded_deterministic(spark):
    a = sampling.capped_per_group(_df(spark), "cls", 3, seed=7).collect()
    b = sampling.capped_per_group(_df(spark), "cls", 3, seed=7).collect()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)


def test_stratified_exact_total_with_topup(spark):
    # total=20, 5 classes → 4 per class; class e has only 2 → top-up 2
    out = sampling.stratified_sample(_df(spark), "cls", 20, order_col="id")
    assert out.count() == 20
    counts = {r["cls"]: r["count"] for r in out.groupBy("cls").count().collect()}
    assert counts["e"] == 2  # take-all-if-fewer
    assert all(v >= 4 for k, v in counts.items() if k != "e")


def test_stratified_small_total_fallback(spark):
    out = sampling.stratified_sample(_df(spark), "cls", 3, order_col="id")
    assert out.count() == 3
    # ref :780-784 — at most one row per class
    assert out.groupBy("cls").count().agg(F.max("count")).collect()[0][0] == 1


def test_stratified_single_auxiliary_action(spark, monkeypatch):
    """Plan-efficiency pin: building the stratified sample runs exactly
    ONE auxiliary driver action (the per-class count collect) — the
    allocation must not trigger extra distinct().count()/base.count()
    scans of the fact table (two full corpus reads per call at 100 TB)."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is an abstract
    # facade in Spark 4 whose methods the classic backend overrides
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    calls = {"n": 0}
    real_collect, real_count = DataFrame.collect, DataFrame.count

    def counting_collect(self):
        calls["n"] += 1
        return real_collect(self)

    def counting_count(self):
        calls["n"] += 1
        return real_count(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "count", counting_count)
    out = sampling.stratified_sample(_df(spark), "cls", 20, order_col="id")
    assert calls["n"] == 1  # allocation = one groupBy(cls).count() collect
    monkeypatch.undo()
    assert out.count() == 20  # …and the result is unchanged


def test_dense_ids_first_seen_order(spark):
    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b"), (4, "a")], "pos int, intent string"
    )
    got = {r["intent"]: r["label"] for r in
           sampling.dense_ids(df, "intent", "pos").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_hash_split_deterministic_and_proportional(spark):
    from intent_classifier_service_spark.operators import sampling as S

    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = S.hash_split(df, w)  # default xxhash64 path
    again = S.hash_split(df, w)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # exact same assignment on re-run (stable, unlike randomSplit)
    assert out.exceptAll(again).count() == 0
    # proportions within 2% absolute of the weights at 20k keys
    total = sum(counts.values())
    assert total == 20000
    assert abs(counts["train"] / total - 0.8) < 0.02
    assert abs(counts["val"] / total - 0.1) < 0.02
    assert abs(counts["test"] / total - 0.1) < 0.02


def test_hash_split_portable_matches_arithmetic(spark):
    """portable=True must reproduce the documented Knuth multiplicative
    arithmetic exactly (the cross-engine oracle contract)."""
    from intent_classifier_service_spark.operators import sampling as S

    keys = [0, 1, 7, 12345, 99999, 3_400_000_000 // 1000]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in
           S.hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                        portable=True).collect()}
    for k in keys:
        b = (k * 2654435761) % (2 ** 32) % 10000
        expect = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert got[k] == expect, (k, b, got[k])


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every member of a near-dup cluster lands in the SAME split; docs
    outside any cluster split independently on their own id."""
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import dedup, sampling as S

    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    # clusters: 200 pairs (i, i+50000-placeholder) -> use chain pairs inside range
    pairs = spark.createDataFrame(
        [(i, i + 1000) for i in range(0, 400, 2)], "id_a long, id_b long")
    clusters = dedup.neardup_clusters(pairs)
    out = S.leakage_safe_split(docs, clusters,
                               {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == 5000  # every doc returned exactly once
    straddle = (
        out.join(clusters.select(F.col("id").alias("doc_id"), "cluster_id"),
                 "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
    )
    assert straddle.count() == 0
    # paired docs share the split; an unpaired doc keys on its own id
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    for i in range(0, 400, 2):
        assert got[i] == got[i + 1000]


def test_mixture_sample_quotas_and_exclusion(spark):
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import sampling as S

    rows = ([("a", i) for i in range(100)] + [("b", i) for i in range(40)]
            + [("c", i) for i in range(10)] + [("x", i) for i in range(50)])
    df = spark.createDataFrame([(g, 1000 * i + hash(g) % 7) for g, i in rows],
                               "grp string, doc_id long")
    out = S.mixture_sample(df, "grp", {"a": 0.5, "b": 0.3, "c": 0.2},
                           total=100, order_col="doc_id")
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # quotas: a 50, b 30, c min(20, 10)=10; unweighted 'x' excluded
    assert counts == {"a": 50, "b": 30, "c": 10}
    # deterministic with order_col: same rows every run
    again = S.mixture_sample(df, "grp", {"a": 0.5, "b": 0.3, "c": 0.2},
                             total=100, order_col="doc_id")
    assert out.exceptAll(again).count() == 0


def test_mixture_sample_hash_path_under_structural_skew(spark):
    """The hash path's raison d'être: ONE source group holding 90% of
    the corpus (structural skew — few huge sources is the normal
    mixture-sampling regime). Quotas must be exact, the selection
    deterministic, and the set equal to the declarative 'top quota per
    group by (bucket, id)' definition."""
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import sampling as S

    df = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("web")).otherwise(F.lit("books"))
        .alias("src"),
    )
    weights = {"web": 0.7, "books": 0.3}
    out = S.mixture_sample(df, "src", weights, total=1000,
                           order_col="doc_id", buckets=64)
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {"web": 700, "books": 300}
    # declarative twin: rank per group by (xxhash64 bucket, doc_id)
    from pyspark.sql.window import Window
    bkt = F.pmod(F.xxhash64(F.lit(42), F.col("doc_id")), F.lit(64))
    w = Window.partitionBy("src").orderBy(bkt, "doc_id")
    quota = F.when(F.col("src") == "web", 700).otherwise(300)
    ref = (df.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") <= quota).drop("_rn"))
    assert out.exceptAll(ref).count() == 0
    assert ref.exceptAll(out).count() == 0
    # rerun-deterministic
    again = S.mixture_sample(df, "src", weights, total=1000,
                             order_col="doc_id", buckets=64)
    assert out.exceptAll(again).count() == 0


def test_mixture_sample_hash_no_order_col_and_window_parity(spark):
    """Without order_col the hash path ranks by a seeded xxhash64 over
    all columns — still deterministic; quotas exact. The explicit
    window method keeps the legacy shape for dimension-sized inputs."""
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import sampling as S

    df = spark.createDataFrame(
        [("a", i) for i in range(200)] + [("b", i) for i in range(100)],
        "grp string, doc_id long")
    out = S.mixture_sample(df, "grp", {"a": 0.6, "b": 0.4}, total=100)
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 60, "b": 40}
    again = S.mixture_sample(df, "grp", {"a": 0.6, "b": 0.4}, total=100)
    assert out.exceptAll(again).count() == 0
    # window method: same quota arithmetic, legacy single-window plan
    wout = S.mixture_sample(df, "grp", {"a": 0.6, "b": 0.4}, total=100,
                            order_col="doc_id", method="window")
    wcounts = {r["grp"]: r["n"] for r in
               wout.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert wcounts == counts


def test_mixture_sample_tokens_greedy_prefix(spark):
    """Token-grain mixture: each group's selected docs are exactly the
    greedy (bucket, id)-order prefix whose preceding token sum is under
    the group quota — so every group overshoots by < one doc; shortfall
    groups keep everything; unweighted groups are excluded."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from intent_classifier_service_spark.operators import sampling as S

    df = spark.createDataFrame(
        [("a", i, 10 + i % 7) for i in range(300)]        # ~3.9k tokens
        + [("b", 1000 + i, 50) for i in range(10)]        # 500 tokens
        + [("x", 2000 + i, 5) for i in range(20)],        # unweighted
        "grp string, doc_id long, n_tokens long")
    out = S.mixture_sample_tokens(df, "grp", {"a": 0.5, "b": 0.5},
                                  total_tokens=2000, order_col="doc_id",
                                  buckets=64)
    sums = {r["grp"]: (r["s"], r["n"]) for r in
            out.groupBy("grp").agg(F.sum("n_tokens").alias("s"),
                                   F.count("*").alias("n")).collect()}
    assert set(sums) == {"a", "b"}
    # quota 1000 each: 'a' lands in [1000, 1000 + max_doc); 'b' has only
    # 500 tokens available -> all 10 docs survive (shortfall, no top-up)
    assert 1000 <= sums["a"][0] < 1000 + 17
    assert sums["b"] == (500, 10)
    # declarative twin: running-sum-before < quota over (bucket, id)
    bkt = F.pmod(F.xxhash64(F.lit(42), F.col("doc_id")), F.lit(64))
    w = (Window.partitionBy("grp").orderBy(bkt, "doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    quota = F.when(F.col("grp") == "a", 1000).when(F.col("grp") == "b", 1000)
    ref = (df.withColumn("_before", F.coalesce(F.sum("n_tokens").over(w),
                                               F.lit(0)))
           .filter(quota.isNotNull() & (F.col("_before") < quota))
           .drop("_before"))
    assert out.exceptAll(ref).count() == 0
    assert ref.exceptAll(out).count() == 0
    # deterministic across runs
    again = S.mixture_sample_tokens(df, "grp", {"a": 0.5, "b": 0.5},
                                    total_tokens=2000, order_col="doc_id",
                                    buckets=64)
    assert out.exceptAll(again).count() == 0


def test_mixture_epoch_plan(spark):
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import sampling as S

    df = spark.createDataFrame(
        [("web", i, 100) for i in range(50)]      # 5000 tokens
        + [("books", 100 + i, 10) for i in range(10)],  # 100 tokens
        "src string, doc_id long, n_tokens long")
    plan = S.mixture_epoch_plan(
        df, "src", {"web": 0.5, "books": 0.4, "code": 0.1},
        total_tokens=10_000)
    rows = {r["src"]: r for r in plan.collect()}
    assert set(rows) == {"web", "books", "code"}
    assert rows["web"]["available_tokens"] == 5000
    assert rows["web"]["target_tokens"] == 5000
    assert rows["web"]["epochs"] == 1.0
    assert rows["books"]["available_tokens"] == 100
    assert rows["books"]["target_tokens"] == 4000
    assert rows["books"]["epochs"] == 40.0      # must repeat 40x
    # a weighted source absent from the corpus surfaces, not vanishes
    assert rows["code"]["available_tokens"] == 0
    assert rows["code"]["epochs"] is None


def test_split_leakage_violations_planted_and_clean(spark):
    """split_leakage_violations flags exactly the clusters whose
    members straddle splits; leakage_safe_split's own output always
    audits clean (the operator pair is a property and its check)."""
    from intent_classifier_service_spark.operators import sampling as S
    from pyspark.sql import functions as F

    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100),   # cluster 100: docs 1,2,3
         (4, 200), (5, 200),             # cluster 200: docs 4,5
         (6, 300), (7, 300)],            # cluster 300: docs 6,7
        "id long, cluster_id long")
    assigned = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"),   # 100 straddles
         (4, "test"), (5, "test"),                 # 200 clean
         (6, "train"), (7, "test"),                # 300 straddles
         (8, "val")],                              # unclustered: ignored
        "doc_id long, split string")
    out = {r["cluster_id"]: r for r in
           S.split_leakage_violations(assigned, clusters).collect()}
    assert set(out) == {100, 300}
    assert (out[100]["n_members"], out[100]["n_splits"],
            out[100]["splits"]) == (3, 2, "train,val")
    assert out[300]["splits"] == "test,train"

    # the leakage-safe assignment audits clean on the same clusters
    docs = spark.range(1, 9).select(F.col("id").alias("doc_id"))
    safe = S.leakage_safe_split(
        docs, clusters, {"train": 0.5, "val": 0.25, "test": 0.25})
    assert S.split_leakage_violations(safe, clusters).count() == 0
