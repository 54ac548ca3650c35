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
