"""Stats / uniqueness / referential / drift operator tests."""

import math

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators import drift, referential, stats, uniqueness


def test_column_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "c")], "k int, v string"
    )
    got = {r["column"]: r for r in stats.column_stats(df, ["v"]).collect()}
    assert got["v"]["n_rows"] == 4
    assert abs(got["v"]["null_rate"] - 0.25) < 1e-9
    assert got["v"]["min_value"] == "a"
    assert got["v"]["max_value"] == "c"
    assert got["v"]["approx_distinct"] == 2


def test_hll_sketch_merge_matches_exact(spark):
    docs = datagen.documents_spans(spark, 3000)
    sketches = stats.hll_partition_sketches(docs, "doc_id")
    approx = stats.hll_global_distinct(sketches).collect()[0]["approx_distinct"]
    exact = docs.select("doc_id").distinct().count()
    assert abs(approx - exact) / exact < 0.05  # HLL default precision


def test_duplicate_doc_ids_exact_counts(spark):
    n = 4_000
    docs = datagen.documents_spans(spark, n)
    dups = {r["doc_id"]: r["n_occurrences"]
            for r in uniqueness.duplicate_doc_ids(docs).collect()}
    # hot key: every r % 499 == 3 collapses onto HOT_DOC_ID
    hot_expected = len([r for r in range(n) if r % 499 == 3])
    # r=42 itself also formats to doc-00000042 (42 % 499 != 3, no dup-shift)
    hot_expected += 1
    assert dups[datagen.HOT_DOC_ID] == hot_expected
    # neighbor dups: r % 997 == 0, r > 0 → doc-(r-1) twice
    neighbor = [r for r in range(1, n) if r % 997 == 0 and r % 499 != 3]
    for r in neighbor:
        assert dups[f"doc-{r - 1:08d}"] == 2
    # every duplicated key accounted for
    assert len(dups) == 1 + len(neighbor)


def test_uniqueness_salting_agrees_with_plain_groupby(spark):
    docs = datagen.documents_spans(spark, 3000)
    salted = uniqueness.duplicate_doc_ids(docs, n_salts=8)
    plain = (
        docs.groupBy("doc_id").count().filter(F.col("count") > 1)
        .withColumnRenamed("count", "n_occurrences")
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_referential_violations(spark):
    docs = spark.createDataFrame(
        [
            ("d1", [("media", None, "media-00001", 0)]),
            ("d2", [("media", None, "media-99999", 0), ("text", "x", None, 5)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    refs = datagen.valid_media_refs(spark)
    v = referential.referential_violations(docs, refs).collect()
    assert len(v) == 1
    assert v[0]["doc_id"] == "d2" and v[0]["observed"] == "media-99999"
    unknown = referential.unknown_refs(docs, refs).collect()
    assert [r["media_ref"] for r in unknown] == ["media-99999"]


def test_referential_join_is_broadcast(spark):
    docs = datagen.documents_spans(spark, 100)
    refs = datagen.valid_media_refs(spark)
    plan = referential.referential_violations(docs, refs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_psi_zero_on_identical_and_positive_on_shift(spark):
    base = spark.createDataFrame([("a", 0.5), ("b", 0.5)], "bucket string, freq double")
    same = spark.createDataFrame([("a", 0.5), ("b", 0.5)], "bucket string, freq double")
    shifted = spark.createDataFrame([("a", 0.9), ("b", 0.1)], "bucket string, freq double")
    assert abs(drift.psi(same, base)) < 1e-6
    expected = (0.9 - 0.5) * math.log((0.9 + drift.EPS) / (0.5 + drift.EPS)) + (
        0.1 - 0.5
    ) * math.log((0.1 + drift.EPS) / (0.5 + drift.EPS))
    assert abs(drift.psi(shifted, base) - expected) < 1e-9


def test_ks_from_histograms(spark):
    cur = spark.createDataFrame([(0, 0.2), (1, 0.8)], "bucket int, freq double")
    base = spark.createDataFrame([(0, 0.6), (1, 0.4)], "bucket int, freq double")
    # ECDF diff after bucket 0: |0.2-0.6| = 0.4; after bucket 1: 0
    assert abs(drift.ks_from_histograms(cur, base) - 0.4) < 1e-9


def test_drift_self_is_clean(spark):
    docs = datagen.documents_spans(spark, 2000)
    verdicts = drift.drift_verdicts(
        docs,
        drift.span_kind_frequencies(docs),
        drift.offset_histogram(docs, 0, 128),
        lo=0,
        hi=128,
    )
    assert all(v["pass"] for v in verdicts)
    assert all(abs(v["statistic"]) < 1e-9 for v in verdicts)
