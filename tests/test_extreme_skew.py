"""Salted uniqueness under extreme skew: half the table shares ONE
doc_id. The salted two-phase aggregation must stay correct, and its
phase-1 partial counts must bound any reducer's share of the hot key."""

from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import uniqueness


def _skewed(spark, n=20_000):
    # 50% of rows collapse onto one doc_id; rest unique
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("doc-HOT"))
        .otherwise(F.format_string("doc-%08d", F.col("id")))
        .alias("doc_id")
    )


def test_salted_uniqueness_correct_under_extreme_skew(spark):
    docs = _skewed(spark)
    dups = {r["doc_id"]: r["n_occurrences"]
            for r in uniqueness.duplicate_doc_ids(docs, n_salts=16).collect()}
    assert dups == {"doc-HOT": 10_000}


def test_phase1_bounds_hot_key_per_reducer(spark):
    """Phase 1 groups by (doc_id, salt): the hot key's rows split across
    salts, so no single phase-2 input row exceeds rows/salts-ish."""
    docs = _skewed(spark)
    partial = (
        docs.withColumn("_salt", F.spark_partition_id() % 16)
        .groupBy("doc_id", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("doc_id") == "doc-HOT")
        .collect()
    )
    assert len(partial) > 1  # hot key split across salts
    assert max(r["c"] for r in partial) < 10_000  # no reducer saw it all
    assert sum(r["c"] for r in partial) == 10_000
