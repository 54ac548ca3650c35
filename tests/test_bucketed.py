"""Bucketed-join plan evidence: joining two tables bucketed on the same
key with the same bucket count must produce NO shuffle (no Exchange) on
either side — the co-located join strategy for repeated doc_id work."""

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.sources import bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf — use the session default (managed
    # tables are dropped in finally)
    docs = datagen.documents_spans(spark, 2000)
    profile = docs.select("doc_id", F.size("spans").alias("n_spans"))

    # force a non-broadcast join so the strategy matters
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed.write_bucketed(docs, "docs_b")
        bucketed.write_bucketed(profile, "profile_b")
        j = bucketed.read_table(spark, "docs_b").join(
            bucketed.read_table(spark, "profile_b"), "doc_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert j.count() >= 2000  # dup doc_ids multiply — join is real

        # unbucketed baseline DOES shuffle — the contrast proves the win
        plain = docs.join(profile, "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS docs_b")
        spark.sql("DROP TABLE IF EXISTS profile_b")
