"""The Arrow mapInPandas rule path must be row-identical to the JVM
higher-order-function path on the full injected-violation corpus."""

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators.arrow_rules import arrow_span_violations
from intent_classifier_service_spark.plans import rules as R


def test_arrow_path_matches_jvm_path(spark):
    docs = datagen.documents_spans(spark, 3000)
    jvm = R.violations(docs, R.RuleSet(doc_rules=[]))
    arrow = arrow_span_violations(docs)
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0


def test_arrow_path_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            ("empty", []),
            ("nullspans", None),
            ("good", [("text", "x", None, 0)]),
            ("bad", [("tezt", None, None, 3), ("text", "y", None, 1)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = sorted(
        (r["doc_id"], r["rule_id"], r["span_index"])
        for r in arrow_span_violations(docs).collect()
    )
    # unknown kind 'tezt' is judged by R-SPAN-KIND only (no MUTEX
    # double-count — same semantics as the JVM rule set)
    assert got == [
        ("bad", "R-SPAN-KIND", 0),
        ("bad", "R-SPAN-MONO", 1),
    ]
