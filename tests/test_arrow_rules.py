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


def test_arrow_path_null_span_elements(spark):
    """Null elements inside a spans array: both backends must index
    them (span_index counts them), fire R-SPAN-KIND on the null kind,
    and break the monotone chain at them (prev_offset is not computed
    across the gap)."""
    docs = spark.createDataFrame(
        [
            # [s0, null, s2]: kind-null at 1; offset 16 at index 2 is
            # NOT compared against 0 at index 0 (null breaks the chain)
            ("withnull", [("text", "a", None, 0), None, ("text", "c", None, 16)]),
            # null then a decreasing pair later: MONO fires at index 2
            ("mono", [None, ("text", "a", None, 9), ("text", "b", None, 3)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    jvm = R.violations(docs, R.RuleSet(doc_rules=[]))
    arrow = arrow_span_violations(docs)
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0
    got = sorted(
        (r["doc_id"], r["rule_id"], r["span_index"])
        for r in arrow.collect()
    )
    assert got == [
        ("mono", "R-SPAN-KIND", 0),
        ("mono", "R-SPAN-MONO", 2),
        ("withnull", "R-SPAN-KIND", 1),
    ]
