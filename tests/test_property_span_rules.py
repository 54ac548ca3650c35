"""Property-based tests (hypothesis): for arbitrary generated span
arrays, the Spark rule engine must agree with a direct Python
re-implementation of the rule semantics — catching edge cases the
fixed corpus misses (nulls everywhere, empty arrays, single spans,
equal offsets, unicode)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from intent_classifier_service_spark.plans import rules as R

kind_s = st.sampled_from(["text", "media", "tezt", "", None])
text_s = st.one_of(st.none(), st.text(min_size=0, max_size=5))
ref_s = st.one_of(st.none(), st.sampled_from(["media-00001", "m", "媒体"]))
offset_s = st.one_of(st.integers(min_value=-5, max_value=20))

span_s = st.tuples(kind_s, text_s, ref_s, offset_s)
doc_s = st.tuples(
    st.text(min_size=1, max_size=6, alphabet="abc123"),
    st.lists(span_s, min_size=0, max_size=6),
)


def python_violations(doc_id, spans):
    """Direct transliteration of the rule semantics."""
    out = []
    for i, (kind, text, ref, off) in enumerate(spans):
        if kind not in ("text", "media"):
            out.append((doc_id, "R-SPAN-KIND", i))
        if kind == "text" and (text is None or ref is not None):
            out.append((doc_id, "R-SPAN-MUTEX", i))
        if kind == "media" and (ref is None or text is not None):
            out.append((doc_id, "R-SPAN-MUTEX", i))
        if i > 0 and off <= spans[i - 1][3]:
            out.append((doc_id, "R-SPAN-MONO", i))
    if not spans:
        out.append((doc_id, "R-DOC-SPANS-NONEMPTY", None))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(doc_s, min_size=1, max_size=8))
def test_rules_match_python_reference(spark, docs):
    # distinct doc ids so expected rows can be keyed
    rows = [(f"{d}-{i}", spans) for i, (d, spans) in enumerate(docs)]
    sdf = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = sorted(
        (r["doc_id"], r["rule_id"], r["span_index"])
        for r in R.violations(sdf).collect()
    )
    expected = sorted(
        (d, rid, i)
        for doc_id, spans in rows
        for d, rid, i in python_violations(doc_id, spans)
    )
    assert got == expected


span_or_null_s = st.one_of(st.none(), span_s)
doc_with_nulls_s = st.tuples(
    st.text(min_size=1, max_size=6, alphabet="abc123"),
    st.lists(span_or_null_s, min_size=0, max_size=6),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(doc_with_nulls_s, min_size=1, max_size=6))
def test_arrow_backend_matches_jvm_on_arbitrary_spans(spark, docs):
    """Backend parity under hypothesis: arbitrary spans INCLUDING null
    elements — both backends must emit identical violation rows."""
    from intent_classifier_service_spark.operators.arrow_rules import arrow_span_violations

    rows = [(f"{d}-{i}", spans) for i, (d, spans) in enumerate(docs)]
    sdf = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    jvm = sorted(tuple(r) for r in R.violations(sdf, R.RuleSet(doc_rules=[])).collect())
    arrow = sorted(tuple(r) for r in arrow_span_violations(sdf).collect())
    assert jvm == arrow
