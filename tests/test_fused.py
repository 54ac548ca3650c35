"""The one-scan fused verdicts+drift pass must be row-identical to the
separate R.verdicts and drift.drift_profile passes."""

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators import drift
from intent_classifier_service_spark.plans import rules as R
from intent_classifier_service_spark.plans.fused import fused_verdicts_and_drift


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_matches_separate_passes(spark):
    # datagen always emits >= 1 span; union in the degenerate docs
    # (null spans, empty spans, null doc_id) so the one-per-doc text
    # counting and null-bucket exclusion are pinned equal on the edge
    # cases too, not just the happy path
    docs = datagen.documents_spans(spark, 2000).unionByName(
        spark.createDataFrame(
            [("null-spans", None, 3), ("empty-spans", [], 5)],
            datagen.documents_spans(spark, 1).schema,
        )
    )
    rules = R.RuleSet()

    vd_f, kind_f, off_f, lang_f, q_f, counts_f = fused_verdicts_and_drift(
        docs, rules, lo=0, hi=128
    )

    vd_sep = R.verdicts(docs, rules, by=("part_key",))
    assert sorted(vd_f.columns) == sorted(vd_sep.columns)
    assert _rows(vd_f.select(*vd_sep.columns)) == _rows(vd_sep)

    kind_sep, off_sep = drift.drift_profile(docs, lo=0, hi=128)
    assert _rows(kind_f) == _rows(kind_sep)
    assert _rows(off_f) == _rows(off_sep)

    # the text distributions fused into the same scan must match the
    # standalone doc-level pass (one-per-doc counting despite the fan-out
    # of _lang/_qb over span rows)
    lang_sep, q_sep = drift.text_distributions(docs)
    assert _rows(lang_f) == _rows(lang_sep)
    assert _rows(q_f) == _rows(q_sep)

    # the fused per-partition profile counts must equal the standalone
    # incremental-resume pass (drift.partitioned_profile_counts) row
    # for row — the invariant that makes merge-based resume exact
    counts_sep = drift.partitioned_profile_counts(docs, lo=0, hi=128)
    assert _rows(counts_f) == _rows(counts_sep)
    # and summing them reproduces the global distributions exactly
    m_kind, m_off, m_lang, m_q = drift.distributions_from_counts(
        spark, counts_sep
    )
    assert _rows(m_kind) == _rows(kind_sep)
    assert _rows(m_off) == _rows(off_sep)
    assert _rows(m_lang) == _rows(lang_sep)
    assert _rows(m_q) == _rows(q_sep)


def test_fused_is_one_scan(spark):
    """The grouping-sets plan reads the docs relation once: a single
    scan node feeding one aggregation (Expand), instead of the two
    scans the separate passes issue."""
    docs = datagen.documents_spans(spark, 200)

    # count scan nodes in the analyzed plan of the aggregation the
    # fused pass collects — build it without collecting
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.functions import spans as S

    flagged = docs.select("part_key", "spans")
    exploded = S.explode_spans(flagged, keep=("part_key",), outer=True)
    gs = exploded.withColumn("off_bucket", F.lit(0)).groupingSets(
        [["part_key"], ["kind"], ["off_bucket"]], "part_key", "kind", "off_bucket"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = gs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 1
    assert "Expand" in plan  # grouping sets expand, one source


def test_fused_repetition_rules_match_standalone(spark):
    """Round-6 verdict #8: the Gopher-style repetition DocRules (the
    columns text_profile exposes standalone) must produce IDENTICAL
    verdicts through the fused grouping-sets scan and the separate
    R.verdicts pass — the two paths may not drift. Docs with planted
    repeated lines / 2-gram spam make the parity non-vacuous."""
    from pyspark.sql import functions as F

    docs = datagen.documents_spans(spark, 400)
    # plant intra-doc repetition: every span's text becomes (a) a
    # repeated-line block for half the planted docs, (b) 2-gram spam
    # long enough to clear the min_tokens gate for the other half
    rep_lines = (
        docs.limit(20)
        .withColumn("doc_id", F.concat(F.lit("rep-l-"), "doc_id"))
        .withColumn("spans", F.transform(
            "spans",
            lambda s: s.withField(
                "text",
                F.when(s["kind"] == "text",
                       F.lit("dup line\ndup line\ndup line\nunique tail"))
                .otherwise(s["text"]))))
    )
    spam = " ".join(["spam ham"] * 15)
    rep_grams = (
        docs.limit(20)
        .withColumn("doc_id", F.concat(F.lit("rep-g-"), "doc_id"))
        .withColumn("spans", F.transform(
            "spans",
            lambda s: s.withField(
                "text",
                F.when(s["kind"] == "text", F.lit(spam)).otherwise(s["text"]))))
    )
    all_docs = docs.unionByName(rep_lines).unionByName(rep_grams)
    rules = R.RuleSet(doc_rules=[*R.DOC_RULES, *R.repetition_rules()])

    vd_f, *_ = fused_verdicts_and_drift(all_docs, rules, lo=0, hi=128)
    vd_sep = R.verdicts(all_docs, rules, by=("part_key",))
    assert sorted(vd_f.columns) == sorted(vd_sep.columns)
    assert _rows(vd_f.select(*vd_sep.columns)) == _rows(vd_sep)

    # non-vacuous: both repetition rules actually fired
    fired = {
        r["rule_id"]: r["nv"]
        for r in vd_f.groupBy("rule_id")
        .agg(F.sum("n_violations").alias("nv")).collect()
    }
    assert fired["R-DOC-REP-LINES"] > 0
    assert fired["R-DOC-REP-2GRAM"] > 0
