"""Span-rule unit tests, incl. the validator verdict table transliterated
from the reference's server_launch_examples.ipynb cells 4-16 (SURVEY §5)."""

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.functions import spans as S
from intent_classifier_service_spark.plans import rules as R


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


GOOD = [("d1", [("text", "hello", None, 0), ("media", None, "media-00001", 5)])]
BAD_KIND = [("d2", [("tezt", "x", None, 0)])]
BAD_MUTEX_BOTH = [("d3", [("text", "x", "media-00001", 0)])]
BAD_MUTEX_NONE = [("d4", [("media", None, None, 0)])]
BAD_MONO = [("d5", [("text", "a", None, 5), ("text", "b", None, 5)])]


def test_good_doc_has_no_violations(spark):
    v = R.violations(_docs(spark, GOOD))
    assert v.count() == 0


def test_kind_violation(spark):
    v = R.violations(_docs(spark, BAD_KIND)).collect()
    assert len(v) == 1
    assert v[0]["rule_id"] == "R-SPAN-KIND"
    assert v[0]["span_index"] == 0
    assert v[0]["observed"] == "tezt"


def test_mutex_violations(spark):
    v = R.violations(_docs(spark, BAD_MUTEX_BOTH + BAD_MUTEX_NONE))
    rows = {r["doc_id"]: r for r in v.collect()}
    assert rows["d3"]["rule_id"] == "R-SPAN-MUTEX"
    assert rows["d4"]["rule_id"] == "R-SPAN-MUTEX"


def test_monotone_violation_positions(spark):
    v = R.violations(_docs(spark, BAD_MONO)).collect()
    assert len(v) == 1
    assert v[0]["rule_id"] == "R-SPAN-MONO"
    assert v[0]["span_index"] == 1  # the second span breaks monotonicity
    assert v[0]["observed"] == "offset=5,prev=5"


def test_doc_rules(spark):
    docs = _docs(spark, [("", [("text", "x", None, 0)]), ("d6", [])])
    got = {r["rule_id"] for r in R.violations(docs).collect()}
    assert got == {"R-DOC-ID-NOTNULL", "R-DOC-SPANS-NONEMPTY"}


def test_hof_equals_pandas_udf(spark):
    """The JVM fast path and the Arrow pandas-UDF path must agree on
    every datagen doc (includes all injected violation types)."""
    docs = datagen.documents_spans(spark, 2000)
    mismatches = docs.select(
        (S.doc_kinds_valid(F.col("spans")) == S.pdf_kinds_valid(F.col("spans"))).alias("k"),
        (S.doc_mutex_valid(F.col("spans")) == S.pdf_mutex_valid(F.col("spans"))).alias("m"),
        (S.doc_offsets_monotone(F.col("spans")) == S.pdf_offsets_monotone(F.col("spans"))).alias("o"),
    ).filter(~F.col("k") | ~F.col("m") | ~F.col("o"))
    assert mismatches.count() == 0


def test_span_sequence_parity_through_explode(spark):
    """Per-row invariant (BASELINE.json input_hint): reconstructing the
    spans from the exploded form preserves (kind, text, media_ref, order)."""
    docs = datagen.documents_spans(spark, 500).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    original = docs.select("_rid", S.span_sequence(F.col("spans")).alias("seq"))
    rebuilt = (
        S.explode_spans(docs, keep=("_rid",))
        .groupBy("_rid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_index", "kind", "text", "media_ref"))
            ).alias("arr")
        )
        .select(
            "_rid",
            F.array_join(
                F.transform(
                    "arr",
                    lambda s: F.concat_ws(
                        "\x01",
                        F.coalesce(s["kind"], F.lit("\x00")),
                        F.coalesce(s["text"], F.lit("\x00")),
                        F.coalesce(s["media_ref"], F.lit("\x00")),
                    ),
                ),
                "\x02",
            ).alias("seq"),
        )
    )
    assert original.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(original).count() == 0


def test_verdict_counts_match_violation_rows(spark):
    docs = datagen.documents_spans(spark, 2000)
    by_rule = {
        r["rule_id"]: r["count"]
        for r in R.violations(docs).groupBy("rule_id").count().collect()
    }
    for row in R.verdicts(docs).collect():
        assert row["n_violations"] == by_rule.get(row["rule_id"], 0), row["rule_id"]


def test_gate(spark):
    assert R.gate(R.verdicts(_docs(spark, GOOD)))
    strict = R.RuleSet(max_violation_rate=0.0)
    assert not R.gate(R.verdicts(_docs(spark, GOOD + BAD_KIND), strict))


def test_per_rule_thresholds(spark):
    """A rule's own threshold overrides the set-wide bar in verdicts,
    rollup, the fused pass, and the string-keyed threshold_expr used
    by checkpoint reconstruction — unknown rule ids fall back to the
    default."""
    import dataclasses

    from pyspark.sql import functions as F
    from intent_classifier_service_spark import datagen
    from intent_classifier_service_spark.plans import fused as PF

    docs = datagen.documents_spans(spark, 1000)
    base = {r["rule_id"]: r["pass"]
            for r in R.verdicts(docs, R.RuleSet()).collect()}
    assert all(base.values())  # injected rates sit under the 5% default

    strict = R.RuleSet(span_rules=[
        dataclasses.replace(r, threshold=0.0) if r.rule_id == "R-SPAN-MONO" else r
        for r in R.SPAN_RULES
    ])
    assert strict.threshold_for("R-SPAN-MONO") == 0.0
    assert strict.threshold_for("R-SPAN-KIND") == strict.max_violation_rate
    assert strict.threshold_for("R-DOC-UNIQUE") == strict.max_violation_rate

    got = {r["rule_id"]: r["pass"] for r in R.verdicts(docs, strict).collect()}
    assert got["R-SPAN-MONO"] is False      # any violation now fails it
    for rid, ok in base.items():
        if rid != "R-SPAN-MONO":
            assert got[rid] is ok           # others keep the default bar

    vd_part = R.verdicts(docs, strict, by=("part_key",))
    roll = {r["rule_id"]: r["pass"]
            for r in R.rollup_verdicts(
                vd_part.select("part_key", "rule_id", "n_checked", "n_violations"),
                strict).collect()}
    assert roll["R-SPAN-MONO"] is False and roll["R-SPAN-KIND"] is True

    fused_vd = PF.fused_verdicts_and_drift(docs, strict)[0]
    fg = {(r["rule_id"]): r["pass"] for r in
          fused_vd.groupBy("rule_id").agg(F.min("pass").alias("pass")).collect()}
    assert fg["R-SPAN-MONO"] is False

    # threshold_expr over a reconstructed-stats-shaped frame
    df = spark.createDataFrame(
        [("R-SPAN-MONO", 0.001), ("R-SPAN-KIND", 0.001), ("R-DOC-UNIQUE", 0.001)],
        "rule_id string, violation_rate double",
    ).withColumn("pass", F.col("violation_rate") <= strict.threshold_expr())
    out = {r["rule_id"]: r["pass"] for r in df.collect()}
    assert out == {"R-SPAN-MONO": False, "R-SPAN-KIND": True, "R-DOC-UNIQUE": True}


def test_partition_valid_split(spark):
    """clean ∪ quarantined ≡ docs, disjoint; null-id docs quarantine
    even though no id join can reach them; BOTH copies of a duplicated
    id quarantine; blank ids quarantine via the id join."""
    from intent_classifier_service_spark import datagen

    good = datagen.documents_spans(spark, 200)
    edge = spark.createDataFrame(
        [
            (None, [("text", "ok", None, 0)], 1),       # null id → doc rule
            ("  ", [("text", "ok", None, 0)], 1),       # blank id → doc rule
            ("dup", [("text", "a", None, 0)], 2),       # duplicated id ×2
            ("dup", [("text", "b", None, 0)], 3),
            ("badspan", [("tezt", "x", None, 0)], 4),   # kind violation
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, part_key int",
    )
    docs = good.unionByName(edge)
    refs = datagen.valid_media_refs(spark)
    clean, quar = R.partition_valid(docs, refs)

    n_docs, n_clean, n_quar = docs.count(), clean.count(), quar.count()
    assert n_clean + n_quar == n_docs
    # disjoint (null ids only ever in quarantine; join on id for the rest)
    both = clean.join(quar, "doc_id", "left_semi")
    assert both.count() == 0

    quar_ids = {r["doc_id"] for r in quar.select("doc_id").collect()}
    assert None in quar_ids and "  " in quar_ids
    assert "dup" in quar_ids and "badspan" in quar_ids
    assert quar.filter(F.col("doc_id") == "dup").count() == 2
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert None not in clean_ids and "dup" not in clean_ids
