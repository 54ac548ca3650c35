"""Gopher-style intra-doc repetition metrics + the opt-in repetition
doc rules: a repetitive corpus must FAIL the validation gate the same
way a schema break does; a clean corpus must pass."""

from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import textstats as T
from intent_classifier_service_spark.plans import rules as R


def test_repetition_expressions_values(spark):
    rows = [
        (0, "a b c d e f"),                   # no repetition
        (1, "x y x y x y x y"),               # 2-gram "x y" 4 of 7
        (2, "l one\nl two\nl one\nl one"),    # 4 lines, 2 distinct
        (3, None),
        (4, ""),
        (5, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["rep"], r["mass"])
        for r in df.select(
            "doc_id",
            F.round(T.repeated_line_fraction("text"), 4).alias("rep"),
            F.round(T.top_ngram_mass("text", 2), 4).alias("mass"),
        ).collect()
    }
    assert got[0] == (0.0, round(1 / 5, 4))  # max 2-gram count 1 of 5
    assert got[1] == (0.0, round(4 / 7, 4))
    assert got[2][0] == 0.5
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)
    assert got[5] == (0.0, 0.0)


def _span_docs(spark, texts_by_doc):
    rows = [
        (
            f"doc-{i:04d}",
            [
                {"kind": "text", "text": t, "media_ref": None, "offset": j * 10}
                for j, t in enumerate(texts)
            ],
            "p0",
        )
        for i, texts in enumerate(texts_by_doc)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>, part_key string",
    )


def test_repetitive_corpus_fails_gate(spark):
    """6 of 8 docs are line-spam / 2-gram-spam → both repetition rules
    see flagged fractions far above their 5% bar → gate False. The
    same corpus passes the DEFAULT rule set (the rules are opt-in and
    these docs are otherwise valid), and a clean corpus passes the
    extended set — so the failure is attributable to repetition."""
    spam_lines = "\n".join(["call now right away"] * 5) + "\nthe end"
    spam_grams = "buy now " * 12
    corpus = _span_docs(
        spark,
        [[spam_lines], [spam_grams], [spam_lines], [spam_grams],
         [spam_lines, spam_grams], [spam_grams],
         ["a perfectly normal sentence with distinct words"],
         ["another fine document\nwith two different lines"]],
    )
    rs = R.RuleSet(doc_rules=[*R.DOC_RULES, *R.repetition_rules()])
    vd = R.verdicts(corpus, rs).collect()
    by_rule = {r["rule_id"]: r for r in vd}
    assert not by_rule["R-DOC-REP-LINES"]["pass"]
    assert not by_rule["R-DOC-REP-2GRAM"]["pass"]
    assert by_rule["R-DOC-REP-LINES"]["n_violations"] == 3
    # line-spam docs are ALSO 2-gram spam ("call now call now ..." after
    # the whitespace tokenizer flattens newlines), so all 6 spam docs
    # trip the 2-gram rule
    assert by_rule["R-DOC-REP-2GRAM"]["n_violations"] == 6
    assert R.gate(R.verdicts(corpus, rs)) is False
    assert R.gate(R.verdicts(corpus, R.RuleSet())) is True

    clean = _span_docs(
        spark,
        [[f"doc {i} sentence alpha\nsecond line beta {i}"] for i in range(8)],
    )
    assert R.gate(R.verdicts(clean, rs)) is True


def test_repetition_violation_rows(spark):
    """violations() emits standard-shaped rows (span_index NULL,
    observed = formatted metric) for the repetition rules."""
    corpus = _span_docs(
        spark, [["dup\ndup\ndup\nx"], ["all words here are distinct"]]
    )
    rs = R.RuleSet(doc_rules=[*R.DOC_RULES, *R.repetition_rules()])
    rows = R.violations(corpus, rs).filter(
        F.col("rule_id").startswith("R-DOC-REP")
    ).collect()
    # doc-0000 is under min_tokens → only the line rule fires; the
    # short all-distinct doc (mass 1/4 > 0.2 but 5 tokens) fires none
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == "doc-0000"
    assert r["span_index"] is None
    assert r["observed"] == "rep_line_frac=0.5000"


def test_repetition_rules_ride_fused_scan(spark):
    """The fused one-scan path produces identical verdicts for the
    extended rule set — the repetition rules cost no extra pass."""
    from intent_classifier_service_spark.plans import fused

    corpus = _span_docs(
        spark,
        [["spam\nspam\nspam"], ["normal text one"], ["normal text two"]],
    )
    rs = R.RuleSet(doc_rules=[*R.DOC_RULES, *R.repetition_rules()])
    vd_part, *_ = fused.fused_verdicts_and_drift(corpus, rs)
    sep = {(r["rule_id"]): (r["n_checked"], r["n_violations"], r["pass"])
           for r in R.verdicts(corpus, rs, by=("part_key",)).collect()}
    fus = {(r["rule_id"]): (r["n_checked"], r["n_violations"], r["pass"])
           for r in vd_part.collect()}
    assert sep == fus
    assert fus["R-DOC-REP-LINES"] == (3, 1, False)
