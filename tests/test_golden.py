"""Golden end-to-end test (SURVEY §5): the full violation output for the
seeded 1k-doc synthetic table is pinned to a committed CSV — the direct
analog of the reference's model_evaluation/ golden artifacts. Any change
to rule semantics, datagen, or explode plumbing that alters a single
violation row fails here."""

import os

import pandas as pd

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators import referential, uniqueness
from intent_classifier_service_spark.plans import rules as R

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "violations_1k.csv")


def test_golden_violations_1k(spark):
    docs = datagen.documents_spans(spark, 1000)
    refs = datagen.valid_media_refs(spark)
    v = (
        R.violations(docs)
        .unionByName(referential.referential_violations(docs, refs))
        .unionByName(uniqueness.uniqueness_violations(docs))
    )
    got = v.toPandas().fillna({"span_index": -1})
    got["span_index"] = got["span_index"].astype(int)
    got = got.sort_values(
        ["rule_id", "doc_id", "span_index", "observed"]
    ).reset_index(drop=True)

    expected = pd.read_csv(GOLDEN, keep_default_na=False)
    expected["span_index"] = expected["span_index"].astype(int)

    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_golden_metric_tables_848(spark):
    """Metric-table goldens from an end-to-end evaluate() run — the
    engine analog of the reference's committed model_evaluation/*.csv
    regression artifacts (gpt_intent_classifier.py:1015-1018): per-class
    P/R/F1, macro/micro/weighted averages, and the co-occurrence
    confusion, pinned value-for-value."""
    from intent_classifier_service_spark.operators import evaluate as E

    g = os.path.join(os.path.dirname(__file__), "golden")
    q = datagen.queries_labeled(spark, 848)
    labels = datagen.intent_labels(spark)
    res = E.evaluate(q, labels)
    assert (res.n_rows, res.n_valid) == (845, 836)
    assert round(res.subset_accuracy, 9) == 0.906698565
    assert res.gate_pass is True

    def check(df, golden, sort_cols, round_cols=("precision", "recall", "f1")):
        got = df.toPandas().sort_values(sort_cols).reset_index(drop=True)
        for c in round_cols:
            if c in got.columns:
                got[c] = got[c].round(9)
        exp = pd.read_csv(os.path.join(g, golden), keep_default_na=False)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    check(res.per_class, "eval_per_class_848.csv", ["class"])
    check(res.averaged, "eval_averaged_848.csv", ["average"])
    check(res.cooccurrence, "eval_cooccurrence_848.csv",
          ["actual_class", "predicted_class"], round_cols=())
    res.unpersist()
