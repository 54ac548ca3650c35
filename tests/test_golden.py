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
