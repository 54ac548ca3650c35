"""Unit tests for the round-5 pipeline operators: textstats.pii_scrub
(regex PII redaction, JVM-only) and stats.embedding_stats (embedding-
column validation). The driver-facing oracle parity lives in
driver_queries (pii_scrub / embedding_stats entries); these pin the
operator semantics on crafted rows the synthetic corpus can't produce
(null vectors, NaN elements, ragged dims, multiple PII per doc).
"""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import stats, textstats


def test_pii_scrub_counts_and_replacements(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.smith@corp.example.com today"),
            (2, "see https://docs.example.org/a/b and http://x.io/q"),
            (3, "call +1-555-0199 or +44-123-456789"),
            (4, "no pii here at all"),
            (5, "mixed: bob@x.co http://y.z/p +1-555-0000"),
            (6, "case: John.Doe@Example.COM HTTPS://Host.Example.ORG/Q"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textstats.pii_scrub(df).collect()}

    assert (out[1]["n_emails"], out[1]["n_urls"], out[1]["n_phones"]) == (1, 0, 0)
    assert out[1]["text"] == "write to <EMAIL> today"
    assert (out[2]["n_emails"], out[2]["n_urls"], out[2]["n_phones"]) == (0, 2, 0)
    assert out[2]["text"] == "see <URL> and <URL>"
    assert (out[3]["n_emails"], out[3]["n_urls"], out[3]["n_phones"]) == (0, 0, 2)
    assert out[3]["text"] == "call <PHONE> or <PHONE>"
    assert (out[4]["n_emails"], out[4]["n_urls"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[4]["text"] == "no pii here at all"
    assert (out[5]["n_emails"], out[5]["n_urls"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["text"] == "mixed: <EMAIL> <URL> <PHONE>"
    # case-MIXED PII is redacted too ([A-Za-z] classes, no (?i) flag)
    assert (out[6]["n_emails"], out[6]["n_urls"], out[6]["n_phones"]) == (1, 1, 0)
    assert out[6]["text"] == "case: <EMAIL> <URL>"


def test_pii_scrub_is_pure_jvm(spark):
    """No Python evaluation anywhere in the plan (the scrub runs at
    100 TB inside codegen)."""
    df = spark.createDataFrame([(1, "a@b.co")], ["doc_id", "text"])
    plan = textstats.pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_embedding_stats_flags_bad_vectors(spark):
    rows = [
        Row(vec_id=0, embedding=[3.0, 4.0]),            # norm 5
        Row(vec_id=1, embedding=[0.0, 0.0]),            # norm 0
        Row(vec_id=2, embedding=None),                  # null vector
        Row(vec_id=3, embedding=[1.0, float("nan")]),   # NaN element
        Row(vec_id=4, embedding=[float("inf"), 0.0]),   # Inf element
        Row(vec_id=5, embedding=[1.0, 0.0, 0.0]),       # ragged dim
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = stats.embedding_stats(df).collect()[0]

    assert r["n_vecs"] == 6
    assert r["n_null_vec"] == 1
    assert r["min_dim"] == 2
    assert r["max_dim"] == 3
    assert r["n_nonfinite"] == 2
    assert r["min_norm"] == 0.0
    # max over finite norms only when the non-finite rows produce
    # NaN/Inf norms — max_norm is reported over ALL rows, so the Inf
    # row dominates; the gate signal is n_nonfinite, the bounds are
    # diagnostics. NaN ordering: Spark's max treats NaN as largest.
    assert r["max_norm"] == float("inf") or math.isnan(r["max_norm"])


def test_embedding_stats_clean_corpus(spark):
    df = spark.createDataFrame(
        [(i, [float(i + 1), 0.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    r = stats.embedding_stats(df).collect()[0]
    assert (r["n_null_vec"], r["n_nonfinite"]) == (0, 0)
    assert (r["min_dim"], r["max_dim"]) == (2, 2)
    assert r["min_norm"] == 1.0 and r["max_norm"] == 10.0
