"""The full evaluation pipeline on the ATIS-shaped synthetic table —
reference evaluate() flow parity (unknown-class filtering, response
validation, metrics, load gate)."""

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators import evaluate as E


def test_unknown_class_filter(spark):
    labels = datagen.intent_labels(spark)
    df = spark.createDataFrame(
        [("q1", ["flight"]), ("q2", ["day_name"]), ("q3", ["flight", "day_name"])],
        "id string, actual_list array<string>",
    )
    unknown = [r["intent"] for r in E.unknown_classes(df, "actual_list", labels).collect()]
    assert unknown == ["day_name"]
    kept = E.filter_unknown_class_rows(df, "actual_list", labels)
    assert [r["id"] for r in kept.collect()] == ["q1"]


def test_evaluate_end_to_end(spark):
    q = datagen.queries_labeled(spark, 848)
    labels = datagen.intent_labels(spark)
    res = E.evaluate(q, labels)
    # unseen 'day_name' rows filtered out
    assert res.n_rows < 848
    assert 0 < res.n_valid <= res.n_rows
    # malformed corpus injected at ~1% → valid rate high but < 1.0
    assert 0.95 < res.n_valid / res.n_rows < 1.0
    assert 0.0 < res.subset_accuracy <= 1.0
    per_class = {r["class"] for r in res.per_class.collect()}
    assert "flight" in per_class
    averaged = {r["average"] for r in res.averaged.collect()}
    assert averaged == {"macro", "micro", "weighted"}
    assert res.cooccurrence.count() > 0
    # the gate mirrors the reference: valid>=95% AND accuracy>=0.80
    expected_gate = (res.n_valid / res.n_rows >= 0.95) and (res.subset_accuracy >= 0.80)
    assert res.gate_pass == expected_gate


def test_evaluate_with_stratified_sample(spark):
    q = datagen.queries_labeled(spark, 848)
    labels = datagen.intent_labels(spark)
    res = E.evaluate(q, labels, test_size=100)
    assert res.n_rows == 100


def test_evaluate_runs_model_udf_once_per_row(spark):
    """The validated frame is persisted before the ~6-action metric
    fan-out, so an expensive model UDF upstream runs exactly once per
    row — not once per downstream action."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType
    from intent_classifier_service_spark.operators.model_call import _fake_response

    calls = spark.sparkContext.accumulator(0)

    @pandas_udf(StringType())
    def counting_model(texts: pd.Series) -> pd.Series:
        calls.add(len(texts))
        return texts.map(lambda t: _fake_response(t or "", 17))

    q = datagen.queries_labeled(spark, 500).drop("raw_response").withColumn(
        "raw_response", counting_model(F.col("user_prompt"))
    )
    labels = datagen.intent_labels(spark)
    res = E.evaluate(q, labels)
    # consume every metric output (each is a separate Spark action)
    res.per_class.collect()
    res.averaged.collect()
    res.cooccurrence.collect()
    res.incorrect.collect()
    # the filter_unknown_class_rows pre-pass runs before the persist and
    # does not touch raw_response (column pruning keeps the UDF out of
    # that scan), so total invocations == rows surviving the filter
    assert calls.value == res.n_rows, f"model ran {calls.value}x for {res.n_rows} rows"
    res.unpersist()
