"""EP1 full loop: predict (vectorized model-call stub) → validate →
convert → metrics — the reference's predict_test_set + evaluate flow
with zero sequential round-trips."""

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators import evaluate as E
from intent_classifier_service_spark.operators import metrics as M
from intent_classifier_service_spark.operators import model_call


def test_predict_is_deterministic_and_shaped(spark):
    df = spark.createDataFrame(
        [(i, f"show flights case {i}") for i in range(200)], "id int, user_prompt string"
    )
    a = model_call.predict(df).collect()
    b = model_call.predict(df).collect()
    assert sorted(r["raw_response"] for r in a) == sorted(r["raw_response"] for r in b)
    shaped = [r for r in a if r["raw_response"].startswith("[")]
    assert len(shaped) > 190  # occasional malformed injected


def test_full_predict_evaluate_loop(spark):
    q = datagen.queries_labeled(spark, 400).drop("raw_response", "predicted_intents")
    labels = datagen.intent_labels(spark)
    predicted = model_call.predict(q, text_col="user_prompt")
    res = E.evaluate(predicted, labels)
    assert res.n_rows > 0
    assert res.n_valid > 0
    # fake model is random-ish → accuracy low → gate must fail honestly
    assert res.gate_pass == (
        (res.n_valid / res.n_rows >= 0.95) and (res.subset_accuracy >= 0.80)
    )


def test_cooccurrence_pivot(spark):
    df = spark.createDataFrame(
        [("a", ["a", "b"]), ("b", ["a"])],
        "x string, y array<string>",
    ).select(F.array("x").alias("actual"), F.col("y").alias("predicted"))
    wide = M.cooccurrence_pivot(M.cooccurrence_matrix(df)).collect()
    rows = {r["actual_class"]: r for r in wide}
    assert rows["a"]["a"] == 1 and rows["a"]["b"] == 1
    assert rows["b"]["a"] == 1 and rows["b"]["b"] == 0
