"""Validator verdict table from the reference's
server_launch_examples.ipynb cells 4-16 (SURVEY §5 item 3), vectorized."""

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators import response_validation as RV

# (response, expected_valid) — domain = labels 0..16
CASES = [
    ("[3, 1, 5]", True),
    ("   [3,  1, 5  ]", True),   # whitespace accepted
    ("[3, 99, 5]", False),        # out-of-domain label
    ("[3, 1, ]", False),
    ("3, 1, 2", False),
    ("[@, 3, 2 1]", False),
    ("['flight','airfare','city']", False),
    ("flight intent detected", False),  # prose (malformed_responses.txt)
    ("[0, 0, 16]", True),
]


def test_validator_verdicts(spark):
    df = spark.createDataFrame([(i, c) for i, (c, _) in enumerate(CASES)],
                               "id int, raw_response string")
    labels = datagen.intent_labels(spark)
    got = {r["id"]: r["valid"] for r in RV.validate_responses(df, labels).collect()}
    for i, (resp, expected) in enumerate(CASES):
        assert got[i] == expected, resp


def test_labels_to_intents_preserves_order(spark):
    df = spark.createDataFrame([(1, "[2, 0, 1]")], "id int, raw_response string")
    labels = datagen.intent_labels(spark)
    validated = RV.validate_responses(df, labels)
    out = RV.labels_to_intents(validated, labels).collect()[0]
    assert out["pred_intents"] == ["airfare", "flight", "flight_time"]


def test_format_server_response(spark):
    df = spark.createDataFrame(
        [(1, ["airfare", "flight", "flight_time"])], "id int, pred_intents array<string>"
    )
    out = RV.format_server_response(df).collect()[0]
    assert out["response_json"] == (
        '{"intents":[{"label":"airfare"},{"label":"flight"},{"label":"flight_time"}]}'
    )


def test_validity_verdict_gate(spark):
    df = spark.createDataFrame([(i, c) for i, (c, _) in enumerate(CASES)],
                               "id int, raw_response string")
    labels = datagen.intent_labels(spark)
    v = RV.validity_verdict(RV.validate_responses(df, labels)).collect()[0]
    n_valid = sum(1 for _, e in CASES if e)
    assert v["n_checked"] == len(CASES)
    assert v["n_valid"] == n_valid
    assert v["pass"] == (n_valid / len(CASES) >= 0.95)


def test_map_and_join_intent_conversion_agree(spark):
    """The zero-shuffle map-transform conversion and the positional
    explode/broadcast-join variant (SURVEY J6) must produce identical
    pred_intents — including order preservation and unknown→null."""
    from pyspark.sql import functions as F
    from intent_classifier_service_spark import datagen
    from intent_classifier_service_spark.operators import response_validation as RV

    labels = datagen.intent_labels(spark)
    df = spark.createDataFrame(
        [("a", [2, 0, 1]), ("b", [1, 1, 16]), ("c", []), ("d", [999]),
         ("e", None)],
        "id string, pred_labels array<int>",
    )
    via_map = {r["id"]: r["pred_intents"]
               for r in RV.labels_to_intents(df, labels).collect()}
    via_join = {r["id"]: r["pred_intents"]
                for r in RV.labels_to_intents_join(df, labels).collect()}
    assert via_map == via_join
    assert via_map["a"][0] != via_map["a"][1]  # order-sensitive
    assert via_map["d"] == [None]              # unknown label → null
    assert via_map["e"] is None                # null array stays null
