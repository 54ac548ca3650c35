"""EP2/EP3 parity: batch validation API + readiness canary
(reference server.py error taxonomy + is_ready)."""

from intent_classifier_service_spark.operators import batch_api


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_validate_batch_clean(spark):
    docs = _docs(spark, [("d1", [("text", "hello", None, 0)])])
    verdicts, violations = batch_api.validate_batch(docs)
    assert violations.count() == 0
    assert all(r["pass"] for r in verdicts.collect())


def test_input_contract_missing_fields(spark):
    docs = _docs(spark, [(None, [("text", "x", None, 0)]), ("d2", None), (None, None)])
    _, violations = batch_api.validate_batch(docs)
    got = {r["rule_id"] for r in violations.collect()}
    assert batch_api.ERR_TEXT_MISSING in got
    assert batch_api.ERR_BODY_MISSING in got  # fully-empty row → BODY_MISSING


def test_input_contract_text_bounds(spark):
    docs = _docs(spark, [("d1", [("text", "x" * 501, None, 0)])])
    _, violations = batch_api.validate_batch(docs)
    got = {r["rule_id"] for r in violations.collect()}
    assert batch_api.ERR_TEXT_BOUNDS in got


def test_ready_canary(spark):
    assert batch_api.ready(spark) is True
