import pytest

from intent_classifier_service_spark.plans.backend_selector import choose_rule_backend


def test_backends_agree(spark):
    docs = spark.createDataFrame(
        [("d1", [("tezt", "x", None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    jvm = choose_rule_backend("jvm")(docs).collect()
    arrow = choose_rule_backend("arrow")(docs).collect()
    assert sorted(map(tuple, jvm)) == sorted(map(tuple, arrow))


def test_unknown_backend_raises():
    with pytest.raises(ValueError, match="unknown rule backend"):
        choose_rule_backend("bert")
