"""Source parity: headerless positional-schema TSV (the reference's S1/S2,
gpt_intent_classifier.py:368-369) and fixed-schema parquet round trip."""

from intent_classifier_service_spark.sources import tables


def test_read_tsv_positional_schema(spark, tmp_path):
    p = tmp_path / "train.tsv"
    p.write_text(
        "what flights leave atlanta\tflight\n"
        "show me fares\tairfare+flight\n"
    )
    df = tables.read_tsv(spark, str(p), tables.ATIS_TSV_TRAIN_SCHEMA)
    rows = df.collect()
    assert df.columns == ["user_prompt", "intents"]
    assert rows[0]["user_prompt"] == "what flights leave atlanta"
    assert rows[1]["intents"] == "airfare+flight"


def test_documents_spans_schema_roundtrip(spark, tmp_path):
    from intent_classifier_service_spark import datagen

    path = str(tmp_path / "docs")
    datagen.documents_spans(spark, 100).write.parquet(path)
    df = tables.read_documents_spans(spark, path)
    assert [f.name for f in df.schema.fields] == ["doc_id", "spans", "part_key"]
    assert df.count() == 100
    span_type = df.schema["spans"].dataType.elementType
    assert [f.name for f in span_type.fields] == ["kind", "text", "media_ref", "offset"]


def test_documents_jsonl_roundtrip_rule_parity(spark, tmp_path):
    """JSONL source: round-trips the north-rule schema and produces the
    SAME violation rows as the parquet path (the format must not change
    the semantics), with malformed lines surfacing as doc-rule
    violations rather than job failures."""
    from intent_classifier_service_spark import datagen
    from intent_classifier_service_spark.plans import rules as R

    docs = datagen.documents_spans(spark, 300)
    path = str(tmp_path / "docs_jsonl")
    tables.write_documents_jsonl(docs, path)
    back = tables.read_documents_jsonl(spark, path)
    assert [f.name for f in back.schema.fields] == ["doc_id", "spans", "part_key"]
    assert back.count() == 300

    v_parquet = R.violations(docs).collect()
    v_jsonl = R.violations(back).collect()
    assert sorted(map(tuple, v_jsonl)) == sorted(map(tuple, v_parquet))

    # malformed line → null fields → doc rules flag it, job survives
    import os
    bad = tmp_path / "bad"
    os.makedirs(bad)
    (bad / "part-0.json").write_text(
        '{"doc_id": "ok-1", "spans": [{"kind": "text", "text": "hi", '
        '"media_ref": null, "offset": 0}], "part_key": 0}\n'
        "this is not json\n"
    )
    mixed = tables.read_documents_jsonl(spark, str(bad))
    v = R.violations(mixed)
    assert v.filter(v.rule_id == "R-DOC-ID-NOTNULL").count() == 1
