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
