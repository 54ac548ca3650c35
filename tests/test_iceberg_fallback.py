from intent_classifier_service_spark.sources import iceberg


def test_fallback_paths(spark, tmp_path):
    from intent_classifier_service_spark import datagen

    assert iceberg.iceberg_available(spark) in (True, False)
    p = str(tmp_path / "docs")
    datagen.documents_spans(spark, 50).write.parquet(p)
    df = iceberg.read_snapshot(spark, p)
    assert df.count() == 50
    assert iceberg.current_snapshot_id(spark, p).startswith("parquet:") or \
        iceberg.current_snapshot_id(spark, p).isdigit()


def test_catalog_conf_shape():
    conf = iceberg.catalog_conf("/warehouse")
    assert conf["spark.sql.catalog.lake"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.lake.warehouse"] == "/warehouse"
