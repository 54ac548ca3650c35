"""Frozen-baseline drift workflow: freeze on clean data, detect a
shifted distribution against it."""

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.operators import drift


def test_frozen_baseline_roundtrip_and_detection(spark, tmp_path):
    clean = datagen.documents_spans(spark, 2000)
    path = str(tmp_path / "baseline")
    drift.write_baseline(clean, path)

    # same data vs its own frozen baseline → clean
    b_kind, b_off = drift.load_baseline(spark, path)
    verdicts = drift.drift_verdicts(clean, b_kind, b_off, lo=0, hi=128)
    assert all(v["pass"] for v in verdicts)

    # force every span to 'media' → kind distribution shifts → PSI fires
    shifted = clean.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.coalesce(s["media_ref"], F.lit("media-00001")).alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    verdicts = {v["rule_id"]: v for v in
                drift.drift_verdicts(shifted, b_kind, b_off, lo=0, hi=128)}
    assert not verdicts["R-DRIFT-KIND-PSI"]["pass"]
    assert verdicts["R-DRIFT-KIND-PSI"]["statistic"] > 0.2
    # offsets unchanged → KS still clean
    assert verdicts["R-DRIFT-OFFSET-KS"]["pass"]
