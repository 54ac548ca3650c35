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


def test_text_drift_baseline_and_detection(spark, tmp_path):
    """Text-profile drift: lang-ID PSI and quality-histogram KS pass on
    self-comparison and fire when the corpus text shifts (all text
    replaced by high-punctuation noise → quality histogram collapses)."""
    clean = datagen.documents_spans(spark, 2000)
    path = str(tmp_path / "baseline")
    drift.write_baseline(clean, path)

    b_text = drift.load_text_baseline(spark, path)
    assert b_text is not None
    cur_lang, cur_q = drift.text_distributions(clean)
    verdicts = {v["rule_id"]: v for v in drift.text_verdicts_from_profiles(
        cur_lang, cur_q, b_text[0], b_text[1])}
    assert verdicts["R-DRIFT-LANG-PSI"]["pass"]
    assert verdicts["R-DRIFT-QUALITY-KS"]["pass"]
    assert verdicts["R-DRIFT-LANG-PSI"]["statistic"] == 0.0

    shifted = clean.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(s["text"].isNotNull(), F.lit("!?$% #@!! ..,,;;"))
                .alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    s_lang, s_q = drift.text_distributions(shifted)
    verdicts = {v["rule_id"]: v for v in drift.text_verdicts_from_profiles(
        s_lang, s_q, b_text[0], b_text[1])}
    assert not verdicts["R-DRIFT-QUALITY-KS"]["pass"]

    # a pre-text-drift baseline (span rows only) → loader returns None
    old_path = str(tmp_path / "old_baseline")
    drift.write_baseline(clean, old_path, text=False)
    assert drift.load_text_baseline(spark, old_path) is None


def test_validate_job_emits_text_drift_rows(spark, tmp_path):
    """The end-to-end job's drift output carries the text rules and
    the gate folds them in (fresh path: from the fused single scan)."""
    from jobs import validate

    docs = datagen.documents_spans(spark, 1000)
    refs = datagen.valid_media_refs(spark)
    r = validate.run(spark, docs, refs, str(tmp_path / "out"))
    rules = {d["rule_id"] for d in r["drift"]}
    assert {"R-DRIFT-KIND-PSI", "R-DRIFT-OFFSET-KS",
            "R-DRIFT-LANG-PSI", "R-DRIFT-QUALITY-KS"} <= rules
    assert r["gate_pass"] is True
    assert all(d["pass"] for d in r["drift"])
