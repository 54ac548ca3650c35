"""Streaming validation: the stateless rule pass over a file stream
must produce exactly the batch result; re-run consumes nothing new."""

import os

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.plans import rules as R
from intent_classifier_service_spark.streaming import validate_stream as VS


def test_available_now_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = datagen.documents_spans(spark, 1000)
    docs.write.parquet(in_dir)

    VS.run_available_now(spark, in_dir, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    expected = R.violations(spark.read.parquet(in_dir))
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0

    # incremental semantics: nothing new → second drain appends nothing
    VS.run_available_now(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == expected.count()

    # new file arrives → only its violations are appended
    datagen.documents_spans(spark, 200).write.mode("append").parquet(in_dir)
    VS.run_available_now(spark, in_dir, out_dir, ckpt)
    total_expected = R.violations(spark.read.parquet(in_dir)).count()
    assert spark.read.parquet(out_dir).count() == total_expected


def test_windowed_violation_counts_plan(spark, tmp_path):
    """Watermarked windowed aggregation compiles and runs (availableNow,
    append mode) over a timestamped stream."""
    in_dir = str(tmp_path / "win_in")
    docs = datagen.documents_spans(spark, 500).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(mins=(F.crc32("doc_id") % 120).cast("int")),
    )
    docs.write.parquet(in_dir)

    stream = (
        spark.readStream.schema(
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
            "part_key int, ts timestamp"
        ).parquet(in_dir)
    )
    agg = VS.windowed_violation_counts(stream, "ts")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    # watermark semantics: append emits only windows older than the
    # max event time minus watermark — with a 2h spread and 30min
    # watermark, most windows finalize
    assert len(rows) > 0
    assert all(r["n_violations"] > 0 for r in rows)
