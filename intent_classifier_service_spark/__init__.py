"""intent_classifier_service_spark — a PySpark-native schema + constraint
validation engine for interleaved text+media document tables.

Built from scratch against the behavior of the reference service
``LefterisKyriazanos/intent-classifier-service`` (see SURVEY.md): rule
validation emitting violation rows, column stats, uniqueness, referential
checks against a broadcast dimension, distribution-drift checks, stratified
sampling, and threshold-gated pass/fail verdicts — re-expressed Spark-first
over ``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``
tables designed for 10^12-document scale.

Layout:
  session      — SparkSession factory (AQE, Arrow, tuned shuffle)
  datagen      — deterministic synthetic document tables + dims + baselines
  functions/   — column-level helpers (span predicates, hashes, text stats)
  plans/       — rule DSL + compiler (rules -> single-pass column plan) + gate
  operators/   — validation + pipeline operators (stats, uniqueness,
                 referential, drift, metrics, sampling, dedup, similarity,
                 text analysis, multimodal plumbing)
  sources/     — readers/writers (parquet now, Iceberg-shaped interfaces)
  streaming/   — checkpoint/resume state (batch resumability per partition)
"""

__version__ = "0.1.0"
