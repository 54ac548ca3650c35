"""Evaluation metrics with exact reference parity, distributed.

The reference computes multi-label metrics by materializing a binarized
numpy matrix (gpt_intent_classifier.py:924-967). At 10^12 rows a dense
rows×classes matrix is impossible; the long-form equivalent — explode
both label arrays, hash-aggregate TP/FP/FN per class — is one shuffle
keyed by class and produces identical numbers:

  subset accuracy  — avg(actual ⊆ predicted)            (ref :669-715)
  per-class P/R/F1 — explode → groupBy(class)           (ref :924-936)
  2×2 confusion    — TP/FP/FN/TN per class + global sum (ref :939-941)
  N×N co-occurrence— explode actual × explode predicted  (ref :605-667)
  macro/micro/weighted averages                          (ref :951-967)

sklearn's zero_division=0 semantics are preserved via when(denom==0, 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def subset_accuracy(df: DataFrame, actual: str = "actual",
                    predicted: str = "predicted") -> DataFrame:
    """Fraction of rows where every actual label appears in predicted
    (reference 'accuracy', gpt_intent_classifier.py:697). One scan,
    no shuffle (global agg)."""
    ok = F.size(F.array_except(F.col(actual), F.col(predicted))) == 0
    return df.agg(F.avg(ok.cast("double")).alias("subset_accuracy"))


def incorrect_predictions(df: DataFrame, id_col: str, actual: str = "actual",
                          predicted: str = "predicted") -> DataFrame:
    """Violation rows for failed subset checks — the reference's
    incorrect_predictions CSV (gpt_intent_classifier.py:700-708)."""
    ok = F.size(F.array_except(F.col(actual), F.col(predicted))) == 0
    return df.filter(~ok).select(
        F.col(id_col).alias("doc_id"),
        F.lit("R-EVAL-SUBSET").alias("rule_id"),
        F.lit(None).cast("int").alias("span_index"),
        F.array_join(F.col(predicted), "+").alias("observed"),
        F.array_join(F.col(actual), "+").alias("expected"),
    )


def per_class_counts(df: DataFrame, actual: str = "actual",
                     predicted: str = "predicted") -> DataFrame:
    """(class, tp, fp, fn, support, n_rows) in one pass: explode the
    union of both label sets per row, tag membership, hash-aggregate.
    TN is derived (n_rows − tp − fp − fn), never materialized per row.

    n_rows rides in as a lazy broadcast crossJoin instead of a separate
    driver-side count() — one action instead of two. Note: the single
    job still contains two plan branches over ``df``, so an unpersisted
    expensive upstream (e.g. a model-call UDF) is computed twice WITHIN
    the job; callers with such upstreams must persist first (evaluate()
    does — its accumulator test pins once-per-row)."""
    n_rows_df = df.agg(F.count(F.lit(1)).alias("n_rows"))
    tagged = df.select(
        F.explode(F.array_union(F.col(actual), F.col(predicted))).alias("class"),
        F.col(actual).alias("_a"),
        F.col(predicted).alias("_p"),
    ).select(
        "class",
        F.array_contains("_a", F.col("class")).alias("in_a"),
        F.array_contains("_p", F.col("class")).alias("in_p"),
    )
    return (
        tagged.groupBy("class")
        .agg(
            F.sum((F.col("in_a") & F.col("in_p")).cast("long")).alias("tp"),
            F.sum(((~F.col("in_a")) & F.col("in_p")).cast("long")).alias("fp"),
            F.sum((F.col("in_a") & (~F.col("in_p"))).cast("long")).alias("fn"),
            F.sum(F.col("in_a").cast("long")).alias("support"),
        )
        .crossJoin(F.broadcast(n_rows_df))
        .withColumn("tn", F.col("n_rows") - F.col("tp") - F.col("fp") - F.col("fn"))
    )


def per_class_prf(counts: DataFrame) -> DataFrame:
    """Precision/recall/F1 per class with sklearn zero_division=0."""
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    out = counts.select(
        "class", "tp", "fp", "fn", "tn", "support",
        prec.alias("precision"), rec.alias("recall"),
    )
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
    ).otherwise(0.0)
    return out.withColumn("f1", f1)


def averaged_metrics(prf: DataFrame) -> DataFrame:
    """Macro / micro / weighted P, R, F1 (reference :951-967), long form
    (average, precision, recall, f1). Runs on the tiny class table."""
    macro = prf.agg(
        F.lit("macro").alias("average"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
    )
    g = prf.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    mp = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    mr = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    micro = g.select(mp.alias("precision"), mr.alias("recall"))
    mf1 = F.when(F.col("precision") + F.col("recall") > 0,
                 2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall"))).otherwise(0.0)
    micro = micro.select(F.lit("micro").alias("average"), "precision", "recall", mf1.alias("f1"))
    weighted = prf.agg(
        F.lit("weighted").alias("average"),
        (F.sum(F.col("precision") * F.col("support")) / F.sum("support")).alias("precision"),
        (F.sum(F.col("recall") * F.col("support")) / F.sum("support")).alias("recall"),
        (F.sum(F.col("f1") * F.col("support")) / F.sum("support")).alias("f1"),
    )
    return macro.unionByName(micro).unionByName(weighted)


def cooccurrence_matrix(df: DataFrame, actual: str = "actual",
                        predicted: str = "predicted") -> DataFrame:
    """N×N class co-occurrence counts, long form (actual_class,
    predicted_class, n) — the reference's custom confusion matrix
    (gpt_intent_classifier.py:605-667, triple Python loop) as a double
    explode + hash aggregation. Pivot to wide only for display."""
    return (
        df.select(F.explode(actual).alias("actual_class"), F.col(predicted).alias("_p"))
        .select("actual_class", F.explode("_p").alias("predicted_class"))
        .groupBy("actual_class", "predicted_class")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cooccurrence_pivot(cooc: DataFrame) -> DataFrame:
    """Long → wide NxN matrix for display/CSV export (the reference's
    persisted custom_confusion_matrix shape). Pivot only the small
    class×class table, never the fact data."""
    return cooc.groupBy("actual_class").pivot("predicted_class").sum("n").na.fill(0)
