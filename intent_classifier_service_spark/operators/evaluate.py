"""End-to-end evaluation pipeline — distributed re-expression of the
reference's evaluate() flow (gpt_intent_classifier.py:884-1020) and its
dataset preparation (process_evaluation_dataset, :789-845):

  1. split '+'-joined labels into arrays (:371,820)
  2. build the class dim with dense first-seen ids (:113-125)
  3. find + filter rows referencing unknown classes (:826-832)
  4. stratified-sample the eval set (:717-787)
  5. validate raw model responses (:434-464) and keep the valid ones
     (the reference's positions bookkeeping → a 'valid' flag column)
  6. convert predicted labels to intents, order-preserving (:405-432)
  7. compute subset-accuracy, per-class P/R/F1, averaged metrics,
     co-occurrence confusion (:924-967, :605-667)
  8. violation rows for incorrect predictions (:700-708)

Everything is one lazy DAG per output; the only driver-side values are
the tiny class dim and the gate booleans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import metrics as M
from . import response_validation as RV
from . import sampling


def split_labels(df: DataFrame, col: str, out: str) -> DataFrame:
    """'flight+airfare' → ['flight','airfare'] (reference P2)."""
    return df.withColumn(out, F.split(F.col(col), r"\+"))


def unknown_classes(df: DataFrame, labels_col: str, known: DataFrame,
                    known_col: str = "intent") -> DataFrame:
    """Classes present in df but unknown to the model — the reference's
    set difference (:826-827) as explode→distinct→broadcast left_anti."""
    return (
        df.select(F.explode(labels_col).alias(known_col))
        .distinct()
        .join(F.broadcast(known.select(known_col)), known_col, "left_anti")
    )


def filter_unknown_class_rows(df: DataFrame, labels_col: str,
                              known: DataFrame, known_col: str = "intent") -> DataFrame:
    """Drop rows whose label array touches any unknown class (:832) —
    negated arrays_overlap against the (collected, tiny) unknown set."""
    unknown = [r[known_col] for r in unknown_classes(df, labels_col, known, known_col).collect()]
    if not unknown:
        return df
    unknown_arr = F.array(*[F.lit(u) for u in unknown])
    return df.filter(~F.arrays_overlap(F.col(labels_col), unknown_arr))


@dataclass
class EvaluationResult:
    n_rows: int
    n_valid: int
    subset_accuracy: float
    per_class: DataFrame
    averaged: DataFrame
    cooccurrence: DataFrame
    incorrect: DataFrame
    gate_pass: bool
    validated: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the cached validated frame once the metric
        DataFrames have been consumed."""
        if self.validated is not None:
            self.validated.unpersist()


def evaluate(test_df: DataFrame, labels_df: DataFrame,
             actual_col: str = "actual_intents",
             response_col: str = "raw_response",
             test_size: int | None = None,
             seed: int = 42,
             min_valid_rate: float = 0.95,
             min_accuracy: float = 0.80) -> EvaluationResult:
    """The reference's evaluate() + load-gate (:396-398) in one call.

    test_df: (..., actual_intents: string '+'-joined, raw_response).
    labels_df: class dim (label int, intent string).
    """
    ds = split_labels(test_df, actual_col, "actual_list")
    ds = filter_unknown_class_rows(ds, "actual_list", labels_df)
    if test_size is not None:
        ds = sampling.stratified_sample(ds, actual_col, test_size, seed=seed)

    # The upstream of `validated` can include a model-call UDF — an
    # expensive pandas UDF that must run exactly once per row. The
    # metric fan-out below takes ~6 separate actions over this frame,
    # so persist it, and fold n_rows/n_valid into ONE aggregation
    # (tests/test_evaluate.py pins single model invocation per row via
    # an accumulator).
    validated = RV.validate_responses(ds, labels_df, response_col).persist()
    counts_row = validated.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
    ).collect()[0]
    n_rows = counts_row["n_rows"]
    n_valid = counts_row["n_valid"] or 0

    valid_rows = RV.labels_to_intents(validated.filter(F.col("valid")), labels_df)
    eval_df = valid_rows.select(
        F.col("actual_list").alias("actual"),
        F.col("pred_intents").alias("predicted"),
    )
    acc = M.subset_accuracy(eval_df).collect()[0]["subset_accuracy"] or 0.0
    counts = M.per_class_counts(eval_df)
    per_class = M.per_class_prf(counts)
    averaged = M.averaged_metrics(per_class)
    cooc = M.cooccurrence_matrix(eval_df)
    incorrect = M.incorrect_predictions(
        valid_rows.select(
            F.col(actual_col).alias("id"),
            F.col("actual_list").alias("actual"),
            F.col("pred_intents").alias("predicted"),
        ),
        "id",
    )
    valid_rate = n_valid / n_rows if n_rows else 0.0
    gate = (valid_rate >= min_valid_rate) and (acc >= min_accuracy)
    return EvaluationResult(
        n_rows=n_rows, n_valid=n_valid, subset_accuracy=float(acc),
        per_class=per_class, averaged=averaged, cooccurrence=cooc,
        incorrect=incorrect, gate_pass=bool(gate), validated=validated,
    )
