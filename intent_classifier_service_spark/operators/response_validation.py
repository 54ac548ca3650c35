"""Model-response validation — exact parity with the reference's
per-row validator (gpt_intent_classifier.py:434-464), vectorized.

A response is valid iff:
  1. after trim it fullmatches  \\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*\\d+\\s*\\]
     (exactly three comma-separated non-negative ints in brackets), and
  2. every extracted int is a known class label.

The reference validates one response per HTTP round-trip in Python;
here both checks are pure JVM column expressions over the whole table
(rlike is anchored manually — Spark rlike is a search, the reference
uses re.fullmatch). Label→intent conversion (ref :405-432) is a
broadcast join to the class dim instead of a positional list index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESPONSE_SHAPE = r"^\[\s*\d+\s*,\s*\d+\s*,\s*\d+\s*\]$"


def parse_labels(col: str = "raw_response"):
    """Extracted int labels array (empty if shape invalid)."""
    return F.transform(
        F.regexp_extract_all(F.trim(F.col(col)), F.lit(r"(\d+)"), 1),
        lambda x: x.cast("int"),
    )


def validate_responses(df: DataFrame, labels_df: DataFrame,
                       col: str = "raw_response") -> DataFrame:
    """Adds shape_valid, labels_valid, valid, pred_labels columns.
    labels_df: broadcast class dim (label int, intent string)."""
    shaped = df.withColumn("shape_valid", F.trim(F.col(col)).rlike(RESPONSE_SHAPE))
    shaped = shaped.withColumn(
        "pred_labels", F.when(F.col("shape_valid"), parse_labels(col)).otherwise(F.array().cast("array<int>"))
    )
    # Domain check: the class dim is tiny (17 rows; the reference holds
    # it in memory too), so inline it as a literal array — cheaper than
    # an explode + semi-join + re-aggregate round trip.
    known = [r["label"] for r in labels_df.select("label").collect()]
    known_arr = F.array(*[F.lit(int(k)) for k in known])
    shaped = shaped.withColumn(
        "labels_valid",
        F.col("shape_valid")
        & (F.size(F.array_except(F.col("pred_labels"), known_arr)) == 0),
    )
    return shaped.withColumn("valid", F.col("shape_valid") & F.col("labels_valid"))


def labels_to_intents(df: DataFrame, labels_df: DataFrame,
                      labels_col: str = "pred_labels") -> DataFrame:
    """pred_labels: array<int> → pred_intents: array<string>, order
    preserved, ZERO shuffle: the tiny class dim becomes a literal map
    and the conversion is an in-array transform + element_at lookup —
    ref convert_pred_labels_to_intents (:405-432). Unknown labels map
    to null (same as the join variant's left join).

    ``labels_to_intents_join`` keeps the positional explode/broadcast-
    join/re-collect form (SURVEY J6's positional-zip operator); both
    are pinned equal in tests. At scale the map form wins outright —
    the join form shuffles the whole fact table on groupBy to regroup."""
    rows = labels_df.select("label", "intent").collect()
    lmap = F.map_from_arrays(
        F.array(*[F.lit(int(r["label"])) for r in rows]),
        F.array(*[F.lit(r["intent"]) for r in rows]),
    )
    return df.withColumn(
        "pred_intents",
        F.transform(F.col(labels_col), lambda lab: F.element_at(lmap, lab)),
    )


def labels_to_intents_join(df: DataFrame, labels_df: DataFrame,
                           labels_col: str = "pred_labels") -> DataFrame:
    """Positional-zip variant (SURVEY J6): posexplode + broadcast join
    + re-collect by position. Kept for operator coverage; prefer
    labels_to_intents (map transform, no shuffle) in pipelines."""
    exploded = df.select(
        "*", F.posexplode_outer(labels_col).alias("_pos", "_lab")
    )
    joined = exploded.join(
        F.broadcast(labels_df.withColumnRenamed("label", "_lab")), "_lab", "left"
    )
    regroup = (
        joined.groupBy(*df.columns)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_pos"), F.col("intent")))
            ).alias("_pairs")
        )
        # posexplode_outer fabricates one null row for an EMPTY array —
        # drop it so empty labels yield empty intents, not [null]; a
        # NULL input array stays NULL (matching the map variant's
        # transform-of-null semantics, pinned equal in tests)
        .withColumn(
            "pred_intents",
            F.when(
                F.col(labels_col).isNull(),
                F.lit(None).cast("array<string>"),
            ).otherwise(
                F.transform(
                    F.filter("_pairs", lambda p: p["_pos"].isNotNull()),
                    lambda p: p["intent"],
                )
            ),
        )
        .drop("_pairs")
    )
    return regroup


def format_server_response(df: DataFrame,
                           intents_col: str = "pred_intents") -> DataFrame:
    """pred_intents: array<string> → response_json matching the
    reference's fixed shape {'intents': [{'label': ...} × 3]}
    (format_server_response, gpt_intent_classifier.py:466-482) — pure
    struct/to_json column construction (SURVEY F11)."""
    payload = F.struct(
        F.transform(
            F.col(intents_col), lambda s: F.struct(s.alias("label"))
        ).alias("intents")
    )
    return df.withColumn("response_json", F.to_json(payload))


def validity_verdict(validated: DataFrame, min_valid_rate: float = 0.95) -> DataFrame:
    """(n_checked, n_valid, valid_rate, pass) — the reference's valid ≥
    95 % half of the load gate (:396-398)."""
    return validated.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.avg(F.col("valid").cast("double")).alias("valid_rate"),
        (F.avg(F.col("valid").cast("double")) >= min_valid_rate).alias("pass"),
    )
