"""Library-call API surface — the engine's EP2/EP3 (reference POST
/intent + GET /ready, server.py:32-138).

The reference validates one request at a time behind HTTP with a fixed
error taxonomy (BODY_MISSING / EMPTY JSON / TEXT_MISSING 400s,
INTERNAL_ERROR 500 — server.py:70-81,131). The engine's equivalent is a
batch library call: hand it a (small or huge) DataFrame, get back
(verdicts, violations) plus input-contract violations tagged with the
same taxonomy, and a ready() canary that pushes one literal document
through the full compiled rule DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import rules as R

# Reference error taxonomy (server.py:70-81) → input-contract rule ids.
ERR_BODY_MISSING = "R-INPUT-BODY-MISSING"    # row is null / empty struct
ERR_TEXT_MISSING = "R-INPUT-TEXT-MISSING"    # doc_id/spans absent or null
ERR_TEXT_BOUNDS = "R-INPUT-TEXT-BOUNDS"      # span text length outside 1..500

INPUT_RULES = [
    R.DocRule(
        # whole-row-empty ↔ the reference's 400 BODY_MISSING (server.py:70)
        ERR_BODY_MISSING,
        violated=lambda: F.col("doc_id").isNull() & F.col("spans").isNull(),
        observed=lambda: F.lit("<empty row>"),
        expected="request body present",
    ),
    R.DocRule(
        ERR_TEXT_MISSING,
        violated=lambda: F.col("doc_id").isNull() | F.col("spans").isNull(),
        observed=lambda: F.format_string(
            "doc_id=%s,spans=%s",
            F.coalesce(F.col("doc_id"), F.lit("<null>")),
            F.when(F.col("spans").isNull(), "<null>").otherwise("<present>"),
        ),
        expected="doc_id and spans present",
    ),
    R.DocRule(
        ERR_TEXT_BOUNDS,
        # reference pydantic bounds: 1..500 chars (server.py:30)
        violated=lambda: ~F.forall(
            F.col("spans"),
            lambda s: s["text"].isNull() | F.length(s["text"]).between(1, 500),
        ),
        observed=lambda: F.format_string(
            "max_text_len=%d",
            F.coalesce(
                F.array_max(F.transform(F.col("spans"), lambda s: F.length(s["text"]))),
                F.lit(-1),
            ),
        ),
        expected="span text length in [1, 500]",
    ),
]


def validate_batch(docs: DataFrame, rules: R.RuleSet | None = None
                   ) -> tuple[DataFrame, DataFrame]:
    """(verdicts, violations) for any (doc_id, spans) DataFrame —
    input-contract rules prepended to the standard rule set, all still
    compiled into the same single-pass plan."""
    rules = rules or R.RuleSet()
    combined = R.RuleSet(
        span_rules=rules.span_rules,
        doc_rules=[*INPUT_RULES, *rules.doc_rules],
        max_violation_rate=rules.max_violation_rate,
    )
    return R.verdicts(docs, combined), R.violations(docs, combined)


CANARY_DOC = (
    "canary-0001",
    [
        {"kind": "text", "text": "Athens airport to city center", "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "media-00001", "offset": 30},
    ],
)


def ready(spark: SparkSession) -> bool:
    """Smoke-validate one literal canary document through the full
    compiled rule DAG — the reference's is_ready canary classify
    (gpt_intent_classifier.py:69-80, canary text preserved).

    ONE driver action: the gate AND the zero-violation check both come
    from a single aggregate over the verdict frame (sum n_violations
    subsumes counting the violation rows — no second plan execution)."""
    docs = spark.createDataFrame(
        [CANARY_DOC],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    verdicts, _violations = validate_batch(docs)
    row = verdicts.agg(
        F.min(F.col("pass").cast("int")).alias("all_pass"),
        F.sum("n_violations").alias("n_viol"),
    ).collect()[0]
    all_pass = row["all_pass"] == 1 if row["all_pass"] is not None else True
    return bool(all_pass) and (row["n_viol"] or 0) == 0
