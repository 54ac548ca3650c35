"""Referential integrity: every span's media_ref must exist in the
valid-refs dimension.

Engine analog of the reference's label-domain check — "every predicted
label ∈ valid labels" (gpt_intent_classifier.py:446,458-461) and the
unknown-class set difference (:826-827).

Scale shape: explode media spans (narrow), then a **broadcast left_anti
join** against the dim — the 10^12-row fact side never shuffles; each
task streams its partition against an in-memory hash set of the dim.
The dim (~500 rows here, maybe 10^6 in production) broadcasts under the
64 MB threshold set in session.py; ``F.broadcast`` makes it explicit so
the plan can't degrade to sort-merge when stats are missing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spans import explode_spans


def referential_violations(docs: DataFrame, valid_refs: DataFrame,
                           ref_col: str = "media_ref") -> DataFrame:
    """Violation rows for spans whose media_ref is absent from the dim."""
    spans = (
        explode_spans(docs)
        .filter(F.col(ref_col).isNotNull())
        .select("doc_id", "span_index", ref_col)
    )
    dangling = spans.join(F.broadcast(valid_refs), ref_col, "left_anti")
    return dangling.select(
        "doc_id",
        F.lit("R-REF-MEDIA").alias("rule_id"),
        F.col("span_index").cast("int"),
        F.col(ref_col).alias("observed"),
        F.lit("media_ref in valid_media_refs").alias("expected"),
    )


def referential_violations_large_dim(docs: DataFrame, valid_refs: DataFrame,
                                     ref_col: str = "media_ref") -> DataFrame:
    """Same violation rows as :func:`referential_violations`, for dims
    too big to broadcast (10^9 valid refs ≈ 50 GB raw — no executor
    holds that hash set).

    Scale shape — the fact side NEVER shuffles and the dim is NEVER
    broadcast in full:

    1. Partial-distinct the fact's refs: HashAggregate combines
       map-side, so the exchange carries unique refs per partition
       (≪ row count when refs repeat), not 10^12 rows.
    2. Shuffle anti-join unique refs against the dim — both sides hash
       by ref, each shuffle is bounded by its own distinct cardinality.
       This is the one unavoidable exchange, and it's dim-sized.
    3. Broadcast the DANGLING refs back over the fact as a left_semi.
       The dangling set is bounded by the violation-rate gate contract
       (a 5 %-of-distinct-refs ceiling before the run fails anyway),
       so the broadcast is small by construction — the same
       loser-set ≪ corpus argument as dedup's anti-join. The fact
       side streams map-side against it; zero fact shuffle.

    Rows are identical to the broadcast path (same oracle); only the
    physical plan differs. Pick this variant when ``valid_refs`` is
    fact-scaling; the broadcast path when it's a true dimension.
    """
    spans = (
        explode_spans(docs)
        .filter(F.col(ref_col).isNotNull())
        .select("doc_id", "span_index", ref_col)
    )
    distinct_refs = spans.select(ref_col).distinct()
    dangling = distinct_refs.join(valid_refs, ref_col, "left_anti")
    return spans.join(F.broadcast(dangling), ref_col, "left_semi").select(
        "doc_id",
        F.lit("R-REF-MEDIA").alias("rule_id"),
        F.col("span_index").cast("int"),
        F.col(ref_col).alias("observed"),
        F.lit("media_ref in valid_media_refs").alias("expected"),
    )


def unknown_refs(docs: DataFrame, valid_refs: DataFrame,
                 ref_col: str = "media_ref") -> DataFrame:
    """Distinct dangling refs — the reference's `set(test) - set(known)`
    (gpt_intent_classifier.py:826-827) as a left_anti after a partial
    distinct (map-side combine shrinks the shuffle to unique refs)."""
    distinct_refs = (
        explode_spans(docs)
        .filter(F.col(ref_col).isNotNull())
        .select(ref_col)
        .distinct()
    )
    return distinct_refs.join(F.broadcast(valid_refs), ref_col, "left_anti")
