"""Span-level predicates over ``spans: array<struct<kind,text,media_ref,offset>>``.

Two interchangeable implementations, tested for equality:

* **JVM higher-order functions** (default hot path): ``transform`` /
  ``forall`` / ``element_at`` run inside whole-stage codegen with zero
  Python; the monotone-offset check reads the previous element in-array
  (``element_at(spans, i)``) so no window shuffle is ever needed.
* **Arrow-vectorized pandas UDFs** (north-rule mandated surface): the
  spans column crosses to Python as Arrow lists-of-structs; numpy
  vector ops per batch, zero per-row Python loops over field values.

The three rules mirror the reference's per-row response validation
(gpt_intent_classifier.py:434-464 — strict shape + domain check):
  R-SPAN-KIND   kind ∈ {text, media}
  R-SPAN-MUTEX  kind='text' ⇒ (text NOT NULL ∧ media_ref NULL);
                kind='media' ⇒ (media_ref NOT NULL ∧ text NULL)
  R-SPAN-MONO   offset strictly increasing within the array
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

VALID_KINDS = ("text", "media")


# ---------------------------------------------------------------- JVM HOFs

def kind_valid(span: Column) -> Column:
    return span["kind"].isin(*VALID_KINDS)


def mutex_valid(span: Column) -> Column:
    is_text = span["kind"] == "text"
    is_media = span["kind"] == "media"
    ok_text = is_text & span["text"].isNotNull() & span["media_ref"].isNull()
    ok_media = is_media & span["media_ref"].isNotNull() & span["text"].isNull()
    # Unknown kinds are judged by R-SPAN-KIND, not double-counted here.
    return ok_text | ok_media | (~is_text & ~is_media)


def doc_kinds_valid(spans: Column) -> Column:
    return F.forall(spans, kind_valid)


def doc_mutex_valid(spans: Column) -> Column:
    return F.forall(spans, mutex_valid)


def doc_offsets_monotone(spans: Column) -> Column:
    """Strictly increasing offsets — pairwise zip of the array with its
    own tail; empty/singleton arrays pass vacuously. No shuffle."""
    n = F.size(spans)
    pairs_ok = F.zip_with(
        F.slice(spans, 1, n - 1),
        F.slice(spans, 2, n - 1),
        lambda a, b: b["offset"] > a["offset"],
    )
    return F.when(n <= 1, F.lit(True)).otherwise(F.forall(pairs_ok, lambda x: x))


def explode_spans(docs: DataFrame, keep: tuple[str, ...] = ("doc_id",),
                  outer: bool = False) -> DataFrame:
    """One shuffle-free pass: posexplode spans, carrying prev_offset
    zipped in-array so monotonicity never needs a window.

    Deliberately avoids ``element_at(spans, i)`` inside the per-element
    lambda: when ``spans`` is itself a derived expression (datagen, the
    portable span derivation), Catalyst inlines the full construction at
    every reference, making per-element access O(N²) per document. The
    shift-and-zip below references ``spans`` a constant number of times
    regardless of array length."""
    # LET-BINDING via a lambda variable: the shift-and-zip below needs
    # several references to the spans array (offsets transform, sizes,
    # zip_with, trailing slice). When ``spans`` is a DERIVED expression
    # (datagen, the portable span derivation) Catalyst inlines the full
    # construction at EVERY reference — measured ~2.5× per-row cost on
    # the bench corpus. Wrapping the array as the element of a
    # singleton and building everything inside the lambda binds it to a
    # NamedLambdaVariable, which higher-order functions evaluate ONCE;
    # each inner reference is then a variable read. (Spark has no
    # user-facing WITH/let expression; this is the idiomatic stand-in.)
    def _with_prev(arr):
        offsets = F.transform(arr, lambda s: s["offset"])
        prev_offsets = F.concat(
            F.array(F.lit(None).cast("int")),
            F.slice(offsets, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        )
        zipped = F.zip_with(
            arr,
            prev_offsets,
            lambda s, p: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
                p.alias("prev_offset"),
            ),
        )
        # zip_with pads the shorter side with nulls; an empty spans
        # array would fabricate one null span — slice back to
        # size(arr) (0 for empty, identity otherwise; null stays null).
        return F.slice(zipped, 1, F.size(arr))

    with_prev = F.element_at(F.transform(F.array(F.col("spans")), _with_prev), 1)
    explode_fn = F.posexplode_outer if outer else F.posexplode
    return (
        docs.withColumn("_spans", with_prev)
        .select(*keep, explode_fn("_spans").alias("span_index", "span"))
        .select(
            *keep,
            "span_index",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
            F.col("span.prev_offset").alias("prev_offset"),
        )
    )


# ------------------------------------------------- Arrow pandas-UDF variants
# Each receives the whole spans array column as a pandas Series of
# list-of-dict; per-batch numpy/list-comprehension vector ops only
# (no per-field Python round trips through Spark rows).

@pandas_udf(BooleanType())
def pdf_kinds_valid(spans: pd.Series) -> pd.Series:
    return spans.map(
        lambda arr: all(s["kind"] in VALID_KINDS for s in arr) if arr is not None else None
    )


@pandas_udf(BooleanType())
def pdf_mutex_valid(spans: pd.Series) -> pd.Series:
    def ok(arr):
        if arr is None:
            return None
        for s in arr:
            k = s["kind"]
            if k == "text" and not (s["text"] is not None and s["media_ref"] is None):
                return False
            if k == "media" and not (s["media_ref"] is not None and s["text"] is None):
                return False
        return True

    return spans.map(ok)


@pandas_udf(BooleanType())
def pdf_offsets_monotone(spans: pd.Series) -> pd.Series:
    def ok(arr):
        if arr is None:
            return None
        offs = [s["offset"] for s in arr]
        return all(b > a for a, b in zip(offs, offs[1:]))

    return spans.map(ok)


def span_sequence(spans: Column) -> Column:
    """Canonical string encoding of the span sequence (kind, text,
    media_ref, order) — the per-row parity invariant from BASELINE.json
    input_hint. Equality of this column before/after any engine
    transformation proves sequence preservation."""
    return F.array_join(
        F.transform(
            spans,
            lambda s: F.concat_ws(
                "\x01",
                F.coalesce(s["kind"], F.lit("\x00")),
                F.coalesce(s["text"], F.lit("\x00")),
                F.coalesce(s["media_ref"], F.lit("\x00")),
            ),
        ),
        "\x02",
    )
