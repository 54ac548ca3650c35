"""Deterministic synthetic tables (FIXTURES.md shapes).

Everything is formula-based off ``spark.range`` — no RNG — so violation
counts are exact, golden files are stable across runs/partitionings, and
generation is itself distributed (scales to bench sizes without touching
the driver). Violation injection rates mirror FIXTURES.md §1: ~0.1 %
duplicate doc_ids with a hot key, ~1 % invalid span kinds, ~1 % mutual-
exclusivity violations, ~1 % non-monotone offsets, ~4 % dangling
media_refs.

Reference parity: the injected malformed-response corpus in
``queries_labeled`` transliterates /root/reference/server_launch_examples.ipynb
cells 4-16 and model_evaluation/malformed_responses.txt.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Modular injection periods — chosen co-prime so violations don't collide.
DUP_PERIOD = 997          # every 997th raw id duplicates its neighbor
HOT_DUP_PERIOD = 499      # every 499th raw id collapses onto one hot doc_id
BAD_KIND_PERIOD = 211     # invalid kind 'tezt'
MUTEX_PERIOD = 223        # text/media_ref mutual-exclusivity violations
MONOTONE_PERIOD = 97      # offset regression
MEDIA_REF_MOD = 520       # refs span media-00000..519; dim holds 0..499
VALID_REFS = 500
HOT_DOC_ID = "doc-00000042"

# 17 ATIS intents, train-set first-seen order (reference
# gpt_intent_classifier.py:113-125; FIXTURES.md §3).
ATIS_INTENTS = [
    "flight", "flight_time", "airfare", "aircraft", "ground_service",
    "airport", "airline", "distance", "abbreviation", "ground_fare",
    "quantity", "city", "flight_no", "capacity", "meal", "restriction",
    "cheapest",
]

# Malformed model responses (reference server_launch_examples.ipynb cells
# 4-16 + model_evaluation/malformed_responses.txt) → span-rule test corpus.
MALFORMED_RESPONSES = [
    "[3, 99, 5]",          # out-of-domain label
    "[3, 1, ]",            # trailing comma
    "3, 1, 2",             # missing brackets
    "[@, 3, 2 1]",         # junk chars
    "['flight','airfare','city']",  # strings not ints
]
VALID_RESPONSE_WHITESPACE = "   [3,  1, 5  ]"  # accepted by the reference


def documents_spans(spark: SparkSession, n_docs: int, n_parts: int = 16) -> DataFrame:
    """The north-rule input table: (doc_id, spans, part_key).

    spans: array<struct<kind,text,media_ref,offset>> with 1-12 elements,
    deterministic injected violations. part_key is skewed (~53 % of rows
    in partition 0) to exercise AQE skew handling and salting.
    """
    df = spark.range(n_docs).withColumnRenamed("id", "r")
    doc_id = (
        F.when(F.col("r") % HOT_DUP_PERIOD == 3, F.lit(HOT_DOC_ID))
        .when(
            (F.col("r") % DUP_PERIOD == 0) & (F.col("r") > 0),
            F.format_string("doc-%08d", F.col("r") - 1),
        )
        .otherwise(F.format_string("doc-%08d", F.col("r")))
    )
    n_spans = (F.col("r") % 12 + 1).cast("int")

    def span(i):
        base_kind = F.when((F.col("r") * 31 + i) % 7 == 0, "media").otherwise("text")
        kind = F.when((F.col("r") * 131 + i) % BAD_KIND_PERIOD == 0, "tezt").otherwise(base_kind)
        mutex_bad = (F.col("r") * 17 + i) % MUTEX_PERIOD == 0
        text = F.when(
            (base_kind == "text") | mutex_bad,
            F.format_string("tok-%04d", (F.col("r") + i) % 997),
        )
        media_ref = F.when(
            (base_kind == "media") | mutex_bad,
            F.format_string("media-%05d", (F.col("r") * 7 + i) % MEDIA_REF_MOD),
        )
        offset = (
            i * 8
            + (F.col("r") % 5)
            - F.when(((F.col("r") + i) % MONOTONE_PERIOD == 0) & (i > 0), 9).otherwise(0)
        ).cast("int")
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    part_key = (
        F.when(F.col("r") % 2 == 0, F.lit(0)).otherwise((F.col("r") % 16)).cast("int")
    )
    return df.select(
        doc_id.alias("doc_id"), spans.alias("spans"), part_key.alias("part_key")
    )


def valid_media_refs(spark: SparkSession) -> DataFrame:
    """Broadcast referential dim (FIXTURES.md §2) — analog of the
    reference's valid-label set (gpt_intent_classifier.py:446,458-461)."""
    return spark.range(VALID_REFS).select(
        F.format_string("media-%05d", F.col("id")).alias("media_ref")
    )


def intent_labels(spark: SparkSession) -> DataFrame:
    """ATIS class dim with dense first-seen ids (FIXTURES.md §3;
    reference gpt_intent_classifier.py:113-125)."""
    rows = [
        (i, intent, f"This intent is about obtaining {intent} information")
        for i, intent in enumerate(ATIS_INTENTS)
    ]
    return spark.createDataFrame(rows, "label int, intent string, description string")


def queries_labeled(spark: SparkSession, n_rows: int = 848) -> DataFrame:
    """ATIS-shaped eval table (FIXTURES.md §4): actual intents ('+'-joined,
    ~0.5 % multi-intent, a few unseen-class rows), exactly-3 predicted
    intents, and raw responses mixing valid '[i, j, k]' strings with the
    reference's malformed corpus."""
    n_cls = len(ATIS_INTENTS)
    df = spark.range(n_rows).withColumnRenamed("id", "r")
    actual_base = F.element_at(
        F.array(*[F.lit(s) for s in ATIS_INTENTS]), (F.col("r") % n_cls + 1).cast("int")
    )
    second = F.element_at(
        F.array(*[F.lit(s) for s in ATIS_INTENTS]), ((F.col("r") + 3) % n_cls + 1).cast("int")
    )
    actual = (
        F.when(F.col("r") % 200 == 11, F.concat(actual_base, F.lit("+"), second))
        .when(F.col("r") % 283 == 5, F.lit("day_name"))  # unseen class
        .otherwise(actual_base)
    )
    # predicted: correct label in top-3 except every 13th row (wrong),
    # giving a known subset-accuracy for metric parity tests.
    lab = (F.col("r") % n_cls).cast("int")
    wrong = ((F.col("r") + 5) % n_cls).cast("int")
    p1 = F.when(F.col("r") % 13 == 2, wrong).otherwise(lab)
    p2 = ((F.col("r") + 7) % n_cls).cast("int")
    p3 = ((F.col("r") + 11) % n_cls).cast("int")
    intent_arr = F.array(*[F.lit(s) for s in ATIS_INTENTS])
    predicted = F.array(
        F.element_at(intent_arr, p1 + 1),
        F.element_at(intent_arr, p2 + 1),
        F.element_at(intent_arr, p3 + 1),
    )
    malformed = F.array(*[F.lit(s) for s in MALFORMED_RESPONSES])
    raw = (
        F.when(
            F.col("r") % 100 == 17,
            F.element_at(malformed, (F.col("r") % len(MALFORMED_RESPONSES) + 1).cast("int")),
        )
        .when(F.col("r") % 100 == 42, F.lit(VALID_RESPONSE_WHITESPACE))
        .otherwise(F.format_string("[%d, %d, %d]", p1, p2, p3))
    )
    return df.select(
        F.format_string("q-%06d", F.col("r")).alias("query_id"),
        F.format_string("show me flights case %d", F.col("r")).alias("user_prompt"),
        actual.alias("actual_intents"),
        predicted.alias("predicted_intents"),
        raw.alias("raw_response"),
    )


# ----------------------------------------------------- media payloads
# Real decodable media bytes (uncompressed 24-bit BMP / PCM-16 WAV via
# the pure-numpy codecs in operators.multimodal) derived from the media
# ref number k — formula-based like everything else here. The content
# is deliberately CONSTANT per payload (one color / one amplitude) so
# the decoded features (mean RGB, dims, RMS, peak, duration) are exact
# k-arithmetic, expressible in the driver's DuckDB oracles: real decode
# kernels get value-level correctness rows, not just plumbing checks.

def media_payload_image(k: int) -> bytes:
    """(4 + k%5) x (3 + k%7) BMP filled with RGB
    (k%256, (3k+7)%256, (5k+11)%256) → decoded mean_r == k%256 exactly
    (mean of identical uint8 is an exact small-int double)."""
    from .operators.multimodal import encode_bmp
    w, h = 4 + k % 5, 3 + k % 7
    color = (k % 256, (3 * k + 7) % 256, (5 * k + 11) % 256)
    return encode_bmp(np.full((h, w, 3), color, dtype=np.uint8))


def media_payload_audio(k: int) -> bytes:
    """0.1 s @ 16 kHz PCM-16 WAV at constant amplitude (k%32)*1024 →
    decoded rms == peak == (k%32)/32 exactly (power-of-two divisor:
    float32-representable; constant samples: the mean of identical
    exact squares is exact), zcr == 0, duration == 0.1."""
    from .operators.multimodal import encode_wav_pcm16
    a = (k % 32) * 1024
    return encode_wav_pcm16(np.full(1600, a, dtype=np.int16), 16000)


def attach_media_payloads(df: DataFrame, kind: str = "image",
                          ref_col: str = "media_ref") -> DataFrame:
    """Attach real decodable payload bytes to a refs frame, ref →
    bytes via the k = int(ref[6:]) formula ('media-%05d' refs). Python
    byte assembly → mapInPandas (datagen/probe path, not a hot path);
    null refs get null payloads."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    gen = media_payload_image if kind == "image" else media_payload_audio
    # fresh StructType — StructType.add MUTATES the frame's cached
    # schema in place, making mapInPandas resolve a phantom input column
    out_schema = StructType(
        list(df.schema.fields) + [StructField("payload", BinaryType())]
    )

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                None if ref is None else gen(int(str(ref)[6:]))
                for ref in pdf[ref_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
