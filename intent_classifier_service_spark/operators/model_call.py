"""The per-row external model call, vectorized.

The reference's only true per-row black box is the OpenAI call
(get_prediction_labels, gpt_intent_classifier.py:259-287) executed one
HTTP round-trip per evaluation row in a sequential loop (:868-882) —
the scalability cliff this engine removes. The engine shape: an
Arrow-batched ``pandas_udf`` (series → series) so a real model client
can batch requests per Arrow chunk (10k rows by default, session.py)
while Spark parallelizes chunks across executors.

The sandbox has no network and no model, so ``stub_classifier_udf``
is a deterministic fake that produces reference-shaped responses
"[i, j, k]" (including occasional malformed outputs, mirroring
malformed_responses.txt) — the plumbing, batching, and downstream
validation path are the real thing.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _fake_response(text: str, n_classes: int) -> str:
    """Deterministic fake model: digest → three labels; every 97th
    input (by digest) yields a malformed response."""
    h = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "big")
    if h % 97 == 0:
        return "3, 1, 2"  # malformed: missing brackets
    a, b, c = h % n_classes, (h // 7) % n_classes, (h // 49) % n_classes
    return f"[{a}, {b}, {c}]"


def stub_classifier_udf(n_classes: int = 17):
    """series → series pandas UDF; swap `_fake_response` for a batched
    model-client call in production (one request per Arrow batch)."""

    @pandas_udf(StringType())
    def classify(texts: pd.Series) -> pd.Series:
        # one vectorized pass per Arrow batch — a real client would
        # send `texts.tolist()` as ONE batched request here
        return texts.map(lambda t: _fake_response(t or "", n_classes))

    return classify


def predict(df: DataFrame, text_col: str = "user_prompt",
            n_classes: int = 17) -> DataFrame:
    """predict_test_set analog (:847-882): adds raw_response for every
    row in one distributed pass instead of a sequential HTTP loop."""
    return df.withColumn("raw_response", stub_classifier_udf(n_classes)(F.col(text_col)))
