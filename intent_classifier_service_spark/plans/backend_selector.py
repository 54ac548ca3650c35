"""Execution-backend factory — parity with the reference's classifier
factory (classifier_selector.choose_intent_classifier,
classifier_selector.py:5-35: pick GPT vs BERT engine by type string,
unknown type → error).

The engine's two interchangeable rule-execution backends:
  'jvm'   — higher-order-function path inside whole-stage codegen
            (default hot path, plans/rules.py)
  'arrow' — Arrow-batched mapInPandas path (operators/arrow_rules.py),
            the north-rule-mandated pandas-UDF surface

Both emit identical violation rows (pinned by tests); pick 'arrow' when
a rule needs a Python library in the loop, 'jvm' otherwise.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from . import rules as R

BACKENDS = ("jvm", "arrow")


def choose_rule_backend(backend: str = "jvm") -> Callable[[DataFrame], DataFrame]:
    """Return a span-violations function for the requested backend.
    Unknown backend → ValueError (reference raises on unknown classifier
    type, classifier_selector.py:30-35)."""
    if backend == "jvm":
        return lambda docs: R.violations(docs, R.RuleSet(doc_rules=[]))
    if backend == "arrow":
        from ..operators.arrow_rules import arrow_span_violations

        return arrow_span_violations
    raise ValueError(f"unknown rule backend {backend!r}; expected one of {BACKENDS}")
