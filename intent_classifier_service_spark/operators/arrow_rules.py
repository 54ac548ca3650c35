"""Arrow-vectorized span-rule execution path.

The north rule mandates span predicates as vectorized pandas/Arrow UDFs
with zero per-row Python — meaning Spark never calls Python row-at-a-
time; whole Arrow batches cross the boundary once and are processed
with pandas/numpy column operations. This module is that path: the
same three span rules as plans/rules.py, emitting identical violation
rows, implemented over ``mapInPandas``.

Inside each batch the ragged spans column is flattened with pandas
``explode`` + a single ``pd.DataFrame(list)`` materialization, then all
predicates are numpy boolean masks; prev-offset is a groupby shift.
No per-span Python function calls in the rule logic.

The JVM higher-order-function path (plans/rules.py) remains the default
hot path — it stays inside whole-stage codegen and avoids the Arrow
serialization round-trip entirely. tests/test_arrow_rules.py pins the
two paths row-identical; bench comparisons justify the default.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VIOLATION_SCHEMA = (
    "doc_id string, rule_id string, span_index int, observed string, expected string"
)

EXPECTED = {
    "R-SPAN-KIND": "kind in {text,media}",
    "R-SPAN-MUTEX": "exactly one of text/media_ref set, matching kind",
    "R-SPAN-MONO": "offset strictly increasing",
}


def _batch_violations(pdf: pd.DataFrame) -> pd.DataFrame:
    empty = pd.DataFrame(
        columns=["doc_id", "rule_id", "span_index", "observed", "expected"]
    )
    if len(pdf) == 0:
        return empty
    # Empty/null arrays contribute no span rows (JVM: non-outer explode),
    # but null ELEMENTS of non-empty arrays are kept as all-null field
    # rows — the JVM path indexes them (span_index counts them), fires
    # R-SPAN-KIND on the null kind, and breaks the monotone chain at
    # them. Dropping them here would shift every later span_index and
    # compute prev_offset across the gap (round-1 parity bug).
    lens = pdf["spans"].map(lambda a: 0 if a is None else len(a))
    nonempty = pdf[lens > 0]
    if len(nonempty) == 0:
        return empty
    ex = nonempty[["doc_id"]].join(nonempty["spans"].explode().rename("span"))
    ex = ex.reset_index(names="_row")
    ex["span_index"] = ex.groupby("_row").cumcount().astype(np.int32)
    fields = pd.DataFrame(  # one ragged->columnar flatten; None -> all-null row
        [s if s is not None else {} for s in ex["span"]]
    )
    for c in ("kind", "text", "media_ref", "offset"):
        if c not in fields.columns:
            fields[c] = None
    kind = fields["kind"].to_numpy(dtype=object)
    text = fields["text"].to_numpy(dtype=object)
    ref = fields["media_ref"].to_numpy(dtype=object)
    offset = fields["offset"].to_numpy(dtype=float)  # NaN-safe comparisons

    text_null = pd.isna(text)
    ref_null = pd.isna(ref)
    # isin on the OBJECT array: an astype(str) here would go through
    # numpy's fixed-width <U dtype, which silently truncates trailing
    # NUL characters — 'text\x00' would collapse to 'text' and escape
    # the rule while the JVM path flags it.
    kind_bad = ~np.isin(kind, ["text", "media"]) | pd.isna(kind)
    is_text = kind == "text"
    is_media = kind == "media"
    mutex_bad = (is_text & (text_null | ~ref_null)) | (is_media & (ref_null | ~text_null))
    prev = ex.assign(_o=offset).groupby("_row")["_o"].shift(1).to_numpy()
    mono_bad = ~pd.isna(prev) & (offset <= prev)

    out = []
    base = ex[["doc_id", "span_index"]]
    if kind_bad.any():
        v = base[kind_bad].copy()
        v["rule_id"] = "R-SPAN-KIND"
        # keep object dtype end-to-end: np.char/<U strings drop NULs
        v["observed"] = np.where(pd.isna(kind[kind_bad]), "<null>", kind[kind_bad])
        out.append(v)
    if mutex_bad.any():
        v = base[mutex_bad].copy()
        v["rule_id"] = "R-SPAN-MUTEX"
        t = np.where(text_null[mutex_bad], "<null>", text[mutex_bad])
        m = np.where(ref_null[mutex_bad], "<null>", ref[mutex_bad])
        # object-dtype Series concat (C-level loop over PyStrings) —
        # np.char.add would round-trip through <U and eat NUL chars
        v["observed"] = (
            "text=" + pd.Series(t, index=v.index, dtype=object)
            + ",media_ref=" + pd.Series(m, index=v.index, dtype=object)
        )
        out.append(v)
    if mono_bad.any():
        v = base[mono_bad].copy()
        v["rule_id"] = "R-SPAN-MONO"
        v["observed"] = [
            f"offset={int(o)},prev={int(p)}"
            for o, p in zip(offset[mono_bad], prev[mono_bad])
        ]
        out.append(v)
    if not out:
        return empty
    res = pd.concat(out, ignore_index=True)
    res["expected"] = res["rule_id"].map(EXPECTED)
    return res[["doc_id", "rule_id", "span_index", "observed", "expected"]]


def arrow_span_violations(docs: DataFrame) -> DataFrame:
    """Violation rows for the three span rules, computed in Python via
    Arrow batches — row-identical to the JVM path for these rules."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _batch_violations(pdf)

    return docs.select("doc_id", "spans").mapInPandas(run, schema=VIOLATION_SCHEMA)
