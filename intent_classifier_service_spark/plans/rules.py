"""Rule DSL + compiler.

A rule is a named predicate with an observed/expected projection. The
compiler fuses every span rule into ONE pass over the exploded spans
(single parquet scan, single explode, whole-stage codegen; violations
for all rules emitted from one ``filter(explode(array(...)))`` chain) —
the engine analog of the reference compiling its checks into one
sequential pass per response (gpt_intent_classifier.py:434-464,847-882).

Outputs match the north-rule shapes exactly:
  violations: (doc_id, rule_id, span_index, observed, expected)
  verdicts:   (rule_id, n_checked, n_violations, violation_rate, pass)
  per-partition verdicts add part_key in front.

The pass/fail gate mirrors the reference's load gate (valid ≥ 95 % ∧
accuracy ≥ 0.80 → start; gpt_intent_classifier.py:396-398): per-rule
``violation_rate ≤ max_rate`` with an overall AND.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import spans as S

VIOLATION_COLS = ("doc_id", "rule_id", "span_index", "observed", "expected")


@dataclass(frozen=True)
class SpanRule:
    """Predicate over one exploded span row.

    ``violated`` / ``observed`` receive the exploded frame's columns via
    F.col: kind, text, media_ref, offset, prev_offset, span_index.
    ``threshold`` overrides the set-wide max_violation_rate for this
    rule's pass/fail — the reference gates different checks at
    different bars (validity ≥ 95 % vs accuracy ≥ 80 %,
    gpt_intent_classifier.py:396-398), and a schema-critical rule
    (e.g. kind domain) often warrants a stricter bar than a soft one.
    """

    rule_id: str
    violated: Callable[[], Column]
    observed: Callable[[], Column]
    expected: str
    threshold: float | None = None


@dataclass(frozen=True)
class DocRule:
    """Predicate over one document row (doc-level columns, or the whole
    spans array). span_index is NULL on its violations.
    ``threshold`` as in SpanRule."""

    rule_id: str
    violated: Callable[[], Column]
    observed: Callable[[], Column]
    expected: str
    threshold: float | None = None


def _null_safe_violated(rule_violated: Column) -> Column:
    return F.coalesce(rule_violated, F.lit(False))


# ------------------------------------------------------------ core rule set

SPAN_RULES: list[SpanRule] = [
    SpanRule(
        "R-SPAN-KIND",
        violated=lambda: ~F.col("kind").isin(*S.VALID_KINDS) | F.col("kind").isNull(),
        observed=lambda: F.coalesce(F.col("kind"), F.lit("<null>")),
        expected="kind in {text,media}",
    ),
    SpanRule(
        "R-SPAN-MUTEX",
        violated=lambda: (
            ((F.col("kind") == "text") & (F.col("text").isNull() | F.col("media_ref").isNotNull()))
            | ((F.col("kind") == "media") & (F.col("media_ref").isNull() | F.col("text").isNotNull()))
        ),
        observed=lambda: F.format_string(
            "text=%s,media_ref=%s",
            F.coalesce(F.col("text"), F.lit("<null>")),
            F.coalesce(F.col("media_ref"), F.lit("<null>")),
        ),
        expected="exactly one of text/media_ref set, matching kind",
    ),
    SpanRule(
        "R-SPAN-MONO",
        violated=lambda: F.col("prev_offset").isNotNull()
        & (F.col("offset") <= F.col("prev_offset")),
        observed=lambda: F.format_string(
            "offset=%d,prev=%d", F.col("offset"), F.col("prev_offset")
        ),
        expected="offset strictly increasing",
    ),
]

DOC_RULES: list[DocRule] = [
    DocRule(
        "R-DOC-ID-NOTNULL",
        violated=lambda: F.col("doc_id").isNull() | (F.length(F.trim(F.col("doc_id"))) == 0),
        observed=lambda: F.coalesce(F.col("doc_id"), F.lit("<null>")),
        expected="doc_id non-null, non-blank",
    ),
    DocRule(
        "R-DOC-SPANS-NONEMPTY",
        violated=lambda: F.col("spans").isNull() | (F.size("spans") == 0),
        observed=lambda: F.format_string("n_spans=%d", F.coalesce(F.size("spans"), F.lit(-1))),
        expected="spans non-empty",
    ),
]


def repetition_rules(line_frac_max: float = 0.30,
                     gram_mass_max: float = 0.20,
                     min_tokens: int = 20,
                     threshold: float | None = 0.05) -> list[DocRule]:
    """Gopher-style intra-doc repetition rules (Rae et al. 2021 §A1.1)
    as DocRules over the doc's text content (doc_text: joined text
    spans) — OPT-IN (RuleSet(doc_rules=[*DOC_RULES,
    *repetition_rules()])) so the default rule set and its golden
    artifacts stay stable. Both metrics are pure JVM expressions
    (textstats.repeated_line_fraction / top_ngram_mass), so the rules
    ride the same fused scan as every other doc rule: dedup catches
    inter-doc repetition, these catch boilerplate/spam WITHIN a doc.
    Per-doc limits follow the Gopher filter (repeated-line fraction
    0.30; top-2-gram count mass 0.20); the 2-gram rule only applies to
    docs with ≥ ``min_tokens`` tokens — on a w-token doc the mass is
    bounded below by 1/(w−1), so short docs would trip the bar
    trivially (Gopher likewise gates repetition filters behind a
    minimum word count). ``threshold`` bounds the corpus-level flagged
    fraction for the gate."""
    from ..operators.drift import doc_text
    from ..operators.textstats import (repeated_line_fraction, token_count,
                                       top_ngram_mass)

    return [
        DocRule(
            "R-DOC-REP-LINES",
            violated=lambda: repeated_line_fraction(doc_text()) > line_frac_max,
            observed=lambda: F.format_string(
                "rep_line_frac=%.4f", repeated_line_fraction(doc_text())
            ),
            expected=f"repeated-line fraction <= {line_frac_max}",
            threshold=threshold,
        ),
        DocRule(
            "R-DOC-REP-2GRAM",
            violated=lambda: (token_count(doc_text()) >= min_tokens)
            & (top_ngram_mass(doc_text(), 2) > gram_mass_max),
            observed=lambda: F.format_string(
                "top_2gram_mass=%.4f", top_ngram_mass(doc_text(), 2)
            ),
            expected=f"top-2-gram mass <= {gram_mass_max}",
            threshold=threshold,
        ),
    ]


@dataclass
class RuleSet:
    span_rules: list[SpanRule] = field(default_factory=lambda: list(SPAN_RULES))
    doc_rules: list[DocRule] = field(default_factory=lambda: list(DOC_RULES))
    max_violation_rate: float = 0.05  # reference: valid ≥ 95 %

    def rule_ids(self) -> list[str]:
        return [r.rule_id for r in self.span_rules] + [r.rule_id for r in self.doc_rules]

    def threshold_for(self, rule_id: str) -> float:
        """This rule's pass bar: its own threshold if set, else the
        set-wide max_violation_rate."""
        for r in (*self.span_rules, *self.doc_rules):
            if r.rule_id == rule_id and r.threshold is not None:
                return r.threshold
        return self.max_violation_rate

    def threshold_expr(self) -> Column:
        """Column mapping the ``rule_id`` column to its pass bar — for
        verdict frames built from stored/unpivoted rows where the rule
        is only known as a string. Unknown rule ids (e.g. R-DOC-UNIQUE
        rows reconstructed from a checkpoint) fall back to the
        set-wide default, matching threshold_for."""
        rules = (*self.span_rules, *self.doc_rules)
        default = F.lit(self.max_violation_rate)
        if not rules:
            return default
        m = F.create_map(*[
            x for r in rules
            for x in (F.lit(r.rule_id), F.lit(self.threshold_for(r.rule_id)))
        ])
        return F.coalesce(F.element_at(m, F.col("rule_id")), default)


# ------------------------------------------------------------------ compiler

def _emit(rules, unit_df: DataFrame, span_index_col: Column, keep: list[str]) -> DataFrame:
    """Fuse all rules over one frame: per row build an array with one
    nullable struct per rule, drop nulls, explode. Single codegen stage."""
    entries = [
        F.when(
            _null_safe_violated(r.violated()),
            F.struct(
                F.lit(r.rule_id).alias("rule_id"),
                r.observed().alias("observed"),
                F.lit(r.expected).alias("expected"),
            ),
        )
        for r in rules
    ]
    hits = F.filter(F.array(*entries), lambda x: x.isNotNull())
    # No pre-filter on size(_hits): a non-outer explode already emits
    # zero rows for empty arrays, and a filter predicate would re-inline
    # the whole hits construction (projection collapse) — doubling the
    # per-row rule evaluation for a semantically redundant check.
    return (
        unit_df.select(*keep, span_index_col.alias("span_index"), hits.alias("_hits"))
        .select(*keep, "span_index", F.explode("_hits").alias("v"))
        .select(
            *keep,
            F.col("v.rule_id").alias("rule_id"),
            F.col("span_index"),
            F.col("v.observed").alias("observed"),
            F.col("v.expected").alias("expected"),
        )
    )


def violations(docs: DataFrame, rules: RuleSet | None = None,
               keep: tuple[str, ...] = ()) -> DataFrame:
    """All violation rows for the rule set. ``keep`` adds passthrough
    columns (e.g. part_key) in front of the standard shape."""
    rules = rules or RuleSet()
    keep_cols = ["doc_id", *keep]
    out_cols = [*keep, *VIOLATION_COLS] if keep else list(VIOLATION_COLS)
    parts = []
    if rules.span_rules:
        exploded = S.explode_spans(docs, keep=tuple(keep_cols))
        parts.append(
            _emit(rules.span_rules, exploded, F.col("span_index").cast("int"), keep_cols)
        )
    if rules.doc_rules:
        parts.append(_emit(rules.doc_rules, docs, F.lit(None).cast("int"), keep_cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*out_cols)


def verdicts(docs: DataFrame, rules: RuleSet | None = None,
             by: tuple[str, ...] = ()) -> DataFrame:
    """Per-rule (optionally per-partition, by=('part_key',)) verdicts in
    ONE scan: doc-rule flags are evaluated before the explode and
    carried as booleans; posexplode_outer keeps empty-span docs in the
    stream (span_index NULL); a single hash aggregation then counts
    span checks (span_index NOT NULL rows) and doc checks (first-span
    or empty-doc rows), unpivoted with stack. At 100 TB this is the
    difference between one pass and rules-families × passes."""
    rules = rules or RuleSet()
    gb = list(by)

    flag_cols = {f"_df_{r.rule_id}": _null_safe_violated(r.violated())
                 for r in rules.doc_rules}
    flagged = docs.select(
        *gb, "spans", *[c.alias(n) for n, c in flag_cols.items()]
    )
    exploded = S.explode_spans(flagged, keep=(*gb, *flag_cols), outer=True)

    span_checked = F.col("span_index").isNotNull()
    is_doc_row = F.col("span_index").isNull() | (F.col("span_index") == 0)
    aggs = [
        F.sum(span_checked.cast("long")).alias("_n_spans"),
        F.sum(is_doc_row.cast("long")).alias("_n_docs"),
    ]
    for r in rules.span_rules:
        aggs.append(
            F.sum((span_checked & _null_safe_violated(r.violated())).cast("long"))
            .alias(f"_v_{r.rule_id}")
        )
    for r in rules.doc_rules:
        aggs.append(
            F.sum((is_doc_row & F.col(f"_df_{r.rule_id}")).cast("long"))
            .alias(f"_v_{r.rule_id}")
        )
    tot = exploded.groupBy(*gb).agg(*aggs)

    def unpivot(rule_list, n_col: str) -> DataFrame:
        stack_args = ", ".join(f"'{r.rule_id}', `_v_{r.rule_id}`" for r in rule_list)
        return tot.selectExpr(
            *gb,
            f"stack({len(rule_list)}, {stack_args}) as (rule_id, n_violations)",
            f"{n_col} as n_checked",
        )

    parts = []
    if rules.span_rules:
        parts.append(unpivot(rules.span_rules, "_n_spans"))
    if rules.doc_rules:
        parts.append(unpivot(rules.doc_rules, "_n_docs"))
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    rate = F.when(F.col("n_checked") > 0,
                  F.col("n_violations") / F.col("n_checked")).otherwise(F.lit(0.0))
    return both.select(
        *gb,
        "rule_id",
        "n_checked",
        "n_violations",
        rate.alias("violation_rate"),
    ).withColumn("pass", F.col("violation_rate") <= rules.threshold_expr())


def full_violations(docs: DataFrame, valid_refs: DataFrame | None = None,
                    rules: RuleSet | None = None,
                    keep: tuple[str, ...] = (),
                    n_salts: int = 32,
                    uniqueness_from: DataFrame | None = None,
                    uniqueness_rows: DataFrame | None = None,
                    include_uniqueness: bool = True) -> DataFrame:
    """The complete violation pass in TWO scans of the table instead of
    one per rule family:

      scan 1 (heavy): explode spans once → broadcast-LEFT-join the
        valid-refs dim (adds a match flag; same hash probe as the
        left_anti, but the stream continues) → emit span-rule AND
        referential violations from one fused filter/explode chain;
        doc rules emit from the pre-explode side of the same scan's
        lineage (columnar doc_id/spans only).
      scan 2 (light): salted two-phase uniqueness — reads only the
        doc_id column (columnar parquet scan, no span decode).

    Output identical to violations() ∪ referential_violations() ∪
    uniqueness_violations() (golden-pinned).

    ``uniqueness_from`` overrides the frame scan 2 reads: uniqueness is
    a GLOBAL rule (duplicate doc_ids span partitions), so a resumed run
    must point it at the FULL table while the per-partition rules cover
    only the pending subset — a subset scan would miss cross-partition
    duplicates and silently under-report. Defaults to ``docs``.

    ``uniqueness_rows`` overrides scan 2 entirely with pre-built
    R-DOC-UNIQUE violation rows (shape: uniqueness_violations output) —
    the incremental-resume path derives them from checkpointed
    per-partition doc counts merged with the pending scan, so NO table
    scan happens for uniqueness at all."""
    from ..operators.uniqueness import uniqueness_violations

    rules = rules or RuleSet()
    keep_cols = ["doc_id", *keep]
    out_cols = [*keep, *VIOLATION_COLS] if keep else list(VIOLATION_COLS)

    exploded = S.explode_spans(docs, keep=tuple(keep_cols))
    span_rules = list(rules.span_rules)
    if valid_refs is not None:
        marked_dim = F.broadcast(
            valid_refs.select("media_ref").withColumn("_ref_ok", F.lit(True))
        )
        exploded = exploded.join(marked_dim, "media_ref", "left")
        span_rules.append(SpanRule(
            "R-REF-MEDIA",
            violated=lambda: F.col("media_ref").isNotNull() & F.col("_ref_ok").isNull(),
            observed=lambda: F.col("media_ref"),
            expected="media_ref in valid_media_refs",
        ))
    span_v = _emit(span_rules, exploded, F.col("span_index").cast("int"), keep_cols)
    parts = [span_v.select(*out_cols)]
    if rules.doc_rules:
        parts.append(
            _emit(rules.doc_rules, docs, F.lit(None).cast("int"), keep_cols)
            .select(*out_cols)
        )
    # include_uniqueness=False drops scan 2 entirely — the streaming
    # path uses this: uniqueness is a global stateful aggregation with
    # unbounded state over an infinite stream, so streams run the
    # stateless rule families here and leave uniqueness to the batch
    # (or windowed) layer.
    if include_uniqueness:
        if uniqueness_rows is not None:
            uniq = uniqueness_rows
        else:
            uniq = uniqueness_violations(
                docs if uniqueness_from is None else uniqueness_from,
                n_salts=n_salts,
            )
        if keep:
            dtypes = dict(docs.dtypes)
            for k in keep:
                uniq = uniq.withColumn(k, F.lit(None).cast(dtypes[k]))
        parts.append(uniq.select(*out_cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def partition_valid(docs: DataFrame, valid_refs: DataFrame | None = None,
                    rules: RuleSet | None = None,
                    include_uniqueness: bool = True,
                    ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — the dedup-pipeline 'act on violations'
    step: quarantined = every doc with ANY violation row (span, doc,
    referential, and — optionally — uniqueness: BOTH copies of a
    duplicated id are quarantined, matching the violation rows), clean
    = the rest. Null-id docs cannot be reached by an id join, but a
    null doc_id IS an R-DOC-ID-NOTNULL violation, so they route to
    quarantine explicitly.

    Scale shape: one violations pass builds the (distinct doc_id)
    offender set — tiny relative to the corpus when the gate passes —
    then one anti + one semi hash join split the table; AQE broadcasts
    the offender side when it fits. Invariant (test-pinned): clean ∪
    quarantined ≡ docs, disjoint."""
    v = full_violations(docs, valid_refs, rules,
                        include_uniqueness=include_uniqueness)
    bad_ids = v.select("doc_id").filter(F.col("doc_id").isNotNull()).distinct()
    null_id = F.col("doc_id").isNull()
    clean = docs.filter(~null_id).join(bad_ids, "doc_id", "left_anti")
    quarantined = docs.filter(null_id).unionByName(
        docs.join(bad_ids, "doc_id", "left_semi")
    )
    return clean, quarantined


def rollup_verdicts(vd_part: DataFrame, rules: RuleSet | None = None,
                    drop: tuple[str, ...] = ("part_key",)) -> DataFrame:
    """Global verdicts derived from the per-partition verdict table —
    no second scan of the data; at 10^12 docs the rollup reads the tiny
    verdict table, never the corpus."""
    rules = rules or RuleSet()
    agg = (
        vd_part.groupBy("rule_id")
        .agg(F.sum("n_checked").alias("n_checked"),
             F.sum("n_violations").alias("n_violations"))
    )
    rate = F.when(F.col("n_checked") > 0,
                  F.col("n_violations") / F.col("n_checked")).otherwise(F.lit(0.0))
    return agg.select(
        "rule_id", "n_checked", "n_violations",
        rate.alias("violation_rate"),
    ).withColumn("pass", F.col("violation_rate") <= rules.threshold_expr())


def gate(verdicts_df: DataFrame) -> bool:
    """Driver-side overall pass/fail — the engine's 'server starts'
    decision (reference server.py:177-185). Collects only the tiny
    verdict table."""
    row = verdicts_df.agg(F.min(F.col("pass").cast("int")).alias("all_pass")).collect()[0]
    return bool(row["all_pass"] == 1 if row["all_pass"] is not None else True)
