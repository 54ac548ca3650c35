"""One-scan fusion of the validation job's whole-table passes.

``jobs/validate.py`` needs, per run: per-partition per-rule verdicts
(R.verdicts, one exploded scan) AND the two drift distributions
(drift.drift_profile, another exploded scan). Both consume the same
exploded span stream, so GROUPING SETS ((part_key), (kind),
(off_bucket)) produces all three result families from ONE hash
aggregation over ONE scan — at 10^12 docs this removes an entire pass
over the corpus. Column stats deliberately stay separate: they read
doc-level columns without exploding, and carrying the whole ``spans``
array through the explode would multiply shuffle width per span row.

Parity: tests/test_fused.py pins this function's three outputs
row-identical to R.verdicts(...) and drift.drift_profile(...) run
separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import spans as S
from ..sources.tables import tiny_table
from . import rules as R


def fused_verdicts_and_drift(docs: DataFrame, rules: R.RuleSet | None = None,
                             lo: int = 0, hi: int = 128, n_bins: int = 32,
                             by: tuple[str, ...] = ("part_key",),
                             ) -> tuple[DataFrame, DataFrame, DataFrame,
                                        DataFrame, DataFrame, DataFrame]:
    """Returns (vd_part, kind_freq, offset_hist, lang_freq,
    quality_hist, profile_counts) from one scan.

    vd_part matches R.verdicts(docs, rules, by=by) exactly;
    kind_freq/offset_hist match drift.drift_profile(docs, lo, hi);
    lang_freq/quality_hist match drift.text_distributions(docs). The
    text metrics are computed per DOC before the explode (two tiny
    columns carried through it) and counted on doc rows only, so the
    text-drift gate costs no extra pass.

    The profile grouping sets carry the ``by`` columns, so the same
    scan also yields PER-PARTITION histogram counts — profile_counts
    (part, dist, bucket, n), matching drift.partitioned_profile_counts
    — which checkpointed runs persist for merge-based incremental
    resume of the global drift rules; the global distributions are the
    column-wise sums (identical integers → identical normalized freqs).
    The grouping-sets result is ≤ n_parts·(n_rules + n_kinds + 2·n_bins
    + n_langs) rows — collected once, re-emitted as local DataFrames.
    """
    rules = rules or R.RuleSet()
    gb = list(by)
    spark = docs.sparkSession

    from ..operators import drift as D
    from ..operators.textstats import lang_id

    flag_cols = {f"_df_{r.rule_id}": R._null_safe_violated(r.violated())
                 for r in rules.doc_rules}
    # per-doc text metrics, computed ONCE per doc pre-explode
    flagged = docs.select(
        *gb, "spans", D.doc_text().alias("_doc_text"),
        *[c.alias(n) for n, c in flag_cols.items()],
    ).select(
        *gb, "spans", lang_id("_doc_text").alias("_lang"),
        D.quality_bucket("_doc_text", n_bins).alias("_qb"),
        *flag_cols,
    )
    exploded = S.explode_spans(flagged, keep=(*gb, "_lang", "_qb", *flag_cols),
                               outer=True)

    off_bucket = D.offset_bucket(lo, hi, n_bins)  # THE binning rule

    span_checked = F.col("span_index").isNotNull()
    is_doc_row = F.col("span_index").isNull() | (F.col("span_index") == 0)
    aggs = [
        F.sum(span_checked.cast("long")).alias("_n_spans"),
        F.sum(is_doc_row.cast("long")).alias("_n_docs"),
    ]
    for r in rules.span_rules:
        aggs.append(
            F.sum((span_checked & R._null_safe_violated(r.violated())).cast("long"))
            .alias(f"_v_{r.rule_id}")
        )
    for r in rules.doc_rules:
        aggs.append(
            F.sum((is_doc_row & F.col(f"_df_{r.rule_id}")).cast("long"))
            .alias(f"_v_{r.rule_id}")
        )

    base = exploded.withColumn("off_bucket", off_bucket)
    gs = (
        base.groupingSets([[*gb], [*gb, "kind"], [*gb, "off_bucket"],
                           [*gb, "_lang"], [*gb, "_qb"]],
                          *gb, "kind", "off_bucket", "_lang", "_qb")
        .agg(*aggs,
             F.grouping_id(*gb, "kind", "off_bucket", "_lang", "_qb").alias("_gid"))
        .collect()
    )

    # grouping_id bit per column, MSB first: (by..., kind, off_bucket,
    # _lang, _qb). A set bit means the column is AGGREGATED (not part
    # of the set) — every set keeps the by-cols (profile counts are
    # per-partition now; global counts are their sums).
    n_cols = len(gb) + 4
    all_bits = (1 << n_cols) - 1
    gbm = ((1 << len(gb)) - 1) << 4
    gid_part = all_bits ^ gbm
    gid_kind = all_bits ^ gbm ^ (1 << 3)
    gid_off = all_bits ^ gbm ^ (1 << 2)
    gid_lang = all_bits ^ gbm ^ (1 << 1)
    gid_qb = all_bits ^ gbm ^ 1

    part_rows = [r for r in gs if r["_gid"] == gid_part]
    pp_kind = [r for r in gs if r["_gid"] == gid_kind and r["kind"] is not None]
    pp_off = [r for r in gs if r["_gid"] == gid_off and r["off_bucket"] is not None]
    # text metrics count DOC rows (the explode fans each doc's _lang/_qb
    # out over its spans; is_doc_row restores one-per-doc counting)
    pp_lang = [r for r in gs if r["_gid"] == gid_lang and r["_lang"] is not None]
    pp_qb = [r for r in gs if r["_gid"] == gid_qb and r["_qb"] is not None]

    def _sum_over_parts(rows, key, n_col):
        acc: dict = {}
        for r in rows:
            acc[r[key]] = acc.get(r[key], 0) + r[n_col]
        return sorted(acc.items())

    kind_rows = _sum_over_parts(pp_kind, "kind", "_n_spans")
    off_rows = _sum_over_parts(pp_off, "off_bucket", "_n_spans")
    lang_rows = _sum_over_parts(pp_lang, "_lang", "_n_docs")
    qb_rows = _sum_over_parts(pp_qb, "_qb", "_n_docs")

    # per-partition profile counts (checkpointable incremental state)
    count_rows = (
        [(*[r[g] for g in gb], "span_kind", str(r["kind"]), r["_n_spans"])
         for r in pp_kind]
        + [(*[r[g] for g in gb], "offset_hist", str(r["off_bucket"]), r["_n_spans"])
           for r in pp_off]
        + [(*[r[g] for g in gb], "lang_freq", str(r["_lang"]), r["_n_docs"])
           for r in pp_lang]
        + [(*[r[g] for g in gb], "quality_hist", str(r["_qb"]), r["_n_docs"])
           for r in pp_qb]
    )

    # -- vd_part: same unpivot + rate/pass math as R.verdicts ----------
    vd_out = []
    for r in part_rows:
        for rule, n_col in ([(x, "_n_spans") for x in rules.span_rules]
                            + [(x, "_n_docs") for x in rules.doc_rules]):
            n_checked = r[n_col] or 0
            n_viol = r[f"_v_{rule.rule_id}"] or 0
            rate = (n_viol / n_checked) if n_checked > 0 else 0.0
            vd_out.append((*[r[g] for g in gb], rule.rule_id, n_checked,
                           n_viol, rate,
                           rate <= rules.threshold_for(rule.rule_id)))
    by_schema = ", ".join(f"{g} {docs.schema[g].dataType.simpleString()}" for g in gb)
    # tiny_table: these six frames are driver-local metadata rows with
    # MULTIPLE downstream consumers in jobs/validate (rollup, gates,
    # writes, rule-stats append) — the default createDataFrame costs
    # one Python-worker round-trip per default partition PER consumer
    vd_part = tiny_table(
        spark, vd_out,
        f"{by_schema}, rule_id string, n_checked long, n_violations long, "
        "violation_rate double, pass boolean",
    )

    # -- drift distributions: same normalization as drift_profile ------
    k_tot = sum(c for _, c in kind_rows) or 1
    o_tot = sum(c for _, c in off_rows) or 1
    kind_df = tiny_table(
        spark, [(k, c / k_tot) for k, c in kind_rows],
        "bucket string, freq double")
    off_df = tiny_table(
        spark, [(int(b), c / o_tot) for b, c in off_rows],
        "bucket int, freq double")
    # -- text distributions: same normalization as text_distributions --
    l_tot = sum(c for _, c in lang_rows) or 1
    q_tot = sum(c for _, c in qb_rows) or 1
    lang_df = tiny_table(
        spark, [(k, c / l_tot) for k, c in lang_rows],
        "bucket string, freq double")
    q_df = tiny_table(
        spark, [(int(b), c / q_tot) for b, c in qb_rows],
        "bucket int, freq double")
    by_count_schema = ", ".join(
        f"{g} {docs.schema[g].dataType.simpleString()}" for g in gb
    )
    counts_df = tiny_table(
        spark, count_rows,
        f"{by_count_schema}, dist string, bucket string, n long")
    return vd_part, kind_df, off_df, lang_df, q_df, counts_df
