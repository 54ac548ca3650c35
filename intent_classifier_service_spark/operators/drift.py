"""Distribution-drift checks: PSI and two-sample KS against a frozen
baseline snapshot (north rule), over span-kind frequencies and offset
histograms.

Engine analog of the reference's train-vs-test distribution comparisons
(notebooks/data_exploration.ipynb cells 15-20: class-frequency set
diffs) formalized into real statistics.

Scale shape: the only pass over the big table is a single
``groupBy(bucket).count()`` hash aggregation (map-side partials). PSI /
KS math then runs on ≤ n_bins rows — window ECDFs on a 32-row table are
free. KS on 10^12 rows is therefore histogram-ECDF-based by
construction, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.spans import explode_spans

EPS = 1e-6  # PSI smoothing for empty buckets


def span_kind_frequencies(docs: DataFrame) -> DataFrame:
    """(bucket, freq) — normalized span-kind frequencies."""
    counts = explode_spans(docs).groupBy(F.col("kind").alias("bucket")).count()
    total = F.sum("count").over(Window.partitionBy())
    return counts.select("bucket", (F.col("count") / total).alias("freq"))


def offset_bucket(lo: int, hi: int, n_bins: int = 32):
    """THE binning rule for offset histograms — single definition used
    by offset_histogram, drift_profile, and the fused single-scan pass
    (plans/fused.py); a change here changes all three together."""
    width = max((hi - lo) / n_bins, 1e-9)
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col("offset") - lo) / width)),
    ).cast("int")


def offset_histogram(docs: DataFrame, lo: int, hi: int, n_bins: int = 32) -> DataFrame:
    """(bucket, freq) — fixed-edge histogram of span offsets. Edges come
    from the frozen baseline (lo/hi), so current and baseline bucketize
    identically; out-of-range values clamp to the edge bins."""
    bucket = offset_bucket(lo, hi, n_bins)
    counts = explode_spans(docs).groupBy(bucket.alias("bucket")).count()
    total = F.sum("count").over(Window.partitionBy())
    return counts.select("bucket", (F.col("count") / total).alias("freq"))


def psi(current: DataFrame, baseline: DataFrame) -> float:
    """Population Stability Index: sum((p-q) * ln(p/q)) over buckets,
    eps-smoothed. current/baseline: (bucket, freq)."""
    joined = (
        current.withColumnRenamed("freq", "p")
        .join(baseline.withColumnRenamed("freq", "q"), "bucket", "full_outer")
        .select(
            F.coalesce("p", F.lit(0.0)).alias("p"),
            F.coalesce("q", F.lit(0.0)).alias("q"),
        )
    )
    row = joined.agg(
        F.sum(
            (F.col("p") - F.col("q"))
            * F.log((F.col("p") + EPS) / (F.col("q") + EPS))
        ).alias("psi")
    ).collect()[0]
    return float(row["psi"] or 0.0)


def psi_vs_frozen(qmap: dict, ks_col: str = "ks", n_col: str = "n_total"):
    """PSI of each row's (bucket, n)-struct-list distribution against a
    FROZEN driver-side baseline map, as one pure JVM column expression
    — including the mass of baseline buckets ABSENT from the row,
    which a join-free sum would silently drop. Shared by the streaming
    windowed drift (streaming/validate_stream.windowed_drift_psi) and
    the batch windowed-PSI query (driver_queries.q_windowed_drift_psi)
    so the two paths can never gate differently.

    Expects ``ks_col``: array<struct<bucket, n>> (the collect_list of
    per-bucket counts) and ``n_col``: the row's total count."""
    qlit = F.map_from_arrays(
        F.array(*[F.lit(k) for k in qmap]),
        F.array(*[F.lit(float(v)) for v in qmap.values()]),
    )
    qkeys = F.array(*[F.lit(k) for k in qmap])

    def q_of(k):
        return F.coalesce(F.element_at(qlit, k), F.lit(0.0))

    def p_of(e):
        return e["n"].cast("double") / F.col(n_col)

    present = F.aggregate(
        ks_col, F.lit(0.0),
        lambda acc, e: acc + (p_of(e) - q_of(e["bucket"]))
        * F.log((p_of(e) + F.lit(EPS)) / (q_of(e["bucket"]) + F.lit(EPS))),
    )
    observed = F.transform(ks_col, lambda e: e["bucket"])
    absent = F.aggregate(
        F.filter(qkeys, lambda k: ~F.array_contains(observed, k)),
        F.lit(0.0),
        lambda acc, k: acc - q_of(k) * F.log(F.lit(EPS) / (q_of(k) + F.lit(EPS))),
    )
    return present + absent


def windowed_psi(df: DataFrame, ts_col: str, cat_col: str,
                 baseline: DataFrame, window: str = "1 day",
                 psi_threshold: float = 0.2,
                 rule_id: str = "R-DRIFT-WINDOW-PSI") -> DataFrame:
    """Per-event-time-window PSI of ``cat_col``'s distribution against
    a frozen (bucket, freq) baseline — the BATCH equivalent of the
    streaming windowed drift gate, same fold expression
    (psi_vs_frozen), so the window+PSI composition is oracle-checkable
    even though the stream itself is not.

    Scale shape: one shuffle on (window, bucket) with map-side partial
    counts, then one on window; the baseline is collected once
    (≤ n_buckets rows by contract) into literal expressions — no join
    against the corpus. Output: (window, n_total, psi, pass, rule_id).
    """
    rows = baseline.collect()  # frozen baseline: tiny by contract
    qmap = {r["bucket"]: float(r["freq"]) for r in rows}
    counts = df.groupBy(
        F.window(ts_col, window).alias("window"),
        F.col(cat_col).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per_win = counts.groupBy("window").agg(
        F.collect_list(F.struct("bucket", "n")).alias("ks"),
        F.sum("n").alias("n_total"),
    )
    p = psi_vs_frozen(qmap)
    return per_win.select(
        "window", "n_total",
        p.alias("psi"),
        (p <= psi_threshold).alias("pass"),
        F.lit(rule_id).alias("rule_id"),
    )


def ks_from_histograms(current: DataFrame, baseline: DataFrame) -> float:
    """Two-sample KS statistic from aligned histograms: max |ECDF_p -
    ECDF_q| via cumulative sums over bucket order. Inputs: (bucket,
    freq) with comparable, orderable buckets."""
    joined = (
        current.withColumnRenamed("freq", "p")
        .join(baseline.withColumnRenamed("freq", "q"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("p", F.lit(0.0)).alias("p"),
            F.coalesce("q", F.lit(0.0)).alias("q"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = joined.select(
        (F.sum("p").over(w) - F.sum("q").over(w)).alias("d")
    )
    row = ecdf.agg(F.max(F.abs(F.col("d"))).alias("ks")).collect()[0]
    return float(row["ks"] or 0.0)


def doc_text(spans_col: str = "spans"):
    """The document's text content: its text spans joined by a space —
    THE definition shared by the fused scan, text_distributions, and
    the text-drift baseline (a change here changes all of them)."""
    return F.array_join(
        F.transform(
            F.filter(F.col(spans_col), lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        " ",
    )


def quality_bucket(col: str = "_doc_text", n_bins: int = 32):
    """Histogram bucket for the [0,1] quality score. round(6) first so
    both engines of an oracle check bucket identical values (the score
    sums three FP terms)."""
    from .textstats import quality_score
    q = F.round(quality_score(col), 6)
    return F.least(F.lit(n_bins - 1),
                   F.greatest(F.lit(0), F.floor(q * n_bins))).cast("int")


def text_distributions(docs: DataFrame,
                       n_bins: int = 32) -> tuple[DataFrame, DataFrame]:
    """(lang_freq, quality_hist) — language-ID frequencies and the
    quality-score histogram of the corpus text, one doc-level scan (no
    explode) via GROUPING SETS ((lang), (q_bucket)). Feeds the same
    PSI/KS math as the span distributions: this is where the pipeline's
    text-profile operators close the loop into the validation gate
    (a model-data corpus whose language mix or quality profile drifts
    should fail validation like a schema break does)."""
    from .textstats import lang_id
    base = docs.select(doc_text().alias("_doc_text")).select(
        lang_id("_doc_text").alias("lang"),
        quality_bucket("_doc_text", n_bins).alias("q_bucket"),
    )
    counts = (
        base.groupingSets([["lang"], ["q_bucket"]], "lang", "q_bucket")
        .agg(F.count(F.lit(1)).alias("count"),
             F.grouping_id("lang", "q_bucket").alias("_gid"))
        .collect()
    )
    # gid bit set ⇒ column aggregated: 0b01 → lang set, 0b10 → q set.
    # Null buckets (docs with null spans → null text → null quality)
    # are excluded from the histogram — those docs are the doc rules'
    # business (R-DOC-SPANS-NONEMPTY), not a quality-distribution shift.
    lang_rows = [(r["lang"], r["count"]) for r in counts
                 if r["_gid"] == 0b01 and r["lang"] is not None]
    q_rows = [(r["q_bucket"], r["count"]) for r in counts
              if r["_gid"] == 0b10 and r["q_bucket"] is not None]
    spark = docs.sparkSession
    l_tot = sum(c for _, c in lang_rows) or 1
    q_tot = sum(c for _, c in q_rows) or 1
    lang_df = spark.createDataFrame(
        [(k, c / l_tot) for k, c in lang_rows], "bucket string, freq double"
    )
    q_df = spark.createDataFrame(
        [(int(b), c / q_tot) for b, c in q_rows], "bucket int, freq double"
    )
    return lang_df, q_df


def drift_profile(docs: DataFrame, lo: int, hi: int,
                  n_bins: int = 32) -> tuple[DataFrame, DataFrame]:
    """Both drift distributions — span-kind frequencies AND the offset
    histogram — from ONE scan via GROUPING SETS ((kind), (off_bucket)):
    a single hash aggregation produces rows for each grouping, split
    afterwards on the tiny result. At 10^12 docs this halves drift I/O."""
    exploded = explode_spans(docs).select(
        "kind", offset_bucket(lo, hi, n_bins).alias("off_bucket")
    )
    counts = (
        exploded.groupingSets([["kind"], ["off_bucket"]], "kind", "off_bucket")
        .agg(F.count(F.lit(1)).alias("count"))
        .collect()
    )
    kind_rows = [(r["kind"], r["count"]) for r in counts if r["kind"] is not None]
    off_rows = [(r["off_bucket"], r["count"]) for r in counts if r["off_bucket"] is not None]
    spark = docs.sparkSession
    k_tot = sum(c for _, c in kind_rows) or 1
    o_tot = sum(c for _, c in off_rows) or 1
    kind_df = spark.createDataFrame(
        [(k, c / k_tot) for k, c in kind_rows], "bucket string, freq double"
    )
    off_df = spark.createDataFrame(
        [(b, c / o_tot) for b, c in off_rows], "bucket int, freq double"
    )
    return kind_df, off_df


def partitioned_profile_counts(docs: DataFrame, lo: int = 0, hi: int = 128,
                               n_bins: int = 32,
                               by: tuple[str, ...] = ("part_key",)) -> DataFrame:
    """Per-partition drift histogram COUNTS — (part_key, dist, bucket,
    n) with dist ∈ {span_kind, offset_hist, lang_freq, quality_hist} —
    from ONE grouping-sets scan (same construction as the fused pass:
    per-doc text metrics pre-explode, span counts on span rows, doc
    counts on doc rows, null buckets excluded). Counts are additive
    across partitions, so summing any subset's rows with stored rows
    for the complement reproduces the full-table distributions exactly
    — the incremental-resume primitive for the global drift rules."""
    from .textstats import lang_id

    gb = list(by)
    base = docs.select(*gb, "spans", doc_text().alias("_doc_text")).select(
        *gb, "spans", lang_id("_doc_text").alias("_lang"),
        quality_bucket("_doc_text", n_bins).alias("_qb"),
    )
    exploded = explode_spans(base, keep=(*gb, "_lang", "_qb"), outer=True)
    b = exploded.withColumn("off_bucket", offset_bucket(lo, hi, n_bins))
    span_checked = F.col("span_index").isNotNull()
    is_doc_row = F.col("span_index").isNull() | (F.col("span_index") == 0)
    gs = (
        b.groupingSets(
            [[*gb, "kind"], [*gb, "off_bucket"], [*gb, "_lang"], [*gb, "_qb"]],
            *gb, "kind", "off_bucket", "_lang", "_qb",
        )
        .agg(
            F.sum(span_checked.cast("long")).alias("_n_spans"),
            F.sum(is_doc_row.cast("long")).alias("_n_docs"),
            F.grouping_id(*gb, "kind", "off_bucket", "_lang", "_qb").alias("_gid"),
        )
    )
    n_cols = len(gb) + 4
    all_bits = (1 << n_cols) - 1
    gbm = ((1 << len(gb)) - 1) << 4
    gid_kind = all_bits ^ gbm ^ (1 << 3)
    gid_off = all_bits ^ gbm ^ (1 << 2)
    gid_lang = all_bits ^ gbm ^ (1 << 1)
    gid_qb = all_bits ^ gbm ^ 1
    g = F.col("_gid")
    dist = (
        F.when(g == gid_kind, F.lit("span_kind"))
        .when(g == gid_off, F.lit("offset_hist"))
        .when(g == gid_lang, F.lit("lang_freq"))
        .when(g == gid_qb, F.lit("quality_hist"))
    )
    bucket = (
        F.when(g == gid_kind, F.col("kind"))
        .when(g == gid_off, F.col("off_bucket").cast("string"))
        .when(g == gid_lang, F.col("_lang"))
        .when(g == gid_qb, F.col("_qb").cast("string"))
    )
    n = F.when(g.isin(gid_kind, gid_off), F.col("_n_spans")).otherwise(F.col("_n_docs"))
    return gs.select(
        *gb, dist.alias("dist"), bucket.alias("bucket"), n.alias("n")
    ).filter(F.col("dist").isNotNull() & F.col("bucket").isNotNull())


def distributions_from_counts(spark, counts: DataFrame,
                              ) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(kind_freq, offset_hist, lang_freq, quality_hist) from merged
    per-partition counts — identical normalization to drift_profile /
    text_distributions (integer totals, one division), so merged-resume
    and full-scan paths can never disagree."""
    rows = counts.groupBy("dist", "bucket").agg(F.sum("n").alias("n")).collect()
    byd: dict[str, list] = {}
    for r in rows:
        byd.setdefault(r["dist"], []).append((r["bucket"], r["n"]))
    out = []
    for dist, bucket_type in (("span_kind", "string"), ("offset_hist", "int"),
                              ("lang_freq", "string"), ("quality_hist", "int")):
        d = byd.get(dist, [])
        tot = sum(c for _, c in d) or 1
        if bucket_type == "int":
            data = [(int(b), c / tot) for b, c in d]
        else:
            data = [(b, c / tot) for b, c in d]
        out.append(spark.createDataFrame(data, f"bucket {bucket_type}, freq double"))
    return tuple(out)


def write_baseline(docs: DataFrame, path: str, lo: int = 0, hi: int = 128,
                   n_bins: int = 32, text: bool = True) -> None:
    """Freeze the current distributions as the drift baseline (one
    parquet with bucket_kind ∈ {span_kind, offset_hist, lang_freq,
    quality_hist} — FIXTURES.md §5 shape plus the text-profile rows).
    In production this runs once on a blessed snapshot."""
    kind_df, off_df = drift_profile(docs, lo, hi, n_bins)
    spark = docs.sparkSession
    rows = [("span_kind", str(r["bucket"]), float(r["freq"])) for r in kind_df.collect()]
    rows += [("offset_hist", str(r["bucket"]), float(r["freq"])) for r in off_df.collect()]
    if text:
        lang_df, q_df = text_distributions(docs, n_bins)
        rows += [("lang_freq", str(r["bucket"]), float(r["freq"])) for r in lang_df.collect()]
        rows += [("quality_hist", str(r["bucket"]), float(r["freq"])) for r in q_df.collect()]
    from ..sources.tables import tiny_table
    tiny_table(spark, rows, "bucket_kind string, bucket string, freq double") \
        .write.mode("overwrite").parquet(path)


def load_baseline(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(kind_freq, offset_hist) from a frozen baseline parquet."""
    b = spark.read.parquet(path)
    kind_df = b.filter(F.col("bucket_kind") == "span_kind").select(
        F.col("bucket"), F.col("freq")
    )
    off_df = b.filter(F.col("bucket_kind") == "offset_hist").select(
        F.col("bucket").cast("int").alias("bucket"), F.col("freq")
    )
    return kind_df, off_df


def load_text_baseline(spark, path: str) -> tuple[DataFrame, DataFrame] | None:
    """(lang_freq, quality_hist) from the baseline parquet, or None for
    baselines frozen before text drift existed (callers then skip the
    text rules rather than comparing against an empty distribution)."""
    b = spark.read.parquet(path)
    lang_df = b.filter(F.col("bucket_kind") == "lang_freq").select("bucket", "freq")
    if not lang_df.head(1):
        return None
    q_df = b.filter(F.col("bucket_kind") == "quality_hist").select(
        F.col("bucket").cast("int").alias("bucket"), F.col("freq")
    )
    return lang_df, q_df


def text_verdicts_from_profiles(lang_freq: DataFrame, quality_hist: DataFrame,
                                baseline_lang: DataFrame,
                                baseline_quality: DataFrame,
                                psi_threshold: float = 0.2,
                                ks_threshold: float = 0.1) -> list[dict]:
    """Text-profile drift verdicts — PSI over language-ID frequencies,
    KS over the quality histogram — same thresholds/shape as the span
    rules so the job gate treats them uniformly."""
    lang_psi = psi(lang_freq, baseline_lang)
    q_ks = ks_from_histograms(quality_hist, baseline_quality)
    return [
        {"rule_id": "R-DRIFT-LANG-PSI", "statistic": lang_psi,
         "threshold": psi_threshold, "pass": lang_psi <= psi_threshold},
        {"rule_id": "R-DRIFT-QUALITY-KS", "statistic": q_ks,
         "threshold": ks_threshold, "pass": q_ks <= ks_threshold},
    ]


def verdicts_from_profiles(kind_freq: DataFrame, off_hist: DataFrame,
                           baseline_kind: DataFrame, baseline_offsets: DataFrame,
                           psi_threshold: float = 0.2,
                           ks_threshold: float = 0.1) -> list[dict]:
    """Drift verdicts from already-computed current profiles — the
    single place holding the rule ids and thresholds, used both by
    drift_verdicts (separate-pass) and the fused single-scan path in
    jobs/validate.py (so the two paths can never gate differently)."""
    kind_psi = psi(kind_freq, baseline_kind)
    off_ks = ks_from_histograms(off_hist, baseline_offsets)
    return [
        {"rule_id": "R-DRIFT-KIND-PSI", "statistic": kind_psi,
         "threshold": psi_threshold, "pass": kind_psi <= psi_threshold},
        {"rule_id": "R-DRIFT-OFFSET-KS", "statistic": off_ks,
         "threshold": ks_threshold, "pass": off_ks <= ks_threshold},
    ]


def drift_verdicts(docs: DataFrame, baseline_kind: DataFrame,
                   baseline_offsets: DataFrame, lo: int, hi: int,
                   psi_threshold: float = 0.2,
                   ks_threshold: float = 0.1) -> list[dict]:
    """Run both drift rules; returns small verdict dicts for the gate.
    PSI > 0.2 is the conventional 'significant shift' line. One scan of
    the corpus (drift_profile); the PSI/KS math runs on ≤ n_bins rows."""
    kind_freq, off_hist = drift_profile(docs, lo, hi)
    return verdicts_from_profiles(kind_freq, off_hist, baseline_kind,
                                  baseline_offsets, psi_threshold, ks_threshold)
