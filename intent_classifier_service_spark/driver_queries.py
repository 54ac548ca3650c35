"""Driver-contract queries: one entry per operator family (SURVEY.md §2),
each routed through the engine's real operators, plus a DuckDB oracle
SQL string computing the same result on the same parquet tables.

The testdata has no spans column, so span-rule queries derive a spans
array **deterministically and portably** from ``documents`` — the same
arithmetic (pure mods on doc_id × word position) is expressed in both
Spark and ANSI SQL, so the engine's violation output can be checked
value-for-value against DuckDB. Injection periods mirror datagen.py.

Column-name and type discipline: every computed column is aliased
identically on both sides; doubles that aggregate more than one term
are ROUND()ed to 6 in both (FP addition order differs across engines);
single-division ratios are left exact (IEEE division is deterministic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, metrics, referential, response_validation as RV
from .operators import sampling, similarity, stats, textstats, uniqueness
from .operators.multimodal import AUDIO_DECODER as _AUDIO_DEC
from .operators.multimodal import IMAGE_DECODER as _IMAGE_DEC
from .plans import rules as R

LANGS = ["de", "en", "es", "fr", "zh"]
# single source of truth: the oracle SQL must use the SAME stopword and
# lang-marker lists the engine uses, or edits to textstats silently
# break the driver's hash gate
_SW = textstats.STOPWORDS_EN[0].split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _tw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """_t + repartition ONLY when the input arrives under-split — the
    derived_spans discipline (see its docstring) applied at the source
    for queries whose per-row compute is heavy (shingling, MinHash
    kernels, token-window explodes, PII regexes): the test tables are
    single-row-group parquet files (one input split, indivisible by
    maxPartitionBytes), so without this the whole compute stage runs
    on one core of local[32]. At 100 TB the scan has thousands of real
    splits and the branch never fires. Used selectively — for cheap
    scan-dominated queries the extra exchange costs more than the
    parallelism buys (A/B-measured per query, see OPTIMIZATION_r09.md)."""
    df = _t(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


# --------------------------------------------------------------- span deriv

def derived_spans(docs: DataFrame) -> DataFrame:
    """(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
    derived from documents(doc_id bigint, text) with deterministic
    injected violations — the portable analog of datagen.documents_spans.

    Repartitions ONLY when the input arrives under-split: the test
    documents parquet is one small file (a single input split), but the
    derived-span work downstream is wide. At 100 TB the scan has
    thousands of real splits and this branch never fires — an
    unconditional repartition there would be a full-corpus shuffle for
    nothing (round-1 verdict flag). The repartition happens BEFORE the
    span construction so the construction itself parallelizes across
    all cores (after the select it would run inside the single-split
    scan task); downstream multi-reference inlining of the derived
    array is prevented by explode_spans' let-binding, not by
    materializing here."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    words = F.split(F.col("text"), " ")
    d = F.col("doc_id")

    def span(w, i):
        il = i.cast("long")
        base_media = (d * 31 + il) % 7 == 0
        kind = (
            F.when((d * 131 + il) % 211 == 0, "tezt")
            .when(base_media, "media")
            .otherwise("text")
        )
        mutex_bad = (d * 17 + il) % 223 == 0
        text = F.when(~base_media | mutex_bad, w)
        media_ref = F.when(
            base_media | mutex_bad,
            F.format_string("media-%05d", (d * 7 + il) % 520),
        )
        offset = (
            il * 8 - F.when(((d + il) % 97 == 0) & (il > 0), 9).otherwise(0)
        ).cast("int")
        return F.struct(
            kind.alias("kind"), text.alias("text"),
            media_ref.alias("media_ref"), offset.alias("offset"),
        )

    return docs.select(
        d.cast("string").alias("doc_id"), F.transform(words, span).alias("spans")
    )


# Shared SQL CTE: the same derivation in DuckDB (exploded long form).
SPANS_CTE = """
WITH ex AS (
  SELECT doc_id,
         generate_subscripts(l, 1) - 1 AS pos,
         unnest(l) AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t
), spans AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(pos AS INTEGER) AS span_index,
         CASE WHEN (doc_id*131 + pos) % 211 = 0 THEN 'tezt'
              WHEN (doc_id*31 + pos) % 7 = 0 THEN 'media'
              ELSE 'text' END AS kind,
         CASE WHEN NOT ((doc_id*31 + pos) % 7 = 0) OR (doc_id*17 + pos) % 223 = 0
              THEN w END AS text,
         CASE WHEN ((doc_id*31 + pos) % 7 = 0) OR (doc_id*17 + pos) % 223 = 0
              THEN 'media-' || lpad(CAST((doc_id*7 + pos) % 520 AS VARCHAR), 5, '0') END AS media_ref,
         CAST(pos*8 - CASE WHEN (doc_id + pos) % 97 = 0 AND pos > 0 THEN 9 ELSE 0 END AS INTEGER) AS off,
         doc_id AS _d, pos AS _p
  FROM ex
), spans_prev AS (
  SELECT *, lag(off) OVER (PARTITION BY _d ORDER BY _p) AS prev_off
  FROM spans
)
"""


# ------------------------------------------------------------- query bodies

def q_span_kind_violations(spark, sf_dir):
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    v = R.violations(docs, R.RuleSet(doc_rules=[]))
    return v.filter(F.col("rule_id") == "R-SPAN-KIND")


SQL_SPAN_KIND = SPANS_CTE + """
SELECT doc_id, 'R-SPAN-KIND' AS rule_id, span_index,
       kind AS observed, 'kind in {text,media}' AS expected
FROM spans_prev WHERE kind NOT IN ('text', 'media')
"""


def q_span_mutex_violations(spark, sf_dir):
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    v = R.violations(docs, R.RuleSet(doc_rules=[]))
    return v.filter(F.col("rule_id") == "R-SPAN-MUTEX")


SQL_SPAN_MUTEX = SPANS_CTE + """
SELECT doc_id, 'R-SPAN-MUTEX' AS rule_id, span_index,
       'text=' || coalesce(text, '<null>') || ',media_ref=' || coalesce(media_ref, '<null>') AS observed,
       'exactly one of text/media_ref set, matching kind' AS expected
FROM spans_prev
WHERE (kind = 'text' AND (text IS NULL OR media_ref IS NOT NULL))
   OR (kind = 'media' AND (media_ref IS NULL OR text IS NOT NULL))
"""


def q_span_mono_violations(spark, sf_dir):
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    v = R.violations(docs, R.RuleSet(doc_rules=[]))
    return v.filter(F.col("rule_id") == "R-SPAN-MONO")


SQL_SPAN_MONO = SPANS_CTE + """
SELECT doc_id, 'R-SPAN-MONO' AS rule_id, span_index,
       'offset=' || off || ',prev=' || prev_off AS observed,
       'offset strictly increasing' AS expected
FROM spans_prev WHERE prev_off IS NOT NULL AND off <= prev_off
"""


def q_clean_corpus(spark, sf_dir):
    """The quarantine split applied (plans/rules.partition_valid):
    surviving doc_ids after dropping every doc with ANY span-rule
    violation — the corpus a training pipeline would actually feed
    downstream. Doc rules are vacuously clean on the derived corpus
    (non-null ids, non-empty spans) and uniqueness is trivially clean
    (ids unique), so the oracle is the NOT-IN over the three span
    rules' violating doc_ids."""
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    clean, _quar = R.partition_valid(docs, rules=R.RuleSet(doc_rules=[]),
                                     include_uniqueness=False)
    return clean.select("doc_id")


SQL_CLEAN_CORPUS = SPANS_CTE + """
SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents
WHERE CAST(doc_id AS VARCHAR) NOT IN (
  SELECT doc_id FROM spans_prev
  WHERE kind NOT IN ('text', 'media')
     OR (kind = 'text' AND (text IS NULL OR media_ref IS NOT NULL))
     OR (kind = 'media' AND (media_ref IS NULL OR text IS NOT NULL))
     OR (prev_off IS NOT NULL AND off <= prev_off)
)
"""


def q_span_rule_verdicts(spark, sf_dir):
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    vd = R.verdicts(docs, R.RuleSet(doc_rules=[]))
    return vd.select(
        "rule_id", "n_checked", "n_violations",
        F.round("violation_rate", 6).alias("violation_rate"), "pass",
    )


SQL_SPAN_VERDICTS = SPANS_CTE + """
SELECT rule_id, n_checked, CAST(n_violations AS BIGINT) AS n_violations,
       round(CAST(n_violations AS DOUBLE) / n_checked, 6) AS violation_rate,
       (CAST(n_violations AS DOUBLE) / n_checked) <= 0.05 AS pass
FROM (
  SELECT 'R-SPAN-KIND' AS rule_id, count(*) AS n_checked,
         sum(CASE WHEN kind NOT IN ('text','media') THEN 1 ELSE 0 END) AS n_violations
  FROM spans_prev
  UNION ALL
  SELECT 'R-SPAN-MUTEX', count(*),
         sum(CASE WHEN (kind='text' AND (text IS NULL OR media_ref IS NOT NULL))
                    OR (kind='media' AND (media_ref IS NULL OR text IS NOT NULL))
                  THEN 1 ELSE 0 END)
  FROM spans_prev
  UNION ALL
  SELECT 'R-SPAN-MONO', count(*),
         sum(CASE WHEN prev_off IS NOT NULL AND off <= prev_off THEN 1 ELSE 0 END)
  FROM spans_prev
)
"""


def q_uniqueness_lineitem_orderkey(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "doc_id")
    return uniqueness.duplicate_doc_ids(li).withColumnRenamed("doc_id", "l_orderkey")


SQL_UNIQUENESS = """
SELECT l_orderkey, count(*) AS n_occurrences
FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
"""


def q_referential_unknown_event_types(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame([("click",), ("view",), ("purchase",)], "event_type string")
    return ev.select("event_type").distinct().join(F.broadcast(dim), "event_type", "left_anti")


SQL_REF_EVENT_TYPES = """
SELECT DISTINCT event_type FROM events
WHERE event_type NOT IN ('click', 'view', 'purchase')
"""


def q_referential_media_refs(spark, sf_dir):
    """Dangling media_refs from the derived spans vs the 500-ref dim —
    the engine's broadcast left_anti path on real span data."""
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    dim = spark.range(500).select(
        F.format_string("media-%05d", F.col("id")).alias("media_ref")
    )
    return referential.referential_violations(docs, dim)


SQL_REF_MEDIA = SPANS_CTE + """
SELECT doc_id, 'R-REF-MEDIA' AS rule_id, span_index,
       media_ref AS observed, 'media_ref in valid_media_refs' AS expected
FROM spans_prev
WHERE media_ref IS NOT NULL
  AND CAST(substr(media_ref, 7) AS INTEGER) >= 500
"""


def q_referential_media_refs_large_dim(spark, sf_dir):
    """Same dangling-ref rows via the large-dim plan (distinct-refs
    shuffle anti-join + broadcast-back of the dangling set; the fact
    side never shuffles, the dim is never broadcast in full). Identical
    oracle to referential_media_refs — only the physical plan differs."""
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    dim = spark.range(500).select(
        F.format_string("media-%05d", F.col("id")).alias("media_ref")
    )
    return referential.referential_violations_large_dim(docs, dim)


def q_column_stats_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return stats.column_stats(
        o, ["o_totalprice", "o_orderpriority"], by=("o_orderstatus",),
        exact_distinct=True,
    ).select(
        "o_orderstatus", "column", "n_rows",
        F.round("null_rate", 6).alias("null_rate"),
        "min_value", "max_value", "approx_distinct",
    )


SQL_COLUMN_STATS = """
SELECT o_orderstatus, col AS "column", n_rows, null_rate, min_value, max_value, approx_distinct
FROM (
  SELECT o_orderstatus, 'o_totalprice' AS col, count(*) AS n_rows,
         round(CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*), 6) AS null_rate,
         CAST(min(o_totalprice) AS VARCHAR) AS min_value,
         CAST(max(o_totalprice) AS VARCHAR) AS max_value,
         count(DISTINCT o_totalprice) AS approx_distinct
  FROM orders GROUP BY o_orderstatus
  UNION ALL
  SELECT o_orderstatus, 'o_orderpriority', count(*),
         round(CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*), 6),
         min(o_orderpriority), max(o_orderpriority),
         count(DISTINCT o_orderpriority)
  FROM orders GROUP BY o_orderstatus
)
"""


def q_drift_psi_event_type(spark, sf_dir):
    """PSI between even/odd event_id halves of the event_type
    distribution — the drift operator's PSI math on real data."""
    ev = _t(spark, sf_dir, "events")
    cur = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy(F.col("event_type").alias("bucket")).count()
    )
    base = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy(F.col("event_type").alias("bucket")).count()
    )
    from pyspark.sql.window import Window

    def norm(df):
        tot = F.sum("count").over(Window.partitionBy())
        return df.select("bucket", (F.col("count") / tot).alias("freq"))

    joined = (
        norm(cur).withColumnRenamed("freq", "p")
        .join(norm(base).withColumnRenamed("freq", "q"), "bucket", "full_outer")
        .select(F.coalesce("p", F.lit(0.0)).alias("p"), F.coalesce("q", F.lit(0.0)).alias("q"))
    )
    eps = 1e-6
    return joined.agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log((F.col("p") + eps) / (F.col("q") + eps))),
            6,
        ).alias("psi")
    )


SQL_DRIFT_PSI = """
WITH cur AS (
  SELECT event_type AS bucket, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p
  FROM events WHERE event_id % 2 = 0 GROUP BY event_type
), base AS (
  SELECT event_type AS bucket, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS q
  FROM events WHERE event_id % 2 = 1 GROUP BY event_type
)
SELECT round(sum((coalesce(p,0) - coalesce(q,0)) * ln((coalesce(p,0) + 1e-6) / (coalesce(q,0) + 1e-6))), 6) AS psi
FROM cur FULL OUTER JOIN base USING (bucket)
"""


def q_windowed_drift_psi(spark, sf_dir):
    """Batch-window equivalent of the STREAMING drift gate (round-4
    verdict #7): per 1-day event-time window of events.ts, PSI of the
    event_type distribution vs the frozen whole-table baseline. Runs
    the exact fold expression the stream runs (drift.psi_vs_frozen —
    absent-bucket mass included) composed with F.window, so the
    window+PSI composition gets an oracle row even though the stream
    itself cannot. Window starts projected as strings (timestamp
    dtype-parity rule); psi rounds to 6 on both sides."""
    from pyspark.sql.window import Window as W

    from .operators import drift

    ev = _t(spark, sf_dir, "events")
    base = ev.groupBy(F.col("event_type").alias("bucket")).count().select(
        "bucket",
        (F.col("count") / F.sum("count").over(W.partitionBy())).alias("freq"),
    )
    out = drift.windowed_psi(ev, "ts", "event_type", base, window="1 day")
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd").alias("win_start"),
        F.col("n_total").cast("long").alias("n_events"),
        F.round("psi", 6).alias("psi"),
        "pass",
    )


SQL_WINDOWED_DRIFT_PSI = """
WITH b AS (
  SELECT event_type AS bucket,
         CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS q
  FROM events GROUP BY event_type
), w AS (
  SELECT date_trunc('day', ts) AS win, event_type AS bucket, count(*) AS n
  FROM events GROUP BY 1, 2
), wt AS (
  SELECT win, CAST(sum(n) AS BIGINT) AS n_events FROM w GROUP BY win
), present AS (
  SELECT w.win,
         sum((CAST(w.n AS DOUBLE) / wt.n_events - b.q)
             * ln((CAST(w.n AS DOUBLE) / wt.n_events + 1e-6) / (b.q + 1e-6))) AS p_term
  FROM w JOIN wt USING (win) JOIN b USING (bucket)
  GROUP BY w.win
), absent AS (
  SELECT wt.win,
         sum(-b.q * ln(1e-6 / (b.q + 1e-6))) AS a_term
  FROM wt CROSS JOIN b
  LEFT JOIN w ON w.win = wt.win AND w.bucket = b.bucket
  WHERE w.bucket IS NULL
  GROUP BY wt.win
)
SELECT strftime(wt.win, '%Y-%m-%d') AS win_start,
       wt.n_events,
       round(p.p_term + coalesce(a.a_term, 0.0), 6) AS psi,
       (p.p_term + coalesce(a.a_term, 0.0)) <= 0.2 AS pass
FROM wt
JOIN present p USING (win)
LEFT JOIN absent a USING (win)
"""


def q_dedup_earliest_window(spark, sf_dir):
    """Earliest-wins windowed dedup: the first event per (user_id,
    1-day event-time window) with deterministic full-row tie-break —
    the EXACT expression dedup_stream_earliest runs on a watermarked
    stream (operators/dedup.earliest_per_window: one shuffle,
    min(struct) with map-side partial), so the streaming operator's
    survivor semantics get an oracle row even though the stream itself
    cannot. Timestamps projected as microsecond strings and the window
    start as a date string (dtype-parity rules)."""
    from .operators import dedup

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    out = dedup.earliest_per_window(ev, "ts", ["user_id"], "1 day")
    return out.select(
        F.date_format("_win.start", "yyyy-MM-dd").alias("win_start"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
    )


SQL_DEDUP_EARLIEST_WINDOW = """
WITH r AS (
  SELECT date_trunc('day', ts) AS win, user_id, ts, event_id, event_type,
         value,
         row_number() OVER (PARTITION BY date_trunc('day', ts), user_id
                            ORDER BY ts, event_id NULLS FIRST,
                                     event_type NULLS FIRST,
                                     value NULLS FIRST) AS rn
  FROM events WHERE ts IS NOT NULL
)
SELECT strftime(win, '%Y-%m-%d') AS win_start,
       user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       event_id, event_type, round(value, 6) AS value
FROM r WHERE rn = 1
"""


def q_eval_per_class_prf(spark, sf_dir):
    df = _eval_frame(spark, sf_dir)
    return metrics.per_class_prf(metrics.per_class_counts(df)).select(
        "class", "tp", "fp", "fn", "tn", "support",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


def _eval_frame(spark, sf_dir):
    """actual = [lang]; predicted = 3 langs derived from doc_id mods —
    portable multi-label eval input."""
    docs = _t(spark, sf_dir, "documents")
    langs = F.array(*[F.lit(s) for s in LANGS])
    d = F.col("doc_id")
    pred = F.array(
        F.element_at(langs, (d % 5 + 1).cast("int")),
        F.element_at(langs, ((d + 1) % 5 + 1).cast("int")),
        F.element_at(langs, ((d + 2) % 5 + 1).cast("int")),
    )
    return docs.select(
        d.cast("string").alias("id"),
        F.array(F.col("lang")).alias("actual"),
        pred.alias("predicted"),
    )


_EVAL_CTE = """
WITH langs(idx, lang) AS (VALUES (0,'de'),(1,'en'),(2,'es'),(3,'fr'),(4,'zh')),
ev AS (
  SELECT d.doc_id, d.lang AS actual,
         l1.lang AS p1, l2.lang AS p2, l3.lang AS p3
  FROM documents d
  JOIN langs l1 ON l1.idx = d.doc_id % 5
  JOIN langs l2 ON l2.idx = (d.doc_id + 1) % 5
  JOIN langs l3 ON l3.idx = (d.doc_id + 2) % 5
)
"""

SQL_EVAL_PRF = _EVAL_CTE + """
, counts AS (
  SELECT c.lang AS class,
         sum(CASE WHEN ev.actual = c.lang AND c.lang IN (ev.p1, ev.p2, ev.p3) THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN ev.actual <> c.lang AND c.lang IN (ev.p1, ev.p2, ev.p3) THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN ev.actual = c.lang AND c.lang NOT IN (ev.p1, ev.p2, ev.p3) THEN 1 ELSE 0 END) AS fn,
         sum(CASE WHEN ev.actual = c.lang THEN 1 ELSE 0 END) AS support,
         count(*) AS n_rows
  FROM langs c CROSS JOIN ev GROUP BY c.lang
)
SELECT class, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(n_rows - tp - fp - fn AS BIGINT) AS tn,
       CAST(support AS BIGINT) AS support,
       round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0 END, 6) AS precision,
       round(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0 END, 6) AS recall,
       round(CASE WHEN (CASE WHEN tp+fp>0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0 END)
                     + (CASE WHEN tp+fn>0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0 END) > 0
             THEN 2 * (CASE WHEN tp+fp>0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0 END)
                    * (CASE WHEN tp+fn>0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0 END)
                  / ((CASE WHEN tp+fp>0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0 END)
                   + (CASE WHEN tp+fn>0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0 END))
             ELSE 0 END, 6) AS f1
FROM counts
"""


def q_eval_subset_accuracy(spark, sf_dir):
    return metrics.subset_accuracy(_eval_frame(spark, sf_dir)).select(
        F.round("subset_accuracy", 6).alias("subset_accuracy")
    )


SQL_EVAL_ACC = _EVAL_CTE + """
SELECT round(avg(CASE WHEN actual IN (p1, p2, p3) THEN 1.0 ELSE 0.0 END), 6) AS subset_accuracy
FROM ev
"""


def q_eval_cooccurrence(spark, sf_dir):
    return metrics.cooccurrence_matrix(_eval_frame(spark, sf_dir))


SQL_EVAL_COOC = _EVAL_CTE + """
SELECT actual AS actual_class, p AS predicted_class, count(*) AS n
FROM (
  SELECT actual, p1 AS p FROM ev
  UNION ALL SELECT actual, p2 FROM ev
  UNION ALL SELECT actual, p3 FROM ev
)
GROUP BY actual, p
"""


def q_response_validation(spark, sf_dir):
    """Portable raw responses from doc_id mods: mostly valid '[i, j, k]'
    over labels 0..16, every 13th malformed — the reference's response
    validator (regex + label domain) as a table-level op."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    raw = F.when(d % 13 == 2, F.lit("3, 1, 2")).otherwise(
        F.format_string("[%d, %d, %d]", (d % 17).cast("int"),
                        ((d + 7) % 17).cast("int"), ((d + 30) % 40).cast("int"))
    )
    df = docs.select(d.cast("string").alias("id"), raw.alias("raw_response"))
    from . import datagen

    out = RV.validate_responses(df, datagen.intent_labels(spark))
    return out.select("id", "shape_valid", "valid")


SQL_RESPONSE_VALIDATION = """
SELECT CAST(doc_id AS VARCHAR) AS id,
       CASE WHEN doc_id % 13 = 2 THEN FALSE ELSE TRUE END AS shape_valid,
       CASE WHEN doc_id % 13 = 2 THEN FALSE
            WHEN (doc_id + 30) % 40 > 16 THEN FALSE
            ELSE TRUE END AS valid
FROM documents
"""


def q_sample_capped_per_group(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return sampling.capped_per_group(
        ev.select("event_id", "event_type"), "event_type", 5, order_col="event_id"
    )


SQL_SAMPLE_CAPPED = """
SELECT event_id, event_type FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn <= 5
"""


def q_dense_ids_event_types(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return sampling.dense_ids(ev, "event_type", "event_id")


SQL_DENSE_IDS = """
SELECT event_type, CAST(row_number() OVER (ORDER BY first_seen, event_type) - 1 AS INTEGER) AS label
FROM (SELECT event_type, min(event_id) AS first_seen FROM events GROUP BY event_type)
"""


def q_dedup_exact_prefix(spark, sf_dir):
    """Exact-dup groups keyed on the first-2-word prefix of text (full
    texts are unique in the synthetic corpus; the prefix keys collide,
    exercising the real group/min/collect path)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 2), " ").alias("text"),
    )
    # dup_ids is joined into a scalar string: the driver's pandas
    # canonicalizer can't sort/hash a list column (round-1 harness crash)
    return dedup.exact_duplicates(docs).select(
        "n_dups", "keep_id",
        F.array_join(
            F.transform(F.col("dup_ids"), lambda x: x.cast("string")), ","
        ).alias("dup_ids"),
    )


SQL_DEDUP_PREFIX = """
SELECT count(*) AS n_dups, min(doc_id) AS keep_id,
       list_aggr(list_transform(list_sort(list(doc_id)), x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS dup_ids
FROM (
  SELECT doc_id,
         regexp_replace(lower(trim(l[1] || ' ' || l[2])), '\\s+', ' ', 'g') AS k
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
)
GROUP BY k HAVING count(*) > 1
"""


def q_similarity_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    return similarity.brute_force_topk(emb, qs, k=10).select("query_id", "vec_id", "rank")


SQL_SIMILARITY_TOPK = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 3)
SELECT query_id, vec_id, rank FROM (
  SELECT q.query_id, e.vec_id,
         CAST(row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC,
                      e.vec_id ASC
         ) AS INTEGER) AS rank
  FROM embeddings e CROSS JOIN q
) WHERE rank <= 10
"""


def q_text_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    prof = docs.select(
        "lang",
        textstats.token_count().alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return prof.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


SQL_TEXT_TOKEN_STATS = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(string_split(lower(trim(text)), ' '))) AS BIGINT) AS total_tokens,
       CAST(min(len(string_split(lower(trim(text)), ' '))) AS BIGINT) AS min_tokens,
       CAST(max(len(string_split(lower(trim(text)), ' '))) AS BIGINT) AS max_tokens,
       round(avg(CAST(length(text) AS DOUBLE)), 6) AS avg_chars
FROM documents GROUP BY lang
"""


def q_text_normalize(spark, sf_dir):
    """F3 normalization (strip + punctuation removal + ws collapse) and
    F13 stopword removal, as table transforms. Token arrays are joined
    to scalars for the driver's pandas canonicalizer."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textstats.normalize_text("text").alias("normalized"),
        F.array_join(textstats.remove_stopwords("text"), " ").alias("content_tokens"),
    )


SQL_TEXT_NORMALIZE = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(trim(text)), '[!-/:-@\\[-`{-~]', '', 'g'),
                           '\\s+', ' ', 'g')) AS normalized,
       array_to_string(
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     t -> NOT list_contains([""" + ",".join(f"'{w}'" for w in _SW) + """], t)), ' ') AS content_tokens
FROM documents
"""


def q_word_topk(spark, sf_dir):
    return textstats.word_topk(_t(spark, sf_dir, "documents"), k=20)


SQL_WORD_TOPK = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS word FROM documents)
WHERE word <> '' GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
"""


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # decimal sums are exact; the final double cast is deterministic on
        # both engines (the driver's value hash sees identical float64s)
        .select(
            "l_returnflag", "l_linestatus",
            F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
            F.round(F.col("sum_base_price").cast("double"), 2).alias("sum_base_price"),
            F.round(F.col("sum_disc_price").cast("double"), 4).alias("sum_disc_price"),
            "count_order",
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    revenue = F.sum(
        (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")
    ).alias("revenue")
    # NO forced broadcast on customer: it is a fact-scaling TPC-H table
    # (~15M rows at sf100), so a hard hint would bypass AQE's size check
    # and force a multi-GB broadcast at scale. At test SFs the optimizer
    # still picks a broadcast join on its own (size estimate under
    # autoBroadcastJoinThreshold — plan-asserted in
    # tests/test_physical_plans.py); at 100× AQE/size stats decide.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c.filter(F.col("c_mktsegment") == "BUILDING"),
              o.o_custkey == F.col("c_custkey"))
        .filter((F.col("o_orderdate") < "1995-03-15") & (F.col("l_shipdate") > "1995-03-15"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue)
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("revenue").cast("double"), 4).alias("revenue"),
        )
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(CAST(revenue_exact AS DOUBLE), 4) AS revenue
FROM (
  SELECT l_orderkey, o_orderdate,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS revenue_exact
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
  GROUP BY l_orderkey, o_orderdate
  ORDER BY revenue_exact DESC, l_orderkey ASC LIMIT 10
)
"""


def q_drift_ks_event_value(spark, sf_dir):
    """Two-sample KS between even/odd event_id halves of the value
    distribution, histogram-ECDF form (32 fixed bins over [0, 512))."""
    ev = _t(spark, sf_dir, "events")
    from .operators.drift import ks_from_histograms
    from pyspark.sql.window import Window

    def hist(df):
        bucket = F.least(F.lit(31), F.floor(F.col("value") / 16)).cast("int")
        counts = df.groupBy(bucket.alias("bucket")).count()
        tot = F.sum("count").over(Window.partitionBy())
        return counts.select("bucket", (F.col("count") / tot).alias("freq"))

    cur = hist(ev.filter(F.col("event_id") % 2 == 0))
    base = hist(ev.filter(F.col("event_id") % 2 == 1))
    ks = ks_from_histograms(cur, base)
    return spark.createDataFrame([(round(ks, 6),)], "ks double")


SQL_DRIFT_KS = """
WITH cur AS (
  SELECT least(31, CAST(floor(value / 16) AS INTEGER)) AS bucket,
         CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p
  FROM events WHERE event_id % 2 = 0 GROUP BY 1
), base AS (
  SELECT least(31, CAST(floor(value / 16) AS INTEGER)) AS bucket,
         CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS q
  FROM events WHERE event_id % 2 = 1 GROUP BY 1
), joined AS (
  SELECT bucket, coalesce(p, 0) AS p, coalesce(q, 0) AS q
  FROM cur FULL OUTER JOIN base USING (bucket)
)
SELECT round(max(abs(d)), 6) AS ks FROM (
  SELECT sum(p) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       - sum(q) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS d
  FROM joined
)
"""


def q_eval_averaged(spark, sf_dir):
    prf = metrics.per_class_prf(metrics.per_class_counts(_eval_frame(spark, sf_dir)))
    return metrics.averaged_metrics(prf).select(
        "average",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


SQL_EVAL_AVERAGED = _EVAL_CTE + """
, counts AS (
  SELECT c.lang AS class,
         sum(CASE WHEN ev.actual = c.lang AND c.lang IN (ev.p1, ev.p2, ev.p3) THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN ev.actual <> c.lang AND c.lang IN (ev.p1, ev.p2, ev.p3) THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN ev.actual = c.lang AND c.lang NOT IN (ev.p1, ev.p2, ev.p3) THEN 1 ELSE 0 END) AS fn,
         sum(CASE WHEN ev.actual = c.lang THEN 1 ELSE 0 END) AS support
  FROM langs c CROSS JOIN ev GROUP BY c.lang
), prf AS (
  SELECT class, support, tp, fp, fn,
         CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0 END AS precision,
         CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0 END AS recall
  FROM counts
), prf2 AS (
  SELECT *, CASE WHEN precision + recall > 0
                 THEN 2*precision*recall/(precision+recall) ELSE 0 END AS f1
  FROM prf
)
SELECT 'macro' AS average, round(avg(precision), 6) AS precision,
       round(avg(recall), 6) AS recall, round(avg(f1), 6) AS f1
FROM prf2
UNION ALL
SELECT 'micro',
       round(CASE WHEN sum(tp)+sum(fp) > 0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fp)) ELSE 0 END, 6),
       round(CASE WHEN sum(tp)+sum(fn) > 0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fn)) ELSE 0 END, 6),
       round(CASE WHEN (CASE WHEN sum(tp)+sum(fp)>0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fp)) ELSE 0 END)
                   + (CASE WHEN sum(tp)+sum(fn)>0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fn)) ELSE 0 END) > 0
             THEN 2 * (CASE WHEN sum(tp)+sum(fp)>0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fp)) ELSE 0 END)
                    * (CASE WHEN sum(tp)+sum(fn)>0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fn)) ELSE 0 END)
                  / ((CASE WHEN sum(tp)+sum(fp)>0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fp)) ELSE 0 END)
                   + (CASE WHEN sum(tp)+sum(fn)>0 THEN CAST(sum(tp) AS DOUBLE)/(sum(tp)+sum(fn)) ELSE 0 END))
             ELSE 0 END, 6)
FROM counts
UNION ALL
SELECT 'weighted',
       round(sum(precision * support) / sum(support), 6),
       round(sum(recall * support) / sum(support), 6),
       round(sum(f1 * support) / sum(support), 6)
FROM prf2
"""


def q_tpch_q5(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")
            ).alias("revenue")
        )
        .select("n_name", F.round(F.col("revenue").cast("double"), 4).alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_embedding_neardup_pairs(spark, sf_dir):
    """Exact cosine on explicit candidate pairs (the embedding near-dup
    verifier): consecutive vec_id pairs below 100."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    pairs = spark.range(100).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    return similarity.cosine_pairs(emb, pairs).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


SQL_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id < 100
"""


def q_crosscorpus_embedding_neardup(spark, sf_dir):
    """Cross-corpus incremental dedup, EMBEDDING modality
    (similarity.build_embedding_index / embedding_pairs_against_index —
    the vector twin of crosscorpus_neardup): the standing embeddings
    table persists once as a hyperplane-LSH band index carrying the
    vectors; the ingest batch (exact copies of vec_id<50 re-entering as
    vec_id+100000) probes it with ONE (band, bucket) equi-join + exact
    cosine verify against the STORED index vectors. Identical vectors
    share every band (recall 1 by construction) and the max cosine
    among non-identical pairs is ~0.6 ≪ 0.9, so exactly the 50 planted
    pairs fire. Oracle: exact batch×corpus cosine in DuckDB. Index
    cached per-SF keyed on the source's mtime+size."""
    import glob

    emb = _tw(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path = (f"/tmp/spark_graft_emb_idx_"
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_mtime_ns}_{st.st_size}")
    if not glob.glob(os.path.join(path, "manifest.json")):
        similarity.build_embedding_index(emb, path, dim=64)
    batch = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return similarity.embedding_pairs_against_index(
        spark, path, batch, threshold=0.9
    ).select("id_new", "id_indexed", F.round("cosine", 6).alias("cosine"))


SQL_CROSSCORPUS_EMBEDDING = """
SELECT a.vec_id + 100000 AS id_new, b.vec_id AS id_indexed,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])) >= 0.9
WHERE a.vec_id < 50
"""


def q_arrow_span_violations(spark, sf_dir):
    """The mandated Arrow/pandas-UDF rule path (mapInPandas) on the
    derived spans — must equal the union of the three span-rule
    oracles."""
    from .operators.arrow_rules import arrow_span_violations

    return arrow_span_violations(derived_spans(_t(spark, sf_dir, "documents")))


SQL_ARROW_SPAN = (
    SPANS_CTE
    + """
SELECT doc_id, 'R-SPAN-KIND' AS rule_id, span_index,
       kind AS observed, 'kind in {text,media}' AS expected
FROM spans_prev WHERE kind NOT IN ('text', 'media')
UNION ALL
SELECT doc_id, 'R-SPAN-MUTEX', span_index,
       'text=' || coalesce(text, '<null>') || ',media_ref=' || coalesce(media_ref, '<null>'),
       'exactly one of text/media_ref set, matching kind'
FROM spans_prev
WHERE (kind = 'text' AND (text IS NULL OR media_ref IS NOT NULL))
   OR (kind = 'media' AND (media_ref IS NULL OR text IS NOT NULL))
UNION ALL
SELECT doc_id, 'R-SPAN-MONO', span_index,
       'offset=' || off || ',prev=' || prev_off,
       'offset strictly increasing'
FROM spans_prev WHERE prev_off IS NOT NULL AND off <= prev_off
"""
)


def q_tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(28,4)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.round(F.coalesce(F.col("revenue").cast("double"), F.lit(0.0)), 4).alias("revenue"),
            "n_rows",
        )
    )


SQL_TPCH_Q6 = """
SELECT round(coalesce(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE), 0.0), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS → LEFT SEMI join. The testdata
    lineitem has no commit/receipt dates, so the 'late lineitem'
    predicate is l_shipdate > o_orderdate + 60 days — same plan shape
    (equi semi-join key + a non-equi residual referencing both sides).
    At scale: the orders side is date-filtered before the join; the
    semi-join never duplicates orders regardless of lineitem fan-out."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    win = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = win.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o_orderkey
      AND l.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape: fact-part join + conditional decimal aggregate
    ratio (promo revenue share of a ship-date window). Oracle parity
    per CLAUDE.md decimal rules: both sums stay exact decimal on both
    engines; only the final ratio is cast to double + round(4).

    NO forced broadcast on part: unlike nation/region, part is
    fact-scaling (~200k rows/sf → 20M rows, high-hundreds of MB at
    sf100), so a hard hint would bypass AQE's size check and force an
    executor-OOM broadcast at scale — the same hazard removed from the
    customer joins in q3/q10/q18. The optimizer still picks a
    broadcast join on its own at test SFs (plan-asserted in
    tests/test_physical_plans.py), proving the hint was redundant
    where it was safe and dangerous only where it wasn't."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1994-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1994-09-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    rev = (dec("l_extendedprice")
           * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev)
              .otherwise(F.lit(0).cast("decimal(28,4)"))).alias("promo"),
        F.sum(rev).alias("total"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


_SQL_Q14_REV = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
                "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) "
                "AS DECIMAL(28,4))")

SQL_TPCH_Q14 = f"""
SELECT round(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE), 4) AS promo_revenue_pct
FROM (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN {_SQL_Q14_REV}
             ELSE CAST(0 AS DECIMAL(28,4)) END) AS promo,
         sum({_SQL_Q14_REV}) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1994-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1994-09-01 00:00:00'
)
"""


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape: 4-table join (fact ⋈ orders ⋈ broadcast
    customer/nation dims) + grouped decimal revenue + global top-20 by
    revenue (TakeOrderedAndProject — per-partition heaps, no full
    sort). Deterministic tie-break on c_custkey so both engines cut the
    LIMIT boundary identically."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    rev = (dec("l_extendedprice")
           * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")
    # broadcast hint ONLY on nation (25 rows, bounded by geography);
    # customer scales with the fact data, so its join strategy is left
    # to the optimizer's size estimates / AQE (forced-broadcast there
    # was the round-3 verdict's scale-killer #1)
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(rev).alias("_rev")
    )
    return (
        agg.select(
            "c_custkey", "c_name",
            F.round(F.col("_rev").cast("double"), 4).alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name,
       round(CAST(sum({_SQL_Q14_REV}) AS DOUBLE), 4) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape: HAVING on an aggregate → join back into the
    fact/dim join (large-quantity orders). l_quantity values are
    integer-valued doubles, so the double sums are exact in any
    accumulation order — the one case where summing doubles is
    oracle-safe (CLAUDE.md rule caveat).

    r9 restructure (one lineitem scan instead of two): the final
    group-by key's finest column is o_orderkey and every other group
    column (c_name, c_custkey, o_totalprice) is functionally dependent
    on it through the PK joins (o_orderkey / c_custkey are unique —
    verified at every SF; same generator at any driver SF), so the
    re-aggregated sum over the joined lineitems IS the per-order sum
    the HAVING already computed. Carrying that sum through the join
    drops the second fact scan, the fact re-join and the final
    corpus-keyed aggregation exchange; exact-sum equality makes the
    values bitwise identical (strict-parity-verified at every SF)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 280)
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # customer join strategy left to the optimizer (no forced broadcast
    # on a fact-scaling table — see q_tpch_q3)
    return (
        o.join(big, "o_orderkey")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "sum_qty",
        )
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice, sum(l_quantity) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 280
)
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
"""


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join with a join-side predicate
    (customers keep their row even with zero qualifying orders) feeding
    a two-level count distribution — the engine's only outer-join
    aggregation (round-3 verdict #6). The testdata lacks o_comment, so
    the qualifying predicate is o_orderpriority <> '1-URGENT' (same
    join-side-filter shape). count(o_orderkey) skips nulls, so
    no-order customers land in the c_count=0 bucket — the semantics
    the outer join exists for."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar-aggregate subquery — each
    lineitem compares against 0.2 × the per-part average quantity —
    expressed Spark-first as an aggregate joined back on the
    correlation key (no p_container in the testdata; the brand filter
    alone plays the part-pruning role). The per-part average is
    computed AFTER the semi-restriction to the brand's parts: at scale
    that aggregates ~1/|brands| of the fact table instead of all of it,
    and it equals the correlated form exactly (the subquery only
    correlates to parts that survive the filter). l_quantity values
    are integer-valued doubles (sum exact in any order), so the
    threshold avg is deterministic; the revenue sum uses exact
    decimals with one final division."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13") \
        .select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")) \
        .drop("p_partkey")
    thresh = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    j = li.join(thresh, "l_partkey").filter(F.col("l_quantity") < F.col("qty_thresh"))
    total = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    return j.agg(
        F.round((total.cast("double") / F.lit(7.0)), 6).alias("avg_yearly")
    )


SQL_TPCH_Q17 = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
), th AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh FROM li GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM li JOIN th USING (l_partkey)
WHERE l_quantity < qty_thresh
"""


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the SAME fact table
    (round-3 verdict #6) — suppliers in one nation who were the SOLE
    late supplier of a multi-supplier finished order. 'Late' is
    l_returnflag = 'R' (the testdata has no receipt/commit dates; the
    predicate role is identical). The correlated quantifiers compile to
    per-order aggregates over distinct (order, supplier) pairs (see the
    inline derivation below), not to self-joins — never cartesian."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # r9 restructure — EXISTS/NOT-EXISTS as per-order aggregates, ONE
    # fact scan instead of three. For a late row (o, s): "another
    # supplier shipped in o" ⇔ o has ≥2 distinct suppliers (s is one of
    # them), and "no OTHER supplier was late in o" ⇔ o's late-supplier
    # set is exactly {s}. Both are per-order counts over the distinct
    # (order, supplier) pairs, and numwait's row multiplicity is the
    # per-(order, supplier) late-row count carried through as a weight.
    # Null l_orderkey/l_suppkey rows never qualified in the join form
    # (NULL fails every equi/inequality predicate) and the data has
    # none (verified every SF); the explicit filter makes the aggregate
    # form equal by construction, not by data. Replaces two semi/anti
    # joins whose build side was the FULL fact projection (a
    # corpus-sized broadcast or shuffle at 100 TB) with two cascaded
    # narrow-row aggregations; strict-parity-verified at every SF.
    g = (
        li.filter(F.col("l_orderkey").isNotNull()
                  & F.col("l_suppkey").isNotNull())
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(F.col("l_returnflag") == "R", F.lit(1)))
             .alias("_lr"))
    )
    cand = (
        g.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("_n_supp"),
            F.sum((F.col("_lr") > 0).cast("long")).alias("_n_late"),
            F.max(F.when(F.col("_lr") > 0, F.col("l_suppkey")))
            .alias("_late_sk"),
            F.sum(F.when(F.col("_lr") > 0, F.col("_lr"))).alias("_late_rows"),
        )
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
        .select("l_orderkey", F.col("_late_sk").alias("l_suppkey"),
                "_late_rows")
    )
    fo = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F") \
        .select(F.col("o_orderkey").alias("l_orderkey"))
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7") \
        .select("n_nationkey")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    base = (
        cand.join(fo, "l_orderkey", "left_semi")
        .join(s, cand.l_suppkey == s.s_suppkey)
    )
    return (
        base.groupBy("s_name")
        .agg(F.sum("_late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


SQL_TPCH_Q21 = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_7'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 shape: a derived aggregate view (per-supplier revenue)
    consumed TWICE — once joined back to the supplier dim, once reduced
    to a global max that filters the join via a 1-row broadcast
    cross-join (the Spark form of a scalar subquery). The equality
    filter compares EXACT decimal sums (never doubles — FP addition
    order differs across engines and would break a '=' filter); the
    projection casts to double only at the end."""
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (dec("l_extendedprice")
             * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
             ).cast("decimal(28,4)")
        ).alias("_rev")
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .crossJoin(F.broadcast(mx))  # 1-row scalar, broadcast rider
        .filter(F.col("_rev") == F.col("_mx"))
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("_rev").cast("double"), 4).alias("total_revenue"),
        )
    )


_SQL_Q15_REV = ("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
                "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) "
                "AS DECIMAL(28,4)))")

SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey, {_SQL_Q15_REV} AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(CAST(rev AS DOUBLE), 4) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE rev = (SELECT max(rev) FROM revenue)
"""


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape: count(DISTINCT supplier) per part attribute
    with a NOT IN exclusion subquery. The exclusion is a left_anti
    against the 'complaint' suppliers (negative balance stands in for
    the comment scan; s_suppkey is non-null, so NOT IN ≡ anti-join —
    Spark's null-aware-anti special case never triggers and the plan
    stays a hash join). part scales with the fact data → no forced
    broadcast; AQE decides."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "ECONOMY") & F.col("p_size").isin(2, 5, 11, 28, 37)
    ).select("p_partkey", "p_type", "p_size")
    bad_s = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_s.withColumnRenamed("s_suppkey", "l_suppkey"),
              "l_suppkey", "left_anti")
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'ECONOMY' AND p_size IN (2, 5, 11, 28, 37)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_type, p_size
"""


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape: a global scalar-average subquery (broadcast
    1-row rider), an anti join (customers with NO orders), and a
    derived substring grouping key (the last-2-digit 'country code' of
    c_name stands in for the phone prefix). The anti join is against
    RECENT orders (>= 1999) — in this testdata every customer has
    *some* order, so the classic no-orders-ever predicate would return
    an empty (vacuously-green) result; 'no recent orders' keeps the
    anti-join shape and leaves survivors. The average threshold is
    CAST(exact decimal sum AS DOUBLE)/count — one deterministic
    division, never an FP-accumulated avg (engine-order-dependent)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.expr("right(c_name, 2)").alias("cntrycode")
    ).filter(F.col("cntrycode").isin("01", "12", "23", "34", "45"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         / F.count(F.lit(1))).alias("_ab")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .join(o, "c_custkey", "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("totacctbal"),
        )
    )


SQL_TPCH_Q22 = """
WITH c AS (
  SELECT c_custkey, c_acctbal, right(c_name, 2) AS cntrycode
  FROM customer
  WHERE right(c_name, 2) IN ('01', '12', '23', '34', '45')
), t AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS ab
  FROM c WHERE c_acctbal > 0
)
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
FROM c, t
WHERE c_acctbal > ab
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY cntrycode
"""


def q_json_props_stats(spark, sf_dir):
    """Semi-structured projection: extract a typed field from the JSON
    ``props`` column (JVM-side get_json_object — no Python, no schema
    inference pass) and aggregate per event_type, counting extraction
    nulls the violation-row way (malformed/missing JSON degrades to a
    counted null, never a task failure). The canonical shape for
    validating event payloads at 100 TB: one scan, map-side partial
    aggregation, the JSON parse stays inside codegen."""
    ev = _t(spark, sf_dir, "events")
    # try_cast, not cast: with ANSI mode ON a plain cast THROWS on a
    # well-formed JSON whose $.k is a non-numeric string — only
    # unparseable JSON / missing keys degrade to null. try_cast makes
    # the docstring's "counted null, never a task failure" semantics
    # actually true (TRY_CAST mirrors it in the DuckDB oracle).
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.sum(k.isNull().cast("long")).alias("n_null_k"),
    )


SQL_JSON_PROPS = """
SELECT event_type, count(*) AS n,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
FROM events GROUP BY event_type
"""


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30-min) → per-session stats."""
    from .operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(ev)


SQL_SESSIONIZE = """
WITH lagged AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), breaks AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_break
  FROM lagged
), sessions AS (
  SELECT user_id, ts,
         sum(is_break) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM breaks
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events,
       CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
FROM sessions GROUP BY user_id, session_seq
"""


def q_rollup_orders(spark, sf_dir):
    """Multi-level aggregation: ROLLUP(status, priority) — subtotals +
    grand total in one pass (Catalyst expands to a single shuffle)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "n",
            F.round(F.col("total").cast("double"), 2).alias("total"),
        )
    )


SQL_ROLLUP_ORDERS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_percentiles_lineitem(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont) of quantity per returnflag."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("price_p99"),
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS p50,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
FROM lineitem GROUP BY l_returnflag
"""


def q_percentiles_hist_lineitem(spark, sf_dir):
    """The 10^12-row percentile path: exact inverse-CDF quantiles from
    a (group, value) histogram — groupBy counts (map-side partials,
    shuffle carries ~|domain| rows per group), cumulative window over
    the TINY aggregated table, Q(p) = min value with CDF ≥ p (type-1
    quantile). Complements q_percentiles_lineitem, whose interpolated
    `percentile` aggregate gathers every raw value per group — fine at
    test scale, a memory hazard at 100 TB. Valid whenever the value
    domain is bounded/discrete (l_quantity: 50 integer values); for
    continuous domains the same shape runs over fixed-width buckets
    (then the result is bucket-exact, like the drift KS)."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    h = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql.window import Window
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("l_returnflag")
    cdf = h.select(
        "l_returnflag", "l_quantity",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("tot"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(F.col("cum") >= F.lit(p) * F.col("tot"), F.col("l_quantity"))
    )
    return cdf.groupBy("l_returnflag").agg(
        pick(0.5).alias("p50"), pick(0.9).alias("p90")
    )


SQL_PERCENTILES_HIST = """
WITH h AS (
  SELECT l_returnflag, l_quantity, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), cdf AS (
  SELECT l_returnflag, l_quantity,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS tot
  FROM h
)
SELECT l_returnflag,
       min(CASE WHEN cum >= 0.5 * tot THEN l_quantity END) AS p50,
       min(CASE WHEN cum >= 0.9 * tot THEN l_quantity END) AS p90
FROM cdf GROUP BY l_returnflag
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidates on the first-8-word prefix (full
    random texts share no shingles). The hash permutations aren't SQL-
    portable, but the *result* is: identical prefixes give identical
    signatures (recall 1 by construction, est_jaccard exactly 1.0), and
    the corpus has no near-miss pairs that could clear the 0.9 estimate
    (max non-identical prefix overlap ≪ 58/64 matching minhashes) — so
    the oracle is the identical-normalized-prefix self-join. Verified
    empirically at sf0.01 and sf0.1 via tools/strict_parity.py."""
    docs = _tw(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias("text"),
    )
    return dedup.minhash_lsh_pairs(docs, threshold=0.9)


_PREFIX_PAIRS_CTE = """
WITH pref AS (
  SELECT doc_id,
         regexp_replace(lower(trim(array_to_string(string_split(text, ' ')[1:8], ' '))), '\\s+', ' ', 'g') AS k
  FROM documents
), prefix_pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.k = b.k AND a.doc_id < b.doc_id
)
"""

SQL_MINHASH_LSH = _PREFIX_PAIRS_CTE + """
SELECT id_a, id_b, CAST(1.0 AS DOUBLE) AS est_jaccard FROM prefix_pairs
"""


def q_crosscorpus_neardup(spark, sf_dir):
    """Cross-corpus INCREMENTAL dedup (round-7 verdict next-round #4):
    the standing corpus (even doc_ids, prefix corpus) is persisted ONCE
    as a banded MinHash index (dedup.build_minhash_index — the analog
    of the persisted IVF cells); this week's ingest (odd doc_ids) then
    probes it with dedup.pairs_against_index — ONE (band, bucket)
    equi-join whose streamed side is only the batch. Within-index
    (even×even) pairs are never re-emitted, and the standing corpus is
    never re-paired against itself. Oracle: identical prefixes give
    identical signatures (collide in every band, est_jaccard exactly
    1.0) and no non-identical pair clears 0.9 (the q_minhash_lsh_pairs
    argument, verified at sf0.01/sf0.1) — so the result is exactly the
    odd×even identical-prefix join. Index cached per-SF keyed on the
    source file's mtime+size (same discipline as the IVF queries)."""
    import glob

    docs = _tw(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias("text"),
    )
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path = (f"/tmp/spark_graft_mh_idx_"
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_mtime_ns}_{st.st_size}")
    if not glob.glob(os.path.join(path, "manifest.json")):
        dedup.build_minhash_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    return dedup.pairs_against_index(
        spark, path, docs.filter(F.col("doc_id") % 2 == 1), threshold=0.9)


SQL_CROSSCORPUS_NEARDUP = _PREFIX_PAIRS_CTE + """
SELECT n.doc_id AS id_new, i.doc_id AS id_indexed,
       CAST(1.0 AS DOUBLE) AS est_jaccard
FROM pref n JOIN pref i ON n.k = i.k
WHERE n.doc_id % 2 = 1 AND i.doc_id % 2 = 0
"""


def q_crosscorpus_exact(spark, sf_dir):
    """Cross-corpus EXACT dedup against a persisted digest index — the
    stage a continuous-ingest pipeline runs before the near-dup probe.
    Standing corpus (even doc_ids, prefix corpus) persists once as
    (id, digest, digest2, shard) via dedup.build_exact_index; the
    ingest batch (odd doc_ids) probes with ONE (shard, digest,
    digest2) equi-join → per duplicated batch doc the min standing id
    (exact_dedup's survivor convention) and the standing copy count.
    Oracle: the digests are xxhash64 (not SQL-portable) but equal
    normalized text ⇔ equal digests, so the exact odd×even
    equal-prefix group-by IS the result — and the string comparison
    doubles as a witness that no 128-bit digest collision fired.
    Index cached per-SF keyed on the source file's mtime+size (same
    discipline as crosscorpus_neardup)."""
    import glob

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias("text"),
    )
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path = (f"/tmp/spark_graft_ex_idx_"
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_mtime_ns}_{st.st_size}")
    if not glob.glob(os.path.join(path, "manifest.json")):
        dedup.build_exact_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    return dedup.exact_dups_against_index(
        spark, path, docs.filter(F.col("doc_id") % 2 == 1))


SQL_CROSSCORPUS_EXACT = _PREFIX_PAIRS_CTE + """
SELECT n.doc_id AS id_new,
       CAST(min(i.doc_id) AS BIGINT) AS id_indexed,
       CAST(count(DISTINCT i.doc_id) AS BIGINT) AS n_indexed_copies
FROM pref n JOIN pref i ON n.k = i.k
WHERE n.doc_id % 2 = 1 AND i.doc_id % 2 = 0
GROUP BY n.doc_id
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram-Jaccard near-dup pairs on the first-8-word prefix
    corpus (same corpus as minhash_lsh_pairs — identical prefixes give
    jaccard exactly 1.0, so the result is non-empty with planted-by-
    construction pairs). Unlike minhash, this operator's jaccard is
    EXACT (inverted-index intersection count, |A∪B| = |A|+|B|−∩), so
    the oracle replicates the whole computation value-for-value: same
    distinct word-3-gram shingles, same self-join, same arithmetic.
    The df cap never fires at this corpus size (500 docs ≪ 1000)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias("text"),
    )
    return dedup.ngram_jaccard_pairs(docs, threshold=0.8).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


SQL_NGRAM_JACCARD = """
WITH pref AS (
  SELECT doc_id, lower(trim(array_to_string(string_split(text, ' ')[1:8], ' '))) AS ptext
  FROM documents
), toks AS (
  SELECT doc_id, regexp_split_to_array(ptext, '\\s+') AS t FROM pref
), sh0 AS (
  SELECT doc_id,
         CASE WHEN len(t) - 2 <= 0 THEN [array_to_string(t, ' ')]
              ELSE list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t) - 2)])
         END AS sh
  FROM toks
), ex AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh0
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
         CAST(count(*) AS BIGINT) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
FROM pairs
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8
"""


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-pairs on the same prefix corpus. Identical prefixes
    → identical 64-bit simhash (hamming 0, found via any band); no
    non-identical pair is within hamming ≤ 1 on this corpus (verified
    empirically at sf0.01 AND sf0.1 — the closest non-identical pairs
    sit at hamming 2, so tolerance 1 keeps the oracle exact)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias("text"),
    )
    return dedup.simhash_near_pairs(docs, max_hamming=1)


SQL_SIMHASH = _PREFIX_PAIRS_CTE + """
SELECT id_a, id_b, CAST(0 AS INTEGER) AS hamming FROM prefix_pairs
"""


def q_lm_quality_scores(spark, sf_dir):
    """CCNet-style unigram-LM perplexity scoring (Wenzek et al.
    1911.00359 at unigram grain): every doc's average negative
    log-prob + perplexity under the add-1-smoothed unigram model of
    the corpus itself. The oracle replicates the whole computation —
    same counts, same smoothing scalars, and the per-doc log-prob sum
    in the SAME sorted order on both engines (FP addition order is
    the cross-engine hash-breaker); avg_nll rounds to 6 and ppl
    derives from the rounded avg on both sides."""
    docs = _tw(spark, sf_dir, "documents").select("doc_id", "text")
    return textstats.lm_doc_scores(docs)


SQL_LM_QUALITY = """
WITH tk AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(token)
  WHERE t.token <> ''
), cnt AS (
  SELECT token, count(*) AS c FROM tk GROUP BY token
), scal AS (
  SELECT CAST(sum(c) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS v
  FROM cnt
), lps AS (
  SELECT tk.doc_id,
         ln((cnt.c + CAST(1.0 AS DOUBLE)) / (scal.total + scal.v + 1)) AS lp
  FROM tk JOIN cnt USING (token), scal
), agg AS (
  SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(-list_aggregate(list_sort(list(lp)), 'sum') / count(*), 6)
           AS avg_nll
  FROM lps GROUP BY doc_id
)
SELECT id, n_tokens, avg_nll, round(exp(avg_nll), 4) AS ppl FROM agg
"""


def q_crosscorpus_simhash(spark, sf_dir):
    """Cross-corpus incremental dedup, SIMHASH modality: the standing
    corpus (even doc_ids, prefix corpus) persists once as 4×16-bit
    band rows (dedup.build_simhash_index); the ingest batch (odd
    doc_ids) probes with ONE (tbl, key) equi-join + bit_count verify
    on the stored signatures. Oracle: identical prefixes → identical
    simhash (hamming 0); no non-identical pair is within hamming ≤ 1
    on this corpus (the q_simhash_pairs argument, verified empirically
    at sf0.01 AND sf0.1) — so the result is exactly the odd×even
    identical-prefix join at hamming 0. Index cached per-SF keyed on
    the source file's mtime+size."""
    import glob

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias("text"),
    )
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path = (f"/tmp/spark_graft_sh_idx_"
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_mtime_ns}_{st.st_size}")
    if not glob.glob(os.path.join(path, "manifest.json")):
        dedup.build_simhash_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    return dedup.simhash_pairs_against_index(
        spark, path, docs.filter(F.col("doc_id") % 2 == 1), max_hamming=1)


SQL_CROSSCORPUS_SIMHASH = _PREFIX_PAIRS_CTE + """
SELECT n.doc_id AS id_new, i.doc_id AS id_indexed,
       CAST(0 AS INTEGER) AS hamming
FROM pref n JOIN pref i ON n.k = i.k
WHERE n.doc_id % 2 = 1 AND i.doc_id % 2 = 0
"""


def _neardup_pair_graph(spark, sf_dir):
    """The near-dup pair graph the cluster-resolution queries resolve:
    REAL MinHash+LSH pairs on the prefix corpus (cliques of identical
    prefixes — oracled by prefix equality, same equivalence as
    q_minhash_lsh_pairs) unioned with a planted TRANSITIVE CHAIN
    structure: edges (d, d+1) for d % 10 < 4 chain docs {10k..10k+4}
    together even though e.g. 10k and 10k+3 share no edge — exactly
    the A~B, B~C ⇒ one cluster case pair lists can't answer."""
    docs = _tw(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ").alias("text"),
    )
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.9).select("id_a", "id_b")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    chain = (
        d.filter(F.col("doc_id") % 10 < 4)
        .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
        .join(d.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
    )
    return lsh.unionByName(chain)


def q_neardup_clusters(spark, sf_dir):
    """Near-dup cluster resolution (round-3 verdict #1): connected
    components over the pair graph via hash-min label propagation
    (operators/dedup.neardup_clusters), projected as one row per
    cluster with the deterministic min-id survivor as cluster_id and
    the sorted member list. Oracle: DuckDB recursive CTE computing the
    same transitive closure over the same edge construction."""
    cl = dedup.neardup_clusters(_neardup_pair_graph(spark, sf_dir))
    return cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list("id")),
                        lambda x: x.cast("string")), ","
        ).alias("members"),
    )


_NEARDUP_GRAPH_CTE = """
WITH RECURSIVE pref AS (
  SELECT doc_id,
         regexp_replace(lower(trim(array_to_string(string_split(text, ' ')[1:8], ' '))), '\\s+', ' ', 'g') AS k
  FROM documents
), pp AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.k = b.k AND a.doc_id < b.doc_id
), chain AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 10 < 4
), edges AS (
  SELECT id_a, id_b FROM pp UNION SELECT id_a, id_b FROM chain
), sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL
  SELECT id_b, id_a FROM edges
), reach AS (
  SELECT src AS id, src AS label FROM sym
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
), comp AS (
  SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
)
"""

SQL_NEARDUP_CLUSTERS = _NEARDUP_GRAPH_CTE + """
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       list_aggr(list_transform(list_sort(list(id)), x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS members
FROM comp GROUP BY cluster_id
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (round-3 verdict #3): the 'benchmark'
    is the deterministic eval draw doc_id % 20 == 0; any corpus doc
    sharing an 8-word shingle with it is flagged (benchmark members
    self-flag — correct: a doc that IS in the eval set must leave the
    training corpus too). n=8 matches the corpus' planted identical
    prefixes, so CROSS-doc contamination fires (verified non-zero at
    sf0.01: 27 flagged of which 2 are non-benchmark docs). Oracle:
    full n-gram membership computation in DuckDB (string equality; the
    engine's xxhash64 join is collision-free at these set sizes)."""
    docs = _tw(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return dedup.contaminated_docs(docs, bench, n=8)


SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) - 7 <= 0 THEN [array_to_string(t, ' ')]
              ELSE list_distinct([array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, len(t) - 7)])
         END AS shl
  FROM toks
), ex AS (
  SELECT doc_id, unnest(shl) AS s FROM sh
), bench AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 20 = 0
)
SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_hits, min(e.s) AS sample_shingle
FROM ex e JOIN bench b ON e.s = b.s
GROUP BY e.doc_id
"""


def q_neardup_dedup(spark, sf_dir):
    """The dedup DECISION applied to the corpus: every doc survives
    except non-survivor members of near-dup clusters (one kept row —
    the min doc_id — per connected component). This is the filtered-
    corpus output a training-data pipeline feeds downstream."""
    full = _t(spark, sf_dir, "documents").select("doc_id")
    return dedup.neardup_dedup(full, _neardup_pair_graph(spark, sf_dir))


SQL_NEARDUP_DEDUP = _NEARDUP_GRAPH_CTE + """
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
"""


def q_neardup_dedup_quality(spark, sf_dir):
    """The dedup decision with the QUALITY-AWARE survivor policy
    (round-4 verdict #3): per near-dup cluster, keep the member with
    the longest text (tie-break min doc_id) instead of the naive min
    id — what a real pipeline keeps. Same pair graph as neardup_dedup,
    so the two queries differ exactly in which cluster member
    survives. Oracle: recursive-CTE components + a row_number window
    (length DESC, id ASC) marking the survivor."""
    full = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("text_len")
    )
    return dedup.neardup_dedup(
        full, _neardup_pair_graph(spark, sf_dir),
        survivor="best_score", score_col="text_len",
    ).select("doc_id")


SQL_NEARDUP_DEDUP_QUALITY = _NEARDUP_GRAPH_CTE + """
, ranked AS (
  SELECT c.id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY length(d.text) DESC, c.id ASC) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.id
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rn > 1)
"""


def q_stratified_sample(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    return sampling.stratified_sample(ev, "event_type", 100, order_col="event_id")


# Deterministic order_col ⇒ the equal-allocation + top-up is plain
# row_number() SQL: per_class = total // n_classes rows per class, then
# remaining rows (rank > per_class) by global event_id order.
SQL_STRATIFIED = """
WITH params AS (
  SELECT CAST(100 // count(DISTINCT event_type) AS BIGINT) AS per_class FROM events
), ranked AS (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
), base AS (
  SELECT event_id, event_type FROM ranked, params WHERE rn <= per_class
), base_n AS (
  SELECT count(*) AS n FROM base
), topup AS (
  SELECT event_id, event_type FROM (
    SELECT r.event_id, r.event_type,
           row_number() OVER (ORDER BY r.event_id) AS rn2
    FROM ranked r, params WHERE r.rn > params.per_class
  ), base_n
  WHERE rn2 <= 100 - base_n.n
)
SELECT event_id, event_type FROM base
UNION ALL
SELECT event_id, event_type FROM topup
"""


def _planted_ann_setup(spark, sf_dir):
    """Corpus + queries for the planted-duplicate ANN invariant (same
    construction that oracled ivf_topk_indexed): each query vector is
    an exact copy of corpus vec_id v (query_id = v+100000, also planted
    into the corpus), so its top-1 must be the duplicate PAIR {v,
    v+100000}: both share every LSH bucket / IVF cell with the query
    by construction (recall-1 for the top-1 regardless of the seeded
    candidate sets), and no other vector approaches cosine 1.0. The
    projection maps vec_id % 100000 so either member of the pair
    canonicalizes to v — the JVM can score the two union branches a
    single ULP apart (different codegen paths), which makes the
    asc-vec_id tie-break between the pair itself nondeterministic,
    while the pair-vs-rest gap (~0.6) is untouched."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    qs = [
        (int(r["vec_id"]) + 100000, [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    return corpus, qs


def q_lsh_topk(spark, sf_dir):
    """LSH ANN through the driver contract, projected to the exact
    planted-duplicate top-1 rows (see _planted_ann_setup; ranks 2..k
    are approximate-by-design — recall ≥0.8 pinned in
    tests/test_ann_recall.py). Round-3 verdict #5: this projection IS
    deterministic and SQL-checkable, so no more rows-only entry."""
    corpus, qs = _planted_ann_setup(spark, sf_dir)
    out = similarity.lsh_topk(corpus, qs, k=10)
    return out.filter(F.col("rank") == 1).select(
        "query_id", (F.col("vec_id") % 100000).alias("vec_id"), "rank"
    )


SQL_ANN_PLANTED_TOP1 = """
SELECT vec_id + 100000 AS query_id, vec_id, CAST(1 AS INTEGER) AS rank
FROM embeddings WHERE vec_id < 8
"""


def q_ivf_topk(spark, sf_dir):
    """IVF ANN through the driver contract, planted-duplicate top-1
    projection (see q_lsh_topk)."""
    corpus, qs = _planted_ann_setup(spark, sf_dir)
    out = similarity.ivf_topk(corpus, qs, k=10)
    return out.filter(F.col("rank") == 1).select(
        "query_id", (F.col("vec_id") % 100000).alias("vec_id"), "rank"
    )


def q_embedding_neardup_lsh(spark, sf_dir):
    """LSH-banded embedding near-dup with planted duplicates: vec_id<50
    re-enter the corpus as vec_id+100000 with the same vector, so the
    operator must find exactly those 50 pairs (identical vectors share
    every band bucket — recall 1 by construction; the max cosine among
    non-planted pairs is ~0.6 ≪ 0.9, so no other pair can fire). Oracle:
    exact all-pairs cosine ≥ 0.9 on the same derived corpus."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    # dim=64: TESTDATA embeddings are 64-d (skips the one-row dim probe)
    return similarity.embedding_neardup_pairs(corpus, threshold=0.9, dim=64).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


SQL_EMBEDDING_NEARDUP_LSH = """
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id < 50
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.9
"""


def q_embedding_neardup_dedup(spark, sf_dir):
    """The dedup DECISION for the EMBEDDING modality: the LSH-banded
    cosine pair graph (same planted corpus as embedding_neardup_lsh)
    resolved to connected components and collapsed to one survivor per
    cluster (min vec_id) — the same pairs → clusters → survivor chain
    neardup_dedup provides for text, over vectors. Oracle: exact
    all-pairs cosine pairs + recursive-CTE transitive closure; the
    planted duplicates are disjoint (v, v+100000) pairs, so exactly
    the 50 planted copies drop."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    pairs = similarity.embedding_neardup_pairs(corpus, threshold=0.9, dim=64)
    return dedup.neardup_dedup(
        corpus.select("vec_id"), pairs, id_col="vec_id"
    )


SQL_EMBEDDING_NEARDUP_DEDUP = """
WITH RECURSIVE corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id < 50
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.9
), sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT src AS id, src AS label FROM sym
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
), comp AS (
  SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
)
SELECT vec_id FROM corpus
WHERE vec_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
"""


# 80/10/10 with 10,000 buckets → thresholds 8000 / 9000; the portable
# Knuth multiplicative hash is shared VERBATIM with the oracles below
# (production callers use the default xxhash64 path — same machinery,
# uniform for any key distribution; pytest covers it).
_SPLIT_W = {"train": 0.8, "val": 0.1, "test": 0.1}
_SQL_SPLIT_CASE = """CASE
  WHEN ({k} * 2654435761) % 4294967296 % 10000 < 8000 THEN 'train'
  WHEN ({k} * 2654435761) % 4294967296 % 10000 < 9000 THEN 'val'
  ELSE 'test' END"""


def q_hash_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (sampling.hash_split):
    split = f(hash(doc_id)) — storage-free, stable under corpus growth
    and re-runs (contrast randomSplit's per-execution re-deal), the
    property that keeps eval contamination from creeping in across
    pipeline runs. Exact per-doc assignment oracled via the portable
    Knuth multiplicative hash."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return sampling.hash_split(docs, _SPLIT_W, portable=True)


SQL_HASH_SPLIT = f"""
SELECT doc_id, {_SQL_SPLIT_CASE.format(k='doc_id')} AS split
FROM documents
"""


def q_leakage_safe_split(spark, sf_dir):
    """Dedup-aware split (sampling.leakage_safe_split): every member of
    a near-dup CLUSTER keys on the cluster id, so a train doc's
    near-copy can never land in eval; non-candidates key on their own
    id. Uses the same resolved cluster table as neardup_clusters (the
    real minhash+chain pair graph), oracled end-to-end: recursive-CTE
    components + the same portable hash arithmetic."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    clusters = dedup.neardup_clusters(_neardup_pair_graph(spark, sf_dir))
    return sampling.leakage_safe_split(docs, clusters, _SPLIT_W,
                                       portable=True)


SQL_LEAKAGE_SAFE_SPLIT = _NEARDUP_GRAPH_CTE + f"""
SELECT d.doc_id,
       {_SQL_SPLIT_CASE.format(k='coalesce(c.cluster_id, d.doc_id)')} AS split
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


def q_text_profile(spark, sf_dir):
    """Per-document text profile, projected to the DuckDB-portable
    columns (the xxhash64 fingerprint stays pytest-covered; it has no
    DuckDB equivalent). Includes the round-4 Gopher-style intra-doc
    repetition metrics (rep_line_frac, top_2gram_mass). The engine
    counts runs of xxhash64(gram) in a sorted array (O(w log w), no
    shuffle); the oracle counts gram STRINGS — equality of the two
    additionally witnesses collision-freedom at per-doc gram counts.
    FP-accumulating ratios are rounded on both sides."""
    prof = textstats.text_profile(_t(spark, sf_dir, "documents"))
    return prof.select(
        "doc_id", "n_tokens", "n_subword", "n_chars",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality", 6).alias("quality"),
        "lang_pred",
        F.round("rep_line_frac", 6).alias("rep_line_frac"),
        F.round("top_2gram_mass", 6).alias("top_2gram_mass"),
    )


_SQL_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_SQL_NTOK = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_SQL_TOKS}) END"
_SQL_PUNCT = ("CASE WHEN length(text) > 0 THEN "
              "CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)"
              " / length(text) ELSE 0.0 END")
_SQL_SW = (
    "CASE WHEN len({toks}) > 0 THEN CAST(len(list_filter({toks}, t -> list_contains({sw}, t))) AS DOUBLE)"
    " / len({toks}) ELSE 0.0 END"
).format(toks=_SQL_TOKS, sw="[" + ",".join(f"'{w}'" for w in _SW) + "]")
_SQL_MARKER_HITS = {
    lang: "len(list_filter({toks}, t -> list_contains({arr}, t)))".format(
        toks=_SQL_TOKS, arr="[" + ",".join(f"'{w}'" for w in words) + "]"
    )
    for lang, words in textstats._MARKERS.items()
}

# lang_id is argmax over (hits, lang) struct comparison. Spark's
# array_max tie-break: max hits, then max lang string ('fr'>'es'>'en'>'de')
# — reproduced with a descending-lexicographic CASE chain. ONE
# definition shared by SQL_TEXT_PROFILE and the lang-drift oracle so
# the two can never silently diverge.
_SQL_LANG_CASE = """CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
            WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            ELSE 'de' END"""

# Gopher-repetition oracle fragments (shared with the repetition-gate
# oracle): non-empty trimmed lines; word 2-grams WITH multiplicity.
_SQL_LINES = ("list_filter(list_transform(string_split(text, chr(10)), "
              "l -> trim(l)), l -> l <> '')")
_SQL_REP_LINES = (
    "CASE WHEN len({ln}) > 0 THEN "
    "CAST(len({ln}) - len(list_distinct({ln})) AS DOUBLE) / len({ln}) "
    "ELSE 0.0 END"
).format(ln=_SQL_LINES)
_SQL_2GRAMS = (
    "CASE WHEN len({t}) < 2 THEN [] "
    "ELSE [array_to_string({t}[i:i+1], ' ') FOR i IN generate_series(1, len({t}) - 1)] "
    "END"
).format(t=_SQL_TOKS)
_SQL_TOP2_MASS = (
    "CASE WHEN len(g) > 0 THEN "
    "CAST(list_max(list_transform(list_distinct(g), "
    "x -> len(list_filter(g, y -> y = x)))) AS DOUBLE) / len(g) "
    "ELSE 0.0 END"
)

SQL_TEXT_PROFILE = f"""
SELECT doc_id, n_tokens, n_subword, n_chars, punct_ratio, stopword_ratio, quality,
       {_SQL_LANG_CASE} AS lang_pred, rep_line_frac,
       round({_SQL_TOP2_MASS}, 6) AS top_2gram_mass
FROM (
  SELECT doc_id,
         CAST({_SQL_NTOK} AS INTEGER) AS n_tokens,
         CAST(len(regexp_extract_all(lower(text), '[a-z]{{1,6}}|[0-9]|[^\\sa-z0-9]')) AS INTEGER) AS n_subword,
         CAST(length(text) AS INTEGER) AS n_chars,
         round({_SQL_PUNCT}, 6) AS punct_ratio,
         round({_SQL_SW}, 6) AS stopword_ratio,
         round(0.4 * least({_SQL_NTOK} / 20.0, 1.0)
             + 0.3 * greatest(0.0, 1.0 - 2.0 * ({_SQL_PUNCT}))
             + 0.3 * least(({_SQL_SW}) * 4.0, 1.0), 6) AS quality,
         {_SQL_MARKER_HITS['en']} AS h_en,
         {_SQL_MARKER_HITS['de']} AS h_de,
         {_SQL_MARKER_HITS['fr']} AS h_fr,
         {_SQL_MARKER_HITS['es']} AS h_es,
         round({_SQL_REP_LINES}, 6) AS rep_line_frac,
         {_SQL_2GRAMS} AS g
  FROM documents
)
"""


def _probe_media(spark, sf_dir, n=200, kind="image"):
    """Deterministic probe corpus for the multimodal operators: the
    first ``n`` distinct derived media_refs in ref order (orderBy+limit
    plans TakeOrderedAndProject — a bare limit would be nondeterministic
    and un-oracle-able), REAL decodable payloads (datagen's constant-
    color BMP / constant-amplitude WAV — the decoded features are exact
    ref arithmetic, so the oracle checks real decode VALUES), payloads
    NULLed for odd-numbered refs so the decode-error path stays
    exercised and oracled."""
    docs = derived_spans(_t(spark, sf_dir, "documents"))
    refs = (
        referential.unknown_refs(docs, spark.createDataFrame([("none",)], "media_ref string"))
        .orderBy("media_ref")
        .limit(n)
        .withColumn("doc_id", F.lit("probe"))
    )
    from . import datagen

    media = datagen.attach_media_payloads(refs, kind=kind)
    odd = F.substring("media_ref", 7, 5).cast("int") % 2 == 1
    return media.withColumn("payload", F.when(~odd, F.col("payload")))


# Probe refs in DuckDB: same distinct-ordered-limit + parity rule.
# k is the media ref number — the payload-content seed shared with
# datagen.media_payload_image/audio, so decoded feature values are
# CASE arithmetic over k.
_PROBE_CTE = SPANS_CTE + """
, probe AS (
  SELECT 'probe' AS doc_id, media_ref,
         CAST(substr(media_ref, 7) AS INTEGER) % 2 = 1 AS null_payload,
         CAST(substr(media_ref, 7) AS INTEGER) AS k
  FROM (
    SELECT DISTINCT media_ref FROM spans_prev
    WHERE media_ref IS NOT NULL AND media_ref <> 'none'
    ORDER BY media_ref LIMIT 200
  )
)
"""


def _empty_payload_only(err_col: str):
    """Decoder-INDEPENDENT error projection: the null-payload path
    short-circuits before any decoder with the fixed message
    'empty payload' (multimodal._decode_*_bytes), so equality against
    that literal is stable across stub/PIL/soundfile; decoder-specific
    failure messages (e.g. PIL on garbage bytes) project to NULL on
    both engines instead of breaking the hash gate in decoder-equipped
    deployments (round-3 ADVICE)."""
    c = F.col(err_col)
    return F.when(c == "empty payload", c).alias("empty_payload_error")


def q_multimodal_features(spark, sf_dir):
    """REAL decode values, oracled: the probe payloads are datagen's
    constant-color BMPs, decoded by the pure-numpy BMP parser
    (multimodal.decode_bmp — decoder stamp 'numpy-bmp' in ANY
    environment, since the BMP sniff outranks PIL), so mean RGB and
    dims are exact k-arithmetic the oracle recomputes in SQL. Error
    path: odd-k refs carry NULL payloads → the decoder-independent
    'empty payload' flag and the environment's fallback stamp
    (interpolated at import time)."""
    from .operators import multimodal

    return multimodal.extract_image_features(
        _probe_media(spark, sf_dir, kind="image")
    ).select(
        "doc_id", "media_ref", "mean_r", "mean_g", "mean_b",
        "width", "height", _empty_payload_only("decode_error"), "decoder",
    )


SQL_MULTIMODAL_FEATURES = _PROBE_CTE + f"""
SELECT doc_id, media_ref,
       CASE WHEN NOT null_payload THEN CAST(k % 256 AS DOUBLE) END AS mean_r,
       CASE WHEN NOT null_payload THEN CAST((3 * k + 7) % 256 AS DOUBLE) END AS mean_g,
       CASE WHEN NOT null_payload THEN CAST((5 * k + 11) % 256 AS DOUBLE) END AS mean_b,
       CASE WHEN NOT null_payload THEN CAST(4 + k % 5 AS INTEGER) END AS width,
       CASE WHEN NOT null_payload THEN CAST(3 + k % 7 AS INTEGER) END AS height,
       CASE WHEN null_payload THEN 'empty payload' END AS empty_payload_error,
       CASE WHEN null_payload THEN '{_IMAGE_DEC}' ELSE 'numpy-bmp' END AS decoder
FROM probe
"""


def q_multimodal_resize(spark, sf_dir):
    """Resize over real BMP payloads: target dims, the resized buffer's
    byte length (8*6*3 — proves a real resample ran, not a stub), the
    decode-error flag, and the per-row decoder stamp. -1 sentinels on
    the error path avoid nullable-int dtype skew between engines.
    Resized pixel CONTENT is pinned in pytest (constant-color in →
    constant-color out)."""
    from .operators import multimodal

    out = multimodal.resize_images(_probe_media(spark, sf_dir, kind="image"), 8, 6)
    return out.select(
        "doc_id", "media_ref",
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        F.coalesce(F.length("resized"), F.lit(-1)).alias("resized_len"),
        _empty_payload_only("resize_error"), "decoder",
    )


SQL_MULTIMODAL_RESIZE = _PROBE_CTE + f"""
SELECT doc_id, media_ref,
       CAST(CASE WHEN null_payload THEN -1 ELSE 8 END AS INTEGER) AS width,
       CAST(CASE WHEN null_payload THEN -1 ELSE 6 END AS INTEGER) AS height,
       CAST(CASE WHEN null_payload THEN -1 ELSE 144 END AS INTEGER) AS resized_len,
       CASE WHEN null_payload THEN 'empty payload' END AS empty_payload_error,
       CASE WHEN null_payload THEN '{_IMAGE_DEC}' ELSE 'numpy-bmp' END AS decoder
FROM probe
"""


def q_multimodal_audio(spark, sf_dir):
    """REAL audio decode values, oracled: constant-amplitude PCM-16
    WAVs decoded by the pure-numpy RIFF parser ('numpy-wav' stamp in
    any environment) — duration is the file's own length/rate, and
    rms == peak == (k%32)/32 EXACTLY (power-of-two divisor, constant
    samples: every float step is exact; see datagen.media_payload_audio),
    so the doubles compare bit-for-bit without rounding."""
    from .operators import multimodal

    return multimodal.extract_audio_features(
        _probe_media(spark, sf_dir, kind="audio")
    ).select(
        "doc_id", "media_ref", "duration_sec", "rms", "peak", "zcr",
        _empty_payload_only("decode_error"), "decoder",
    )


SQL_MULTIMODAL_AUDIO = _PROBE_CTE + f"""
SELECT doc_id, media_ref,
       CASE WHEN NOT null_payload THEN CAST(0.1 AS DOUBLE) END AS duration_sec,
       CASE WHEN NOT null_payload THEN CAST(k % 32 AS DOUBLE) / 32 END AS rms,
       CASE WHEN NOT null_payload THEN CAST(k % 32 AS DOUBLE) / 32 END AS peak,
       CASE WHEN NOT null_payload THEN CAST(0.0 AS DOUBLE) END AS zcr,
       CASE WHEN null_payload THEN 'empty payload' END AS empty_payload_error,
       CASE WHEN null_payload THEN '{_AUDIO_DEC}' ELSE 'numpy-wav' END AS decoder
FROM probe
"""


def q_frame_sample_plan(spark, sf_dir):
    """Video frame-sampling PLAN (multimodal.frame_sample_plan): expand
    per-clip frame counts into the every-Nth frame indices to decode —
    pure JVM sequence/filter, no Python. n_frames is derived
    deterministically from doc_id (the testdata has no video table);
    the decode itself stays a mapInPandas kernel seam. Indices are
    projected as a joined string (list columns crash the driver's
    pandas canonicalizer)."""
    from .operators import multimodal

    media = (
        _t(spark, sf_dir, "documents").select("doc_id")
        .filter(F.col("doc_id") < 200)
        .withColumn("n_frames", (F.col("doc_id") % 97 + 1).cast("int"))
    )
    out = multimodal.frame_sample_plan(media, every_n=10)
    return out.select(
        "doc_id", "n_frames",
        F.array_join(
            F.transform("frame_indices", lambda i: i.cast("string")), ","
        ).alias("frames"),
    )


SQL_FRAME_SAMPLE = """
SELECT doc_id, CAST(doc_id % 97 + 1 AS INTEGER) AS n_frames,
       array_to_string([CAST(i AS VARCHAR) FOR i IN generate_series(0, CAST(doc_id % 97 AS BIGINT)) IF i % 10 = 0], ',') AS frames
FROM documents WHERE doc_id < 200
"""


def q_ivf_topk_indexed(spark, sf_dir):
    """Persisted-IVF ANN through the driver contract: build the
    cell-partitioned index into a temp dir (side effect; deterministic
    given the seed), then query it with planted-duplicate queries —
    each query vector is an exact copy of corpus vec_id v (query_id =
    v+100000, also planted into the corpus), so its top-1 must be v
    itself: cosine exactly 1.0 (identical stored vector bytes), the
    query's own cell is by construction its first probe, and the
    (desc score, asc vec_id) tie-break puts v before the planted copy.
    Projected to rank-1 rows only — ranks 2..k are approximate-by-
    design (recall pinned in tests/test_similarity_extra.py); the
    top-1-finds-the-duplicate property is exact and oracled.

    The index is built into a deterministic per-SF cache path and
    reused across runs (it is a pure function of the input + seed) —
    a fresh mkdtemp per invocation would rebuild a corpus-sized index
    AND leak it in /tmp on every gate run."""
    import glob

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    qs = [
        (int(r["vec_id"]) + 100000, [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    # cache key includes the source file's mtime+size so a regenerated
    # embeddings table invalidates the cached index instead of silently
    # serving stale cells ("_reb" suffix: the round-7 lifecycle below
    # invalidates any pre-rebalance cached index)
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path = (f"/tmp/spark_graft_ivf_idx_reb_"
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_mtime_ns}_{st.st_size}")
    if not glob.glob(os.path.join(path, "manifest.json")):
        # full index LIFECYCLE (round-6 verdict #7): build → drifted
        # append that blows one cell past the skew threshold (3n
        # vectors in two 2-means-separable sub-clusters around corpus
        # vec 0) → rebalance splits the hot cell — the query below must
        # stay exact over the rebuilt cell layout. All deterministic
        # (seeded), so the cached index is a pure function of the input.
        import numpy as np

        similarity.build_ivf_index(corpus, path, n_centroids=16)
        n = corpus.count()
        base_vec = np.array(
            [float(x) for x in qs[0][1]], dtype=np.float64)
        rng = np.random.RandomState(11)
        u = rng.normal(size=base_vec.shape)
        u /= np.linalg.norm(u)
        bn = max(float(np.linalg.norm(base_vec)), 1e-12)
        drift = spark.createDataFrame(
            [(int(200000 + i),
              (base_vec + (0.35 if i % 2 == 0 else -0.35) * u * bn
               + rng.normal(scale=1e-3 * bn, size=base_vec.shape)).tolist())
             for i in range(3 * n)],
            "vec_id long, embedding array<float>",
        )
        m = similarity.append_to_ivf_index(spark, path, drift)
        if m["rebalance_recommended"]:  # deterministic at the test SFs;
            # pinned True in tests/test_similarity_extra.py
            similarity.rebalance_ivf_cells(spark, path)
    out = similarity.ivf_topk_indexed(spark, path, qs, k=10, n_probe=4)
    return out.filter(F.col("rank") == 1).select("query_id", "vec_id", "rank")


SQL_IVF_TOPK_INDEXED = """
SELECT vec_id + 100000 AS query_id, vec_id, CAST(1 AS INTEGER) AS rank
FROM embeddings WHERE vec_id < 8
"""


def q_ivf_topk_quantized(spark, sf_dir):
    """int8-quantized IVF ANN (similarity.ivf_topk_quantized): build a
    quantize=True index (cells_q8 sidecar) into a per-SF cache path,
    rank candidates on the 4x-smaller codes, rescore the shortlist
    exactly against the full-precision cells. Same planted-duplicate
    top-1 invariant as the other ANN queries: the exact rescore puts
    corpus vec v (cosine exactly 1.0, asc-id tie-break) at rank 1 —
    quantization can only affect WHICH candidates reach the rescore,
    and the true duplicate's code score ~1 always shortlists."""
    import glob

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    qs = [
        (int(r["vec_id"]) + 100000, [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path = (f"/tmp/spark_graft_ivf_idx_q8_"
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"_{st.st_mtime_ns}_{st.st_size}")
    if not glob.glob(os.path.join(path, "manifest.json")):
        similarity.build_ivf_index(corpus, path, n_centroids=16,
                                   quantize=True)
    out = similarity.ivf_topk_quantized(spark, path, qs, k=10, n_probe=4)
    return out.filter(F.col("rank") == 1).select("query_id", "vec_id", "rank")


SQL_IVF_TOPK_QUANTIZED = SQL_IVF_TOPK_INDEXED


def q_drift_psi_lang(spark, sf_dir):
    """PSI between even/odd doc_id halves of the language-ID
    distribution — the text-profile drift rule the validate job gates
    on (jobs/validate.py), exercised on real document text."""
    docs = _t(spark, sf_dir, "documents")
    prof = docs.select("doc_id", textstats.lang_id("text").alias("bucket"))
    from pyspark.sql.window import Window

    def norm(df):
        tot = F.sum("count").over(Window.partitionBy())
        return df.select("bucket", (F.col("count") / tot).alias("freq"))

    cur = norm(prof.filter(F.col("doc_id") % 2 == 0).groupBy("bucket").count())
    base = norm(prof.filter(F.col("doc_id") % 2 == 1).groupBy("bucket").count())
    joined = (
        cur.withColumnRenamed("freq", "p")
        .join(base.withColumnRenamed("freq", "q"), "bucket", "full_outer")
        .select(F.coalesce("p", F.lit(0.0)).alias("p"),
                F.coalesce("q", F.lit(0.0)).alias("q"))
    )
    eps = 1e-6
    return joined.agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log((F.col("p") + eps) / (F.col("q") + eps))),
            6,
        ).alias("psi")
    )


# per-doc language buckets — the argmax chain is the shared
# _SQL_LANG_CASE (single definition with SQL_TEXT_PROFILE).
_SQL_LANG_PROF = f"""
  SELECT doc_id,
         {_SQL_LANG_CASE} AS bucket
  FROM (
    SELECT doc_id,
           {_SQL_MARKER_HITS['en']} AS h_en,
           {_SQL_MARKER_HITS['de']} AS h_de,
           {_SQL_MARKER_HITS['fr']} AS h_fr,
           {_SQL_MARKER_HITS['es']} AS h_es
    FROM documents
  )
"""

SQL_DRIFT_PSI_LANG = f"""
WITH prof AS ({_SQL_LANG_PROF}
), cur AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p
  FROM prof WHERE doc_id % 2 = 0 GROUP BY bucket
), base AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS q
  FROM prof WHERE doc_id % 2 = 1 GROUP BY bucket
)
SELECT round(sum((coalesce(p,0) - coalesce(q,0)) * ln((coalesce(p,0) + 1e-6) / (coalesce(q,0) + 1e-6))), 6) AS psi
FROM cur FULL OUTER JOIN base USING (bucket)
"""


def q_drift_ks_quality(spark, sf_dir):
    """Two-sample KS between even/odd doc_id halves of the quality-
    score histogram (drift.quality_bucket — round-6 before bucketing so
    both engines bucket identical values)."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.drift import ks_from_histograms, quality_bucket
    from pyspark.sql.window import Window

    prof = docs.select("doc_id", quality_bucket("text", 32).alias("bucket"))

    def hist(df):
        counts = df.groupBy("bucket").count()
        tot = F.sum("count").over(Window.partitionBy())
        return counts.select("bucket", (F.col("count") / tot).alias("freq"))

    cur = hist(prof.filter(F.col("doc_id") % 2 == 0))
    base = hist(prof.filter(F.col("doc_id") % 2 == 1))
    ks = ks_from_histograms(cur, base)
    return spark.createDataFrame([(round(ks, 6),)], "ks double")


_SQL_QUALITY_R6 = (
    f"round(0.4 * least({_SQL_NTOK} / 20.0, 1.0)"
    f" + 0.3 * greatest(0.0, 1.0 - 2.0 * ({_SQL_PUNCT}))"
    f" + 0.3 * least(({_SQL_SW}) * 4.0, 1.0), 6)"
)

SQL_DRIFT_KS_QUALITY = f"""
WITH prof AS (
  SELECT doc_id,
         least(31, greatest(0, CAST(floor({_SQL_QUALITY_R6} * 32) AS INTEGER))) AS bucket
  FROM documents
), cur AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p
  FROM prof WHERE doc_id % 2 = 0 GROUP BY bucket
), base AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS q
  FROM prof WHERE doc_id % 2 = 1 GROUP BY bucket
), joined AS (
  SELECT bucket, coalesce(p, 0) AS p, coalesce(q, 0) AS q
  FROM cur FULL OUTER JOIN base USING (bucket)
)
SELECT round(max(abs(d)), 6) AS ks FROM (
  SELECT sum(p) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       - sum(q) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS d
  FROM joined
)
"""


# ---------------------------------------------------------- TPC-H suite
# completion (round 5): the 8 remaining shapes. The testdata carries no
# partsupp table and lineitem has no commit/receipt/shipmode columns, so
# q2/q9/q11/q12/q19/q20 are SHAPE-faithful adaptations (the join
# topology, subquery structure, and aggregate pattern of the official
# query over the columns that exist); q7/q8 are faithful. Decimal/year/
# count discipline per CLAUDE.md throughout.

# shared exact revenue term (identical string in every oracle)
_SQL_REV = _SQL_Q14_REV


def _dec(col):
    return F.col(col).cast("decimal(18,2)")


def _rev():
    return (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(28,4)")


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape: correlated-min subquery (cheapest offer per part)
    resolved as groupBy-min + equality join-back, then dim joins with a
    region filter and a deterministic top-10. partsupp is absent from
    the testdata, so the 'offer' relation is lineitem and the minimized
    cost is l_extendedprice — same plan shape: the min is computed
    per-part in one shuffle, the join-back is an equi-join on
    (partkey, price), and only nation/region (true fixed-size dims) are
    broadcast. Equality on the double price is engine-safe: both sides
    compare the same untransformed parquet values."""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    ).join(p, F.col("l_partkey") == F.col("p_partkey")).drop("p_partkey")
    minp = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    # explicit aliases: minp derives from li, so the join-back is a
    # self-join Spark can't disambiguate from bare column refs
    winners = li.alias("l").join(
        minp.alias("m"),
        (F.col("l.l_partkey") == F.col("m.l_partkey"))
        & (F.col("l.l_extendedprice") == F.col("m.min_price")),
    ).select(F.col("l.l_partkey").alias("p_partkey"),
             F.col("l.l_suppkey").alias("l_suppkey")).distinct()
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        winners.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                 F.asc("p_partkey"))
        .limit(10)
    )


SQL_TPCH_Q2 = """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey
FROM part JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 10
"""


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (faithful): volume shipping between two nations — the
    supplier-nation × customer-nation disjunctive pair filter, a year
    extraction grouping key, and the exact-decimal revenue sum. The two
    nation dims are genuinely fixed-size (25 rows) → broadcast is
    correct at any scale; all fact-fact joins hash-shuffle on their
    keys."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
             "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    n_s = n.select(F.col("n_nationkey").alias("s_nk"),
                   F.col("n_name").alias("supp_nation"))
    n_c = n.select(F.col("n_nationkey").alias("c_nk"),
                   F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).alias("revenue"))
        .select("supp_nation", "cust_nation", "l_year",
                F.round(F.col("revenue").cast("double"), 4).alias("revenue"))
    )


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (faithful): national market share — ratio of two
    conditional exact-decimal sums per order-year over a 7-table join
    (customer's nation → region filter, supplier's nation → the share
    numerator). Only the final ratio is a double division (one op,
    deterministic); both sums stay exact decimal on both engines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD") \
        .select("p_partkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_c = n.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    n_s = n.select(F.col("n_nationkey").alias("s_nk"),
                   F.col("n_name").alias("supp_nation"))
    vol = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .select(F.year("o_orderdate").alias("o_year"),
                _rev().alias("volume"), "supp_nation")
    )
    agg = vol.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume"))
              .otherwise(F.lit(0).cast("decimal(28,4)"))).alias("nat"),
        F.sum("volume").alias("tot"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("nat").cast("double") / F.col("tot").cast("double"),
                6).alias("mkt_share"),
    )


SQL_TPCH_Q8 = f"""
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         {_SQL_REV} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                      ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM vol GROUP BY o_year
"""


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape: product-profit per (nation, order-year) over a
    part-name LIKE filter. partsupp is absent, so the unit cost term is
    p_retailprice × l_quantity (same join topology and exact-decimal
    sum-of-differences; ps_supplycost would slot into the identical
    expression). The LIKE filter prunes part BEFORE the join — at 100 TB
    the fact join only sees matching parts."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")) \
        .select("p_partkey", "p_retailprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _rev() - (
        _dec("p_retailprice") * _dec("l_quantity")
    ).cast("decimal(28,4)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).alias("sum_profit"))
        .select("nation", "o_year",
                F.round(F.col("sum_profit").cast("double"), 4)
                .alias("sum_profit"))
    )


SQL_TPCH_Q9 = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       round(CAST(sum({_SQL_REV}
                 - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))
             ) AS DOUBLE), 4) AS sum_profit
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape: grouped value per key filtered by a GLOBAL
    threshold (HAVING value > fraction × grand total) — the scalar
    subquery rides as a broadcast 1-row crossJoin (the q15/q22
    pattern). partsupp is absent: value = sum(l_extendedprice) per
    part over one region's suppliers. The threshold comparison is
    exact-decimal on both engines (v×1000 > t — integer scaling, never
    a decimal×decimal precision-overflow round)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3) \
        .select("n_nationkey")
    val = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("v"))
    )
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("v") * 1000 > F.col("t"))
        .orderBy(F.desc("v"), F.asc("l_partkey"))
        .limit(20)
        .select("l_partkey",
                F.round(F.col("v").cast("double"), 2).alias("value"))
    )


SQL_TPCH_Q11 = """
WITH val AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 3
  GROUP BY l_partkey
), tot AS (SELECT sum(v) AS t FROM val)
SELECT l_partkey, round(CAST(v AS DOUBLE), 2) AS value
FROM val, tot WHERE v * 1000 > t
ORDER BY v DESC, l_partkey LIMIT 20
"""


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape: fact join + per-category conditional priority
    counts. lineitem has no shipmode/commit/receipt columns, so the
    category is l_linestatus and 'late' is l_shipdate > o_orderdate +
    30 days (the q4 stand-in) — identical plan: one equi-join with a
    non-equi residual, one hash aggregate with two CASE sums."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, (F.col("l_orderkey") == F.col("o_orderkey"))
                & (F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (faithful minus the absent p_container → p_size):
    disjunctive OR-of-ANDs predicate referencing BOTH join sides —
    Catalyst extracts the common l_partkey = p_partkey equi-key and
    keeps the disjunction as a post-join filter (never a cartesian),
    and pushes the per-side common disjuncts (p_brand/p_size,
    l_quantity bounds) down to the scans."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 35)
           & qty.between(20, 30))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
        .select(F.round(F.col("revenue").cast("double"), 4).alias("revenue"),
                "n_rows")
    )


SQL_TPCH_Q19 = f"""
SELECT round(CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape: nested semi-join chain — suppliers whose shipped
    quantity of name-filtered parts exceeds a threshold (partsupp's
    availqty comparison becomes a HAVING over the shipped total; same
    structure: inner IN-subquery on part, grouped aggregate threshold,
    outer semi-join to supplier). The quantity sum is cast to exact
    decimal so the threshold boundary is engine-deterministic."""
    parts = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(2000).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                             "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


SQL_TPCH_Q20 = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(2000 AS DECIMAL(18,2))
)
"""


# ------------------------------------------------- round-5 pipeline ops

def q_pii_scrub(spark, sf_dir):
    """PII redaction over documents (textstats.pii_scrub): the corpus
    text carries no PII by construction, so email/URL/phone tokens are
    injected deterministically from doc_id — the SAME injection
    arithmetic runs on both engines (the derived_spans technique), so
    the scrubbed text and counts hash-compare value-for-value. Returns
    only the docs that had PII (the violation-row convention)."""
    docs = _tw(spark, sf_dir, "documents")
    d = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(d % 13 == 0,
               F.concat(F.lit(" user"), d.cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(d % 17 == 0,
               F.concat(F.lit(" http://host-"), d.cast("string"),
                        F.lit(".example.org/p"))).otherwise(F.lit("")),
        F.when(d % 19 == 0,
               F.concat(F.lit(" +1-555-"),
                        F.lpad((d % 10000).cast("string"), 4, "0"))
               ).otherwise(F.lit("")),
        # case-MIXED PII — exercises the [A-Za-z] case-fold classes
        F.when(d % 23 == 0,
               F.concat(F.lit(" John.Doe"), d.cast("string"),
                        F.lit("@Example.COM"))).otherwise(F.lit("")),
        F.when(d % 29 == 0,
               F.concat(F.lit(" HTTPS://Host-"), d.cast("string"),
                        F.lit(".Example.ORG/Q"))).otherwise(F.lit("")),
    )
    scrubbed = textstats.pii_scrub(
        docs.select("doc_id", injected.alias("text")))
    return scrubbed.filter(
        (F.col("n_emails") + F.col("n_urls") + F.col("n_phones")) > 0
    ).select("doc_id", "n_emails", "n_urls", "n_phones",
             F.col("text").alias("text_scrubbed"))


SQL_PII_SCRUB = f"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 13 = 0
                 THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN ' http://host-' || CAST(doc_id AS VARCHAR) || '.example.org/p'
                 ELSE '' END
         || CASE WHEN doc_id % 19 = 0
                 THEN ' +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 23 = 0
                 THEN ' John.Doe' || CAST(doc_id AS VARCHAR) || '@Example.COM'
                 ELSE '' END
         || CASE WHEN doc_id % 29 = 0
                 THEN ' HTTPS://Host-' || CAST(doc_id AS VARCHAR) || '.Example.ORG/Q'
                 ELSE '' END AS text
  FROM documents
), scrubbed AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{textstats.PII_EMAIL_RE}')) AS INTEGER) AS n_emails,
         CAST(len(regexp_extract_all(text, '{textstats.PII_URL_RE}')) AS INTEGER) AS n_urls,
         CAST(len(regexp_extract_all(text, '{textstats.PII_PHONE_RE}')) AS INTEGER) AS n_phones,
         regexp_replace(regexp_replace(regexp_replace(text,
             '{textstats.PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{textstats.PII_URL_RE}', '<URL>', 'g'),
             '{textstats.PII_PHONE_RE}', '<PHONE>', 'g') AS text_scrubbed
  FROM injected
)
SELECT doc_id, n_emails, n_urls, n_phones, text_scrubbed
FROM scrubbed WHERE n_emails + n_urls + n_phones > 0
"""


def q_embedding_stats(spark, sf_dir):
    """Embedding-column validation (stats.embedding_stats): nulls,
    dimensionality bounds, non-finite elements, L2-norm bounds — the
    column-stats operator family extended to array<float>. Norms are
    rounded per-row before min/max so the reduction is FP-order-free."""
    return stats.embedding_stats(_t(spark, sf_dir, "embeddings"))


SQL_EMBEDDING_STATS = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_vec,
       CAST(min(len(embedding)) AS INTEGER) AS min_dim,
       CAST(max(len(embedding)) AS INTEGER) AS max_dim,
       CAST(sum(CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                x -> x IS NULL OR isnan(x) OR isinf(x))) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
       min(round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                x -> x * x))), 6)) AS min_norm,
       max(round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                x -> x * x))), 6)) AS max_norm
FROM embeddings
"""


# ------------------------------------------------- round-6 pipeline ops

def q_pack_conservation(spark, sf_dir):
    """Document packing (operators/packing.pack_greedy): greedy
    fixed-token-budget sequence assembly, projected to the per-doc
    conservation view — (doc_id, packed): every doc with
    token_count <= 64 must appear in EXACTLY one packed sequence
    (exploded assignments; a doc packed twice or dropped breaks the
    row-count/hash match), every larger doc must surface in the
    overflow frame. The sequence CONTENTS (greedy bin composition) are
    not SQL-expressible — capacity/fill/determinism invariants are
    pinned in tests/test_packing.py."""
    from .operators import packing

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", textstats.token_count(F.col("text")).alias("n_tokens")
    )
    packed, overflow = packing.pack_greedy(docs, 64)
    assigned = packing.pack_assignments(packed).select(
        "doc_id", F.lit(True).alias("packed"))
    return assigned.unionByName(
        overflow.select("doc_id", F.lit(False).alias("packed")))


# mirrors textstats.token_count (defined with the text-stats SQL twins
# below; string inlined here because _SQL_NTOK is defined later in the
# module)
_SQL_NTOK_INLINE = """(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END)"""

SQL_PACK_CONSERVATION = f"""
SELECT doc_id,
       {_SQL_NTOK_INLINE} <= 64 AS packed
FROM documents
WHERE text IS NOT NULL
"""


def q_corpus_token_budget(spark, sf_dir):
    """Corpus accounting: docs, whitespace-token, and estimated SUBWORD
    token totals per (lang, split) — the 'how many training tokens do
    we have, and where' rollup a pretraining run starts from, composing
    the deterministic hash split with both token counters (training
    budgets are stated in subword tokens, not whitespace words —
    textstats.subword_estimate, the same BPE-ish piece counter
    text_profile pins). One scan, one map-side-combinable groupBy; at
    100 TB this is the cheapest query in the engine (two narrow
    columns + two ints per row)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        textstats.token_count(F.col("text")).alias("_ntok"),
        textstats.subword_estimate("text").alias("_nsub"),
    )
    split = sampling.hash_split(docs, _SPLIT_W, portable=True)
    return split.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ntok").alias("total_tokens"),
        F.sum("_nsub").alias("est_subword_tokens"),
    )


SQL_CORPUS_TOKEN_BUDGET = f"""
SELECT lang, {_SQL_SPLIT_CASE.format(k='doc_id')} AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum({_SQL_NTOK_INLINE}) AS BIGINT) AS total_tokens,
       CAST(sum(len(regexp_extract_all(lower(text),
            '[a-z]{{1,6}}|[0-9]|[^\\sa-z0-9]'))) AS BIGINT) AS est_subword_tokens
FROM documents
GROUP BY 1, 2
"""


_MIX_W = {"en": 0.5, "de": 0.2, "fr": 0.2, "zh": 0.1}


def q_mixture_sample(spark, sf_dir):
    """Target-mixture sampling (sampling.mixture_sample, hash path):
    per-lang quota floor(total * w), selected as the quota-smallest
    rows per lang by (Knuth-hash bucket of doc_id, doc_id) — resolved
    scalably via the two-phase histogram + boundary-bucket top-up, but
    semantically a plain window the oracle can state verbatim. No
    cross-group top-up (substituting mass across sources silently
    changes the mixture — the bug the operator exists to prevent);
    'es' carries no weight → excluded entirely."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.mixture_sample(docs, "lang", _MIX_W, total=300,
                                   order_col="doc_id", portable=True)


SQL_MIXTURE_SAMPLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
             ORDER BY (doc_id * 2654435761) % 4294967296 % 4096, doc_id) AS rn,
         CASE lang WHEN 'en' THEN 150 WHEN 'de' THEN 60
                   WHEN 'fr' THEN 60 WHEN 'zh' THEN 30 END AS quota
  FROM documents
) WHERE quota IS NOT NULL AND rn <= quota
"""

# ---- round-7 pipeline ops: overflow chunking + token-grain mixture ----

def q_split_overflow_chunks(spark, sf_dir):
    """Overflow chunking (packing.split_overflow): docs whose token
    count exceeds the 32-token budget — pack_greedy's overflow frame —
    explode into ceil(n/32) chunks of exactly 32 tokens plus a
    remainder tail, keyed (doc_id, chunk_index). The explicit version
    of dataloader truncation; chunk rows feed back into pack_greedy.
    Pure stateless projection (zero shuffle, plan-gated)."""
    from .operators import packing

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", textstats.token_count(F.col("text")).alias("n_tokens")
    )
    _, overflow = packing.pack_greedy(docs, 32)
    return packing.split_overflow(overflow, 32)


# DuckDB's unnest expands in the select list; the outer select derives
# chunk_tokens from (ntok, chunk_index)
SQL_SPLIT_OVERFLOW_CHUNKS = f"""
WITH meta AS (
  SELECT doc_id, CAST({_SQL_NTOK_INLINE} AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL
), overflow AS (
  SELECT doc_id, ntok FROM meta WHERE ntok > 32
), exploded AS (
  SELECT doc_id, ntok,
         CAST(unnest(range(CAST(ceil(ntok / 32.0) AS BIGINT))) AS INTEGER)
           AS chunk_index
  FROM overflow
)
SELECT doc_id, chunk_index,
       CAST(least(32, ntok - chunk_index * 32) AS BIGINT) AS chunk_tokens
FROM exploded
"""


_MIXTOK_TOTAL = 20_000
_MIXTOK_QUOTAS = {g: int(_MIXTOK_TOTAL * w / sum(_MIX_W.values()))
                  for g, w in _MIX_W.items()}


def q_mixture_sample_tokens(spark, sf_dir):
    """Token-grain mixture sampling (sampling.mixture_sample_tokens):
    per-lang token quota floor(20000 · w), greedy prefix in (Knuth-hash
    bucket, doc_id) order until the quota is crossed — resolved via the
    two-phase SUM-histogram path, semantically the declarative
    'running-sum-before < quota' window the oracle states."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        textstats.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return sampling.mixture_sample_tokens(
        docs, "lang", _MIX_W, total_tokens=_MIXTOK_TOTAL,
        order_col="doc_id", portable=True)


SQL_MIXTURE_SAMPLE_TOKENS = f"""
WITH d AS (
  SELECT doc_id, lang, CAST({_SQL_NTOK_INLINE} AS BIGINT) AS n_tokens,
         (doc_id * 2654435761) % 4294967296 % 4096 AS bkt
  FROM documents
), ranked AS (
  SELECT doc_id, lang, n_tokens,
         coalesce(sum(n_tokens) OVER (
             PARTITION BY lang ORDER BY bkt, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before_tok,
         CASE lang WHEN 'en' THEN {_MIXTOK_QUOTAS['en']}
                   WHEN 'de' THEN {_MIXTOK_QUOTAS['de']}
                   WHEN 'fr' THEN {_MIXTOK_QUOTAS['fr']}
                   WHEN 'zh' THEN {_MIXTOK_QUOTAS['zh']} END AS quota
  FROM d
)
SELECT doc_id, lang, n_tokens
FROM ranked WHERE quota IS NOT NULL AND before_tok < quota
"""


_EPOCH_W = {**_MIX_W, "code": 0.1}  # 'code' absent from the corpus
_EPOCH_TOTAL = 5_000_000
_EPOCH_QUOTAS = {g: int(_EPOCH_TOTAL * w / sum(_EPOCH_W.values()))
                 for g, w in _EPOCH_W.items()}


def q_mixture_epoch_plan(spark, sf_dir):
    """Data-mixing plan (sampling.mixture_epoch_plan): per weighted
    source — available vs target whitespace tokens and the repetition
    factor (epochs) a 5M-token run needs; the weighted-but-absent
    'code' source surfaces with 0 available and NULL epochs instead of
    vanishing. One map-side agg + literal arithmetic."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang", textstats.token_count(F.col("text")).alias("n_tokens"))
    return sampling.mixture_epoch_plan(
        docs, "lang", _EPOCH_W, total_tokens=_EPOCH_TOTAL)


SQL_MIXTURE_EPOCH_PLAN = f"""
WITH avail AS (
  SELECT lang, CAST(sum({_SQL_NTOK_INLINE}) AS BIGINT) AS available_tokens
  FROM documents GROUP BY lang
), targets(lang, target_tokens) AS (VALUES
  {", ".join(f"('{g}', CAST({q} AS BIGINT))" for g, q in _EPOCH_QUOTAS.items())}
)
SELECT t.lang,
       CAST(coalesce(a.available_tokens, 0) AS BIGINT) AS available_tokens,
       t.target_tokens,
       CASE WHEN coalesce(a.available_tokens, 0) > 0
            THEN round(CAST(t.target_tokens AS DOUBLE)
                       / a.available_tokens, 6) END AS epochs
FROM targets t LEFT JOIN avail a USING (lang)
"""


# Paragraph-dedup driver queries: the corpus text carries no newlines,
# so multi-paragraph documents are synthesized deterministically from
# doc_id — a FIXED 3-paragraph structure (unique intro / mod-selected
# boilerplate / the doc's real 60-char text prefix), expressed with the
# same arithmetic on both engines. The fixed shape lets the oracle
# enumerate (doc_id, para_index, para) as three UNION ALL selects while
# the Spark side still exercises the real split → posexplode path; the
# corpus prefixes contribute NATURAL cross-doc duplicates (22 shared
# prefixes at sf0.01) on top of the injected boilerplate.
_PARA_BOILER_A = "subscribe to our newsletter for weekly updates"
_PARA_BOILER_B = "copyright example corporation all rights reserved"


def _multi_para_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    p0 = F.concat(F.lit("intro paragraph for document "), d.cast("string"))
    p1 = (F.when(d % 7 == 0, F.lit(_PARA_BOILER_A))
          .when(d % 7 == 1, F.lit(_PARA_BOILER_B))
          .otherwise(F.concat(F.lit("unique filler paragraph for doc "),
                              d.cast("string"))))
    p2 = F.substring(F.col("text"), 1, 60)
    return docs.select(
        "doc_id", F.concat_ws("\n", p0, p1, p2).alias("text"))


_PARA_CTE = """
WITH paras AS (
  SELECT doc_id, CAST(0 AS INTEGER) AS para_index,
         trim('intro paragraph for document ' || CAST(doc_id AS VARCHAR)) AS para
  FROM documents
  UNION ALL
  SELECT doc_id, CAST(1 AS INTEGER),
         trim(CASE WHEN doc_id % 7 = 0 THEN 'subscribe to our newsletter for weekly updates'
                   WHEN doc_id % 7 = 1 THEN 'copyright example corporation all rights reserved'
                   ELSE 'unique filler paragraph for doc ' || CAST(doc_id AS VARCHAR) END)
  FROM documents
  UNION ALL
  SELECT doc_id, CAST(2 AS INTEGER), trim(substr(text, 1, 60))
  FROM documents
), qual AS (
  SELECT * FROM paras WHERE len(para) >= 30
), shared AS (
  SELECT para, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_sharing
  FROM qual GROUP BY para HAVING count(DISTINCT doc_id) > 1
)
"""


def q_paragraph_dedup(spark, sf_dir):
    """Cross-document duplicate paragraphs (dedup.paragraph_duplicates):
    one row per occurrence of a paragraph shared by >1 distinct doc.
    keep_text=True so the oracle compares the paragraph STRING (the
    engine's 64-bit para_hash has no portable SQL twin; the string
    compare doubles as a hash-collision witness, as in text_profile)."""
    return dedup.paragraph_duplicates(
        _multi_para_docs(spark, sf_dir), keep_text=True)


SQL_PARAGRAPH_DEDUP = _PARA_CTE + """
SELECT q.doc_id, q.para_index, q.para, s.n_docs_sharing
FROM qual q JOIN shared s USING (para)
"""


def q_strip_dup_paragraphs(spark, sf_dir):
    """Boilerplate strip (dedup.strip_duplicate_paragraphs): every
    occurrence of a cross-doc duplicated paragraph removed except the
    globally-first (min (doc_id, para_index)); text rebuilt in original
    paragraph order; every input doc returned (possibly '')."""
    return dedup.strip_duplicate_paragraphs(_multi_para_docs(spark, sf_dir))


SQL_STRIP_DUP_PARAGRAPHS = _PARA_CTE + """
, drop_set AS (
  SELECT doc_id, para_index FROM (
    SELECT doc_id, para_index,
           row_number() OVER (PARTITION BY para
                              ORDER BY doc_id, para_index) AS rn
    FROM qual WHERE para IN (SELECT para FROM shared)
  ) WHERE rn > 1
)
SELECT d.doc_id,
       coalesce(r.text, '') AS text
FROM documents d
LEFT JOIN (
  SELECT doc_id, string_agg(para, chr(10) ORDER BY para_index) AS text
  FROM paras p
  WHERE NOT EXISTS (SELECT 1 FROM drop_set x
                    WHERE x.doc_id = p.doc_id
                      AND x.para_index = p.para_index)
  GROUP BY doc_id
) r USING (doc_id)
"""


# ------------------------------------------ substring-window exact dedup

# Shared tokenization twin: Spark split(lower(trim(text)), '\s+') ==
# DuckDB split-on-space of the whitespace-collapsed lowercased trim.
# Windows compare by STRING in the oracle (the engine's xxhash64 key
# has no portable SQL twin; the string compare doubles as a
# hash-collision witness, as in paragraph_dedup).
_WIN_CTE = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), ' ') AS t
  FROM documents WHERE length(trim(text)) > 0
), wins AS (
  SELECT doc_id, i - 1 AS win_index, array_to_string(t[i:i+7], ' ') AS w
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
  WHERE len(t) >= 8
), shared AS (
  SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) > 1
), flagged AS (
  SELECT doc_id, win_index FROM wins WHERE w IN (SELECT w FROM shared)
)
"""


def q_duplicate_window_stats(spark, sf_dir):
    """Exact substring-level duplication profile
    (dedup.duplicate_window_stats, k=8): per-doc k-token-window counts,
    cross-doc duplicated-window count/ratio, and the longest contiguous
    duplicated token run — Lee et al. ExactSubstr grain between
    paragraph_dedup and whole-doc near-dup."""
    return dedup.duplicate_window_stats(
        _tw(spark, sf_dir, "documents"), k=8)


SQL_DUPLICATE_WINDOW_STATS = _WIN_CTE + """
, runs AS (
  SELECT doc_id, win_index,
         win_index - row_number() OVER (PARTITION BY doc_id ORDER BY win_index) AS grp
  FROM flagged
), runlen AS (
  SELECT doc_id, max(cnt) AS max_run FROM (
    SELECT doc_id, grp, count(*) AS cnt FROM runs GROUP BY doc_id, grp
  ) GROUP BY doc_id
), base AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM wins GROUP BY doc_id
), dupc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM flagged GROUP BY doc_id
)
SELECT b.doc_id, b.n_windows,
       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
       ROUND(CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / b.n_windows, 6)
         AS dup_window_ratio,
       CAST(CASE WHEN r.max_run IS NULL THEN 0 ELSE r.max_run + 7 END AS BIGINT)
         AS max_dup_token_run
FROM base b LEFT JOIN dupc d USING (doc_id) LEFT JOIN runlen r USING (doc_id)
"""


def q_duplicate_token_spans(spark, sf_dir):
    """Merged duplicated token intervals (dedup.duplicate_token_spans,
    k=8): per doc, maximal [start_token, end_token) stretches covered
    by cross-doc duplicated windows — the ranges an ExactSubstr cleaner
    cuts. Windows merge when overlapping or exactly adjacent."""
    return dedup.duplicate_token_spans(
        _t(spark, sf_dir, "documents"), k=8)


SQL_DUPLICATE_TOKEN_SPANS = _WIN_CTE + """
, isl AS (
  SELECT doc_id, win_index,
         CASE WHEN lag(win_index) OVER (PARTITION BY doc_id ORDER BY win_index) IS NULL
                   OR win_index - lag(win_index) OVER (PARTITION BY doc_id ORDER BY win_index) > 8
              THEN 1 ELSE 0 END AS new_island
  FROM flagged
), isl2 AS (
  SELECT doc_id, win_index,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY win_index) AS island
  FROM isl
)
SELECT doc_id,
       CAST(min(win_index) AS BIGINT) AS start_token,
       CAST(max(win_index) + 8 AS BIGINT) AS end_token,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl2 GROUP BY doc_id, island
"""


def q_strip_dup_windows(spark, sf_dir):
    """ExactSubstr removal (dedup.strip_duplicate_windows, k=8,
    min_run_tokens=50 — the Lee et al. published threshold): cut every
    duplicated stretch of >= 50 tokens except its globally-first
    occurrence (min (doc_id, win_index) keeper per window), rebuild
    docs from surviving ORIGINAL-case tokens. Every input doc returns;
    11 docs are actually cut at sf0.01 (non-vacuous)."""
    return dedup.strip_duplicate_windows(
        _t(spark, sf_dir, "documents"), k=8, min_run_tokens=50)


SQL_STRIP_DUP_WINDOWS = _WIN_CTE + r"""
, nonkeep AS (
  SELECT doc_id, win_index FROM (
    SELECT doc_id, win_index,
           row_number() OVER (PARTITION BY w ORDER BY doc_id, win_index) AS rn
    FROM wins WHERE w IN (SELECT w FROM shared)
  ) WHERE rn > 1
), isl AS (
  SELECT doc_id, win_index,
         CASE WHEN lag(win_index) OVER (PARTITION BY doc_id ORDER BY win_index) IS NULL
                   OR win_index - lag(win_index) OVER (PARTITION BY doc_id ORDER BY win_index) > 8
              THEN 1 ELSE 0 END AS ni FROM nonkeep
), isl2 AS (
  SELECT doc_id, win_index,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY win_index) AS island
  FROM isl
), cut AS (
  SELECT doc_id, min(win_index) AS s, max(win_index) + 8 AS e
  FROM isl2 GROUP BY doc_id, island
  HAVING max(win_index) + 8 - min(win_index) >= 50
), otoks AS (
  SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ot
  FROM documents WHERE length(trim(text)) > 0
), toksidx AS (
  SELECT doc_id, i - 1 AS idx, ot[i] AS tok
  FROM otoks, LATERAL (SELECT unnest(generate_series(1, len(ot))) AS i) g
), kept AS (
  SELECT t.doc_id, t.idx, t.tok FROM toksidx t
  WHERE NOT EXISTS (SELECT 1 FROM cut c
                    WHERE c.doc_id = t.doc_id AND t.idx >= c.s AND t.idx < c.e)
)
SELECT d.doc_id, coalesce(r.text, '') AS text
FROM documents d LEFT JOIN (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text FROM kept GROUP BY doc_id
) r USING (doc_id)
"""


# --------------------------------------------------- split-leakage audit

def q_split_leakage_audit(spark, sf_dir):
    """Audit a PLAIN per-doc hash split for near-dup leakage
    (sampling.split_leakage_violations): clusters from the real
    minhash+chain pair graph whose members straddle splits — exactly
    the contamination leakage_safe_split prevents (its output audits
    clean, pinned in tests). Non-vacuous by construction: per-doc
    hashing scatters ~1-(Σw²)≈34% of multi-member clusters."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    clusters = dedup.neardup_clusters(_neardup_pair_graph(spark, sf_dir))
    assigned = sampling.hash_split(docs, _SPLIT_W, portable=True)
    return sampling.split_leakage_violations(assigned, clusters)


SQL_SPLIT_LEAKAGE_AUDIT = _NEARDUP_GRAPH_CTE + f"""
, assigned AS (
  SELECT doc_id, {{case}} AS split FROM documents
)
SELECT c.cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(DISTINCT s.split) AS BIGINT) AS n_splits,
       list_aggr(list_sort(list(DISTINCT s.split)), 'string_agg', ',') AS splits
FROM comp c JOIN assigned s ON s.doc_id = c.id
GROUP BY c.cluster_id HAVING count(DISTINCT s.split) > 1
""".format(case=_SQL_SPLIT_CASE.format(k="doc_id"))


# ------------------------------------------------ BPE merge candidates

def q_bpe_merge_candidates(spark, sf_dir):
    """First BPE merge round (bpe.bpe_merge_candidates): top-50
    adjacent character-pair counts over the corpus vocabulary (word
    histogram = the one corpus pass; pair counting is vocab-sized),
    deterministically ordered (count desc, left, right)."""
    from .operators import bpe
    return bpe.bpe_merge_candidates(_t(spark, sf_dir, "documents"), top_n=50)


SQL_BPE_MERGE_CANDIDATES = r"""
WITH words AS (
  SELECT w AS word, count(*) AS cnt FROM (
    SELECT unnest(string_split(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents WHERE length(trim(text)) > 0
  ) WHERE w <> '' AND length(w) <= 100
  GROUP BY w
), syms AS (
  SELECT list_append(regexp_extract_all(word, '.'), '</w>') AS s, cnt
  FROM words
), pairs AS (
  SELECT s[i] AS left_sym, s[i + 1] AS right_sym, cnt
  FROM syms, LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS i) g
)
SELECT left_sym, right_sym, CAST(sum(cnt) AS BIGINT) AS pair_count
FROM pairs GROUP BY left_sym, right_sym
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 50
"""


# ------------------------------------------------ BPE trainer, first 3


def q_bpe_train_first3(spark, sf_dir):
    """First 3 BPE merge SELECTIONS (bpe.train_merges_df → the
    size-gated trainer of train_bpe): (merge_idx, left_sym, right_sym,
    pair_count at selection time). Puts the trainer's iterative
    selection logic itself — not just round-1 counts — under the DuckDB
    oracle (round-7 verdict #8): the oracle runs 3 chained
    count→select→rewrite rounds. The greedy left-to-right
    non-overlapping BPE rewrite is expressed as ONE string replace()
    per round over a bracketed-symbol encoding: every symbol is
    rendered \\x1e sym \\x1f, so replace('\\x1eL\\x1f\\x1eR\\x1f' →
    '\\x1eLR\\x1f') has exactly the trainer's merge semantics (string
    replace scans left-to-right and never re-matches inside a
    replacement — e.g. [a,a,a] → [aa,a], never [a,aa]), and symbol
    boundaries can't false-match inside multi-char symbols. Ties break
    (count desc, left, right) — binary UTF-8 collation on both
    engines. The sentinel bytes \\x1e/\\x1f never occur in the corpus
    (whitespace-split printable text)."""
    from .operators import bpe
    return bpe.train_merges_df(_t(spark, sf_dir, "documents"),
                               num_merges=3)


def _bpe_sql_first3() -> str:
    O, C = "\x1e", "\x1f"  # noqa: E741 — symbol open/close sentinels
    cte = r"""
WITH words AS (
  SELECT w AS word, count(*) AS cnt FROM (
    SELECT unnest(string_split(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents WHERE length(trim(text)) > 0
  ) WHERE w <> '' AND length(w) <= 100
  GROUP BY w
), r0 AS (
  SELECT regexp_replace(word, '(.)', '{O}\1{C}', 'g') || '{O}</w>{C}' AS repr, cnt
  FROM words
)"""
    for k in (1, 2, 3):
        cte += """, p{k} AS (
  SELECT s[i] AS l, s[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS n
  FROM (SELECT regexp_extract_all(repr, '{O}([^{C}]+){C}', 1) AS s, cnt
        FROM r{j}) t,
       LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS i) g
  GROUP BY 1, 2
), b{k} AS (
  SELECT l, r, n FROM p{k} ORDER BY n DESC, l, r LIMIT 1
), r{k} AS (
  SELECT replace(repr,
                 (SELECT '{O}' || l || '{C}' || '{O}' || r || '{C}' FROM b{k}),
                 (SELECT '{O}' || l || r || '{C}' FROM b{k})) AS repr, cnt
  FROM r{j}
)""".replace("{k}", str(k)).replace("{j}", str(k - 1))
    cte += """
SELECT CAST(1 AS INTEGER) AS merge_idx, l AS left_sym, r AS right_sym, n AS pair_count FROM b1
UNION ALL SELECT CAST(2 AS INTEGER), l, r, n FROM b2
UNION ALL SELECT CAST(3 AS INTEGER), l, r, n FROM b3
"""
    return cte.replace("{O}", O).replace("{C}", C)


SQL_BPE_TRAIN_FIRST3 = _bpe_sql_first3()


# Registry order IS the driver-verification order: the driver checks
# the FIRST 50 entries (DRIVER_WINDOW) each round. QUERIES_HEAD holds
# EXACTLY the window (len-asserted by
# tests/test_oracle_parity.py::test_driver_window_exactly_filled);
# QUERIES_PARKED holds the rest, strict-parity-checked every session
# via tools/strict_parity.py. Round-8 rotation (round-7 verdict #2):
# a near-full swap — the head carries (a) the queries whose newest
# driver rows are r06 (everything parked through round 7: the neardup/
# minhash family — which also sits on this round's _banded_signatures
# refactor — the multimodal trio, the span-rule trio, the second
# TPC-H block, eval/sampling/stats fillers, and the round-7
# strict-parity-only pair ivf_topk_quantized + split_leakage_audit)
# plus the SIX NEW round-8 queries (bpe_train_first3 — the trainer's
# selection logic under the oracle — and the cross-corpus index
# probes crosscorpus_{neardup, embedding_neardup, exact, simhash},
# and lm_quality_scores — CCNet unigram-LM scoring; the late three
# displaced tpch_q4/tpch_q5/dense_ids_event_types, which ride their
# r06 rows to the round-9 swap-back), and (b) 5 r07-green queries
# re-verified because their modules changed this round (bpe.py
# size-gated trainer refactor; dedup.py banded-signature extraction):
# bpe_merge_candidates, dedup_exact_prefix, paragraph_dedup,
# duplicate_window_stats, strip_dup_windows. Everything else parks on
# fresh r07-green rows.
DRIVER_WINDOW = 50

QUERIES_HEAD = {
    # -- (a) new in round 8 -------------------------------------------------
    "bpe_train_first3": (q_bpe_train_first3, SQL_BPE_TRAIN_FIRST3),
    "crosscorpus_neardup": (q_crosscorpus_neardup, SQL_CROSSCORPUS_NEARDUP),
    # -- (a) round-7 operators that rode strict-parity evidence only -------
    "ivf_topk_quantized": (q_ivf_topk_quantized, SQL_IVF_TOPK_QUANTIZED),
    "split_leakage_audit": (q_split_leakage_audit, SQL_SPLIT_LEAKAGE_AUDIT),
    # -- (a) everything whose newest driver row is r06 ----------------------
    "sessionize_events": (q_sessionize_events, SQL_SESSIONIZE),
    "rollup_orders": (q_rollup_orders, SQL_ROLLUP_ORDERS),
    "percentiles_lineitem": (q_percentiles_lineitem, SQL_PERCENTILES),
    "dedup_earliest_window": (
        q_dedup_earliest_window, SQL_DEDUP_EARLIEST_WINDOW),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "clean_corpus": (q_clean_corpus, SQL_CLEAN_CORPUS),
    "word_topk": (q_word_topk, SQL_WORD_TOPK),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "multimodal_audio": (q_multimodal_audio, SQL_MULTIMODAL_AUDIO),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "neardup_clusters": (q_neardup_clusters, SQL_NEARDUP_CLUSTERS),
    "neardup_dedup": (q_neardup_dedup, SQL_NEARDUP_DEDUP),
    "neardup_dedup_quality": (q_neardup_dedup_quality, SQL_NEARDUP_DEDUP_QUALITY),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_MINHASH_LSH),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD),
    "simhash_pairs": (q_simhash_pairs, SQL_SIMHASH),
    "embedding_neardup_pairs": (q_embedding_neardup_pairs, SQL_EMBEDDING_NEARDUP),
    "embedding_neardup_dedup": (
        q_embedding_neardup_dedup, SQL_EMBEDDING_NEARDUP_DEDUP),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "span_kind_violations": (q_span_kind_violations, SQL_SPAN_KIND),
    "span_mutex_violations": (q_span_mutex_violations, SQL_SPAN_MUTEX),
    "span_mono_violations": (q_span_mono_violations, SQL_SPAN_MONO),
    "percentiles_hist_lineitem": (q_percentiles_hist_lineitem, SQL_PERCENTILES_HIST),
    "drift_ks_event_value": (q_drift_ks_event_value, SQL_DRIFT_KS),
    # crosscorpus_exact displaced tpch_q4 (parked: the TPC-H family
    # already carries 17 fresh r07 rows; q4 rides its r06 row to r09).
    "crosscorpus_exact": (q_crosscorpus_exact, SQL_CROSSCORPUS_EXACT),
    # crosscorpus_simhash displaced tpch_q5 (same rationale as q4)
    "crosscorpus_simhash": (q_crosscorpus_simhash, SQL_CROSSCORPUS_SIMHASH),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q21": (q_tpch_q21, SQL_TPCH_Q21),
    "tpch_q22": (q_tpch_q22, SQL_TPCH_Q22),
    "text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "eval_cooccurrence": (q_eval_cooccurrence, SQL_EVAL_COOC),
    # lm_quality_scores displaced dense_ids_event_types (single-purpose
    # filler; rides its r06 row to the round-9 swap-back)
    "lm_quality_scores": (q_lm_quality_scores, SQL_LM_QUALITY),
    "sample_capped_per_group": (q_sample_capped_per_group, SQL_SAMPLE_CAPPED),
    "eval_averaged": (q_eval_averaged, SQL_EVAL_AVERAGED),
    "uniqueness_lineitem_orderkey": (q_uniqueness_lineitem_orderkey, SQL_UNIQUENESS),
    "referential_media_refs": (q_referential_media_refs, SQL_REF_MEDIA),
    "column_stats_orders": (q_column_stats_orders, SQL_COLUMN_STATS),
    "hash_split_assign": (q_hash_split_assign, SQL_HASH_SPLIT),
    "leakage_safe_split": (q_leakage_safe_split, SQL_LEAKAGE_SAFE_SPLIT),
    # -- (a) new in round 8, second half: embedding-modality index probe
    # (bpe_merge_candidates parked to make room — its module freshness
    # is covered by bpe_train_first3 riding the same trainer code)
    "crosscorpus_embedding_neardup": (
        q_crosscorpus_embedding_neardup, SQL_CROSSCORPUS_EMBEDDING),
    # -- (b) r07-green, re-verified: their modules changed this round -------
    "dedup_exact_prefix": (q_dedup_exact_prefix, SQL_DEDUP_PREFIX),
    "paragraph_dedup": (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
    "duplicate_window_stats": (
        q_duplicate_window_stats, SQL_DUPLICATE_WINDOW_STATS),
    "strip_dup_windows": (q_strip_dup_windows, SQL_STRIP_DUP_WINDOWS),
}

# Past the driver window: all r07-driver-green, unchanged this round,
# strict-parity-verified every session.
QUERIES_PARKED = {
    "mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "pack_conservation": (q_pack_conservation, SQL_PACK_CONSERVATION),
    "corpus_token_budget": (q_corpus_token_budget, SQL_CORPUS_TOKEN_BUDGET),
    "split_overflow_chunks": (q_split_overflow_chunks, SQL_SPLIT_OVERFLOW_CHUNKS),
    "mixture_sample_tokens": (
        q_mixture_sample_tokens, SQL_MIXTURE_SAMPLE_TOKENS),
    "mixture_epoch_plan": (q_mixture_epoch_plan, SQL_MIXTURE_EPOCH_PLAN),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "json_props_stats": (q_json_props_stats, SQL_JSON_PROPS),
    "similarity_topk": (q_similarity_topk, SQL_SIMILARITY_TOPK),
    "text_token_stats": (q_text_token_stats, SQL_TEXT_TOKEN_STATS),
    "drift_psi_event_type": (q_drift_psi_event_type, SQL_DRIFT_PSI),
    "lsh_topk": (q_lsh_topk, SQL_ANN_PLANTED_TOP1),
    "ivf_topk": (q_ivf_topk, SQL_ANN_PLANTED_TOP1),
    "ivf_topk_indexed": (q_ivf_topk_indexed, SQL_IVF_TOPK_INDEXED),
    "frame_sample_plan": (q_frame_sample_plan, SQL_FRAME_SAMPLE),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED),
    "embedding_neardup_lsh": (q_embedding_neardup_lsh, SQL_EMBEDDING_NEARDUP_LSH),
    "text_profile": (q_text_profile, SQL_TEXT_PROFILE),
    "drift_psi_lang": (q_drift_psi_lang, SQL_DRIFT_PSI_LANG),
    "drift_ks_quality": (q_drift_ks_quality, SQL_DRIFT_KS_QUALITY),
    "windowed_drift_psi": (q_windowed_drift_psi, SQL_WINDOWED_DRIFT_PSI),
    "embedding_stats": (q_embedding_stats, SQL_EMBEDDING_STATS),
    "referential_media_refs_large_dim": (
        q_referential_media_refs_large_dim, SQL_REF_MEDIA),
    "referential_unknown_event_types": (
        q_referential_unknown_event_types, SQL_REF_EVENT_TYPES),
    "eval_subset_accuracy": (q_eval_subset_accuracy, SQL_EVAL_ACC),
    "tpch_q2": (q_tpch_q2, SQL_TPCH_Q2),
    "tpch_q7": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q8": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q9": (q_tpch_q9, SQL_TPCH_Q9),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q11": (q_tpch_q11, SQL_TPCH_Q11),
    "tpch_q12": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q15": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q16": (q_tpch_q16, SQL_TPCH_Q16),
    "tpch_q17": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q18": (q_tpch_q18, SQL_TPCH_Q18),
    "tpch_q19": (q_tpch_q19, SQL_TPCH_Q19),
    "tpch_q20": (q_tpch_q20, SQL_TPCH_Q20),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "strip_dup_paragraphs": (q_strip_dup_paragraphs, SQL_STRIP_DUP_PARAGRAPHS),
    "span_rule_verdicts": (q_span_rule_verdicts, SQL_SPAN_VERDICTS),
    "dense_ids_event_types": (q_dense_ids_event_types, SQL_DENSE_IDS),
    "arrow_span_violations": (q_arrow_span_violations, SQL_ARROW_SPAN),
    "response_validation": (q_response_validation, SQL_RESPONSE_VALIDATION),
    "eval_per_class_prf": (q_eval_per_class_prf, SQL_EVAL_PRF),
    "duplicate_token_spans": (
        q_duplicate_token_spans, SQL_DUPLICATE_TOKEN_SPANS),
    "bpe_merge_candidates": (
        q_bpe_merge_candidates, SQL_BPE_MERGE_CANDIDATES),
}

QUERIES = {**QUERIES_HEAD, **QUERIES_PARKED}
