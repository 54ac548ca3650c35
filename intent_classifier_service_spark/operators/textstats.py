"""Text analysis for training-data pipelines — all JVM-side column
expressions (no Python in the hot path).

  token_count        — whitespace + BPE-ish subword estimate
  quality_score      — length / punctuation / stopword-ratio heuristics
                       (generalizes the reference's preprocessing stats:
                       notebooks/data_exploration.ipynb cells 22-27,
                       prompt_engineering token reduction)
  lang_id            — stopword-hit n-gram heuristic over small per-lang
                       marker sets (broadcast-free: literal arrays)
  fingerprint        — order-sensitive rolling hash of the token stream
  word_topk          — top-k frequent tokens (TakeOrderedAndProject)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that for on with as at by from",
)
_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "una", "en"],
}


def _as_col(col):
    return F.col(col) if isinstance(col, str) else col


def tokens(col: str = "text"):
    return F.split(F.lower(F.trim(_as_col(col))), r"\s+")


# Exactly string.punctuation as a regex class: ASCII ranges !-/ :-@ [-` {-~
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def normalize_text(col: str = "text", lowercase: bool = True,
                   strip_punct: bool = True, collapse_ws: bool = True):
    """Text-normalization rule (SURVEY F3): strip + punctuation removal
    (reference preprocess_text, gpt_intent_classifier.py:296-314 —
    documented semantics: trim, drop string.punctuation characters) +
    whitespace collapse. Pure JVM regexp, stays in codegen."""
    c = F.trim(F.col(col))
    if lowercase:
        c = F.lower(c)
    if strip_punct:
        c = F.regexp_replace(c, PUNCT_CLASS, "")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def remove_stopwords(col: str = "text", stopwords: list[str] | None = None):
    """Stopword-removal transform (SURVEY F13; reference
    data_exploration.ipynb cell 24 / gpt_intent_classifier.py:305-308):
    token array minus the stopword set, order- AND duplicate-preserving
    (array_except would dedup — wrong for token streams)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN[0].split())])
    return F.filter(tokens(col), lambda t: ~F.array_contains(sw, t))


def token_count(col: str = "text"):
    """Whitespace token count."""
    return F.when(F.length(F.trim(_as_col(col))) == 0, 0).otherwise(F.size(tokens(col)))


def subword_estimate(col: str = "text"):
    """BPE-ish token estimate, pure JVM: count word-piece chunks via
    regexp_extract_all — runs of up to 6 letters (long words split into
    multiple pieces, as BPE does), single digits, and punctuation
    characters each count as one piece. Tracks real BPE tokenizers to
    within ~±20% on English text without any vocabulary."""
    return F.size(
        F.regexp_extract_all(
            F.lower(F.col(col)), F.lit(r"[a-z]{1,6}|[0-9]|[^\sa-z0-9]"), 0
        )
    )


def stopword_ratio(col: str = "text", lang: str = "en"):
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN[0].split()]) if lang == "en" else F.array(
        *[F.lit(w) for w in _MARKERS[lang]]
    )
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(0.0)


def punct_ratio(col: str = "text"):
    stripped = F.regexp_replace(F.col(col), r"[^\w\s]", "")
    return F.when(
        F.length(col) > 0,
        (F.length(col) - F.length(stripped)) / F.length(col),
    ).otherwise(0.0)


def quality_score(col: str = "text"):
    """[0,1] heuristic: long enough, low punctuation noise, some
    stopwords (natural-language-ness). Weights are convention, the
    shape (pure column arithmetic, one pass) is the point."""
    n_tok = token_count(col)
    len_ok = F.least(n_tok / 20.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), 1.0 - 2.0 * punct_ratio(col))
    sw = stopword_ratio(col)
    sw_ok = F.least(sw * 4.0, F.lit(1.0))
    return (0.4 * len_ok + 0.3 * punct_pen + 0.3 * sw_ok).alias("quality")


def lang_id(col: str = "text"):
    """argmax over per-language marker-hit counts; 'und' if no hits."""
    toks = tokens(col)
    scores = [
        (
            lang,
            F.size(
                F.filter(toks, lambda t: F.array_contains(
                    F.array(*[F.lit(w) for w in words]), t
                ))
            ),
        )
        for lang, words in _MARKERS.items()
    ]
    pairs = F.array(*[
        F.struct(s.alias("hits"), F.lit(lang).alias("lang")) for lang, s in scores
    ])
    best = F.array_max(pairs)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: str = "text"):
    """Order-sensitive rolling hash of the token stream: left fold
    acc ← xxhash64(acc, token_hash). Chained hashing wraps safely under
    ANSI mode (no long multiply) and mixes better than acc*31⊕h.
    Reordered tokens change the fingerprint; exact-dup digests
    (dedup.py) do not care about order, this does."""
    return F.aggregate(
        F.transform(tokens(col), lambda t: F.xxhash64(t)),
        F.lit(0).cast("long"),
        lambda acc, h: F.xxhash64(acc, h),
    )


# ------------------------------------------------- intra-doc repetition
# Gopher-style repetition signals (Rae et al. 2021 §A1.1): dedup
# catches INTER-doc repetition; these catch the boilerplate/spam shape
# WITHIN a doc. Both are pure JVM expressions — no explode, no shuffle,
# no Python — so they ride any existing doc-level scan for free.

def word_ngrams(col: str = "text", n: int = 2):
    """Word n-grams WITH multiplicity (unlike dedup.shingles, which
    array_distincts — counts are the point here); empty array when the
    doc has fewer than n tokens. The token array is let-bound via the
    element_at(transform(array(e), body), 1) idiom so Catalyst builds
    it once per doc, not once per window (the O(w²) inline trap, see
    dedup.shingles)."""
    def body(t):
        k = F.size(t) - (n - 1)
        return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            )
        )

    return F.element_at(F.transform(F.array(tokens(col)), body), 1)


def repeated_line_fraction(col: str = "text"):
    """Fraction of non-empty (trimmed) lines that duplicate another
    line of the same doc: 1 − distinct/total. 0.0 for docs with no
    lines or null text."""
    lines = F.filter(
        F.transform(F.split(_as_col(col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def body(ls):
        return F.when(
            F.size(ls) > 0,
            (F.size(ls) - F.size(F.array_distinct(ls))) / F.size(ls),
        ).otherwise(F.lit(0.0))

    return F.coalesce(
        F.element_at(F.transform(F.array(lines), body), 1), F.lit(0.0)
    )


def _max_run(arr):
    """Longest run of equal adjacent elements in a SORTED array — one
    O(len) fold, struct accumulator (prev, run, best)."""
    init = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, h):
        run = F.when(h.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            h.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def top_ngram_mass(col: str = "text", n: int = 2):
    """Fraction of the doc's word n-grams occupied by its single most
    frequent n-gram (count-based variant of Gopher's top-n-gram
    character fraction). Computed per row without any shuffle: hash
    each n-gram (JVM xxhash64), array_sort, then the most frequent
    count is the longest equal-run in the sorted array — O(w log w)
    per doc vs the O(w²) count-each-distinct lambda. 0.0 when the doc
    has no n-grams or null text."""
    sorted_h = F.array_sort(
        F.transform(word_ngrams(col, n), lambda g: F.xxhash64(g))
    )

    def body(h):
        return F.when(
            F.size(h) > 0, _max_run(h) / F.size(h)
        ).otherwise(F.lit(0.0))

    return F.coalesce(
        F.element_at(F.transform(F.array(sorted_h), body), 1), F.lit(0.0)
    )


def text_profile(docs: DataFrame, id_col: str = "doc_id",
                 col: str = "text") -> DataFrame:
    """One-pass per-document profile used by pipeline filters."""
    return docs.select(
        F.col(id_col),
        token_count(col).alias("n_tokens"),
        subword_estimate(col).alias("n_subword"),
        F.length(col).alias("n_chars"),
        punct_ratio(col).alias("punct_ratio"),
        stopword_ratio(col).alias("stopword_ratio"),
        quality_score(col).alias("quality"),
        lang_id(col).alias("lang_pred"),
        fingerprint(col).alias("fingerprint"),
        repeated_line_fraction(col).alias("rep_line_frac"),
        top_ngram_mass(col, 2).alias("top_2gram_mass"),
    )


# PII patterns: kept deliberately simple and identical in Java regex
# and RE2 semantics (explicit case-folded character classes + bounded
# quantifiers only — no lookaround, no backrefs, no inline flags) so
# the DuckDB oracle can run the same pattern verbatim. Case-MIXED
# emails/URLs (John.Doe@Example.COM, HTTPS://...) are covered via the
# [A-Za-z] classes rather than (?i) to keep both engines byte-
# identical. Counts are taken on the PRE-scrub text, so overlapping
# spans (an email inside a URL userinfo part) count once per pattern
# they match — documented behavior, not a bug. A production deployment
# would swap in a vetted pattern pack; the engine mechanics (global
# JVM regexp_replace, one scan, no Python) are the point here.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"[Hh][Tt][Tt][Pp][Ss]?://[A-Za-z0-9./_-]+"
PII_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4,10}"


def pii_scrub(docs: DataFrame, col: str = "text") -> DataFrame:
    """Training-data PII redaction: count and replace email / URL /
    phone patterns with typed placeholder tokens, entirely JVM-side
    (regexp_count + regexp_replace stay in codegen — no Python, no
    shuffle; the standard pre-training scrub pass at 100 TB is exactly
    one scan). Adds n_emails / n_urls / n_phones and rewrites ``col``
    in place. Scrub order email → url → phone is safe: the three
    patterns cannot overlap (emails have no scheme, placeholders
    contain '<' which no pattern matches)."""
    c = _as_col(col)
    out = docs.withColumn("n_emails", F.regexp_count(c, F.lit(PII_EMAIL_RE)))
    out = out.withColumn("n_urls", F.regexp_count(c, F.lit(PII_URL_RE)))
    out = out.withColumn("n_phones", F.regexp_count(c, F.lit(PII_PHONE_RE)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"),
            PII_URL_RE, "<URL>",
        ),
        PII_PHONE_RE, "<PHONE>",
    )
    return out.withColumn(col, scrubbed)


def word_topk(docs: DataFrame, col: str = "text", k: int = 20) -> DataFrame:
    """Top-k frequent words (ref data_exploration cell 27). orderBy +
    limit plans TakeOrderedAndProject — per-partition heaps, no global
    sort."""
    return (
        docs.select(F.explode(tokens(col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(k)
    )


# ------------------------------------------ unigram-LM quality scoring
#
# CCNet-style (Wenzek et al. 1911.00359) perplexity filtering at
# unigram grain: train token counts on a (clean) corpus, score every
# doc by its average negative log-probability under the add-k-smoothed
# unigram model — high perplexity ≈ unnatural text, the standard
# LLM-pipeline quality gate between the heuristic rules and dedup.


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, c): the unigram LM's sufficient statistics. One corpus
    scan + one groupBy on the token (map-side combined, vocab-sized
    output — Zipf means the shuffle rows collapse hard)."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def lm_doc_scores(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", lm: DataFrame | None = None,
                  add_k: float = 1.0) -> DataFrame:
    """(id, n_tokens, avg_nll, ppl) per doc: average negative natural
    log-probability and perplexity under the add-k unigram model.
    ``lm`` is a (token, c) frame from unigram_counts — pass the CLEAN
    reference corpus' counts to score an ingest batch the CCNet way;
    None self-scores ``docs``. OOV tokens get the smoothed floor
    k / (total + k*(V+1)). ``docs`` must carry unique ids (every call
    site does: table keys / span-unit uids) — scoring is per ROW.

    Scale shape (round-9: ZERO-shuffle scoring pass): the vocab is
    Zipf-bounded (millions of rows, not corpus-sized — never
    corpus-sized), so its (token, log-prob) table collects once and
    ships as a Spark broadcast dict to one mapInPandas over
    (id, token-array) — the exact pattern bpe.apply_merges uses. The
    previous plan's per-doc groupBy re-aggregation shipped EVERY
    token's log-prob through a doc-keyed Exchange (~8 B × corpus token
    count — at 100 TB, a 100+ TB shuffle for a per-doc scalar); a
    doc's tokens never leave their scan partition, so the kernel
    scores each doc in place and the scoring subtree has NO Exchange
    at all (plan-gated in tests/test_physical_plans.py). The only
    remaining shuffle is unigram_counts' vocab-sized groupBy — the
    model's sufficient statistics, which any implementation pays.

    Engine-portable determinism, preserved bit-for-bit vs the old
    plan: per-token log-probs are computed by the SAME JVM expression
    (F.log over the counts frame — Java Math.log, not libm) before
    the collect; tokenization stays in the JVM (same tokens() split);
    the kernel only sorts ascending and left-folds from 0.0 — the
    identical FP op sequence as sort_array + F.aggregate; avg_nll /
    ppl derive from the raw sum via the same F.round / F.exp
    expressions as before (FP addition order is the cross-engine
    hash-breaker — see CLAUDE.md)."""
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    spark = docs.sparkSession
    counts = lm if lm is not None else unigram_counts(docs, text_col)
    # ONE vocab-sized collect (token, c); the model scalars derive
    # driver-side from it (exact integer sum — longs, no FP). The
    # log-probs must come from the SAME JVM expression the old plan
    # evaluated (Java Math.log, not libm), so they are computed on a
    # driver-built frame of the DISTINCT count values (Zipf: far fewer
    # than the vocab; c=0 rides along as the OOV floor — the old
    # coalesce(c,0) path) and joined back by count driver-side.
    count_rows = counts.collect()
    total = sum(r[1] for r in count_rows)
    v = len(count_rows)
    denom = float(total) + add_k * (float(v) + 1.0)
    distinct_cs = sorted({r[1] for r in count_rows} | {0})
    if len(distinct_cs) <= 4096:
        # F.log is bitwise StrictMath.log (verified on this platform's
        # Spark — NOT Math.log, NOT libm); the (c+k)/denom argument is
        # add/divide only, which IEEE rounds identically everywhere, so
        # a py4j StrictMath.log per DISTINCT count reproduces the old
        # expression exactly without scheduling a Spark job.
        jlog = spark.sparkContext._jvm.java.lang.StrictMath.log
        c_to_lp = {c: jlog((float(c) + float(add_k)) / denom)
                   for c in distinct_cs}
    else:
        lp_expr = F.log((F.col("c").cast("double") + F.lit(float(add_k)))
                        / F.lit(denom))
        c_to_lp = dict(
            spark.createDataFrame([(c,) for c in distinct_cs], "c long")
            .select("c", lp_expr.alias("lp")).collect()
        )
    lp_map = {r[0]: c_to_lp[r[1]] for r in count_rows}
    oov_lp = c_to_lp[0]
    bc = spark.sparkContext.broadcast((lp_map, oov_lp))

    id_type = docs.schema[id_col].dataType
    kernel_schema = StructType([
        StructField("id", id_type),
        StructField("n_tokens", LongType()),
        StructField("_nll_sum", DoubleType()),
    ])
    # Tokens cross the Python boundary as ONE space-joined string per
    # doc, not an Arrow list<string>: tokens cannot contain whitespace
    # by construction (they were split on \s+, and ' ' is in \s), so
    # str.split(" ") in the kernel reproduces the JVM token array
    # byte-for-byte — and the flat-string Arrow transfer measured ~3x
    # cheaper than the list-of-strings one on the bench corpus.
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.array_join(F.filter(tokens(text_col), lambda t: t != ""), " ")
        .alias("_ts"),
    )

    def _score(batches):
        lps, oov = bc.value
        get = lps.get
        for pdf in batches:
            ids_out, ns, sums = [], [], []
            for i, s in zip(pdf["id"], pdf["_ts"]):
                if not s:  # null text or zero tokens: explode() emitted
                    continue  # no rows for these docs in the old plan
                # ascending sort + sequential left fold from 0.0 — the
                # identical FP op sequence as sort_array + F.aggregate
                # (never math.fsum/np.sum: compensated/pairwise
                # summation changes the addition order)
                vals = sorted(get(t, oov) for t in s.split(" "))
                acc = 0.0
                for x in vals:
                    acc += x
                ids_out.append(i)
                ns.append(len(vals))
                sums.append(acc)
            if ids_out:
                yield pd.DataFrame(
                    {"id": ids_out,
                     "n_tokens": pd.Series(ns, dtype="int64"),
                     "_nll_sum": pd.Series(sums, dtype="float64")})

    per_doc = toks.mapInPandas(_score, kernel_schema)
    nll = -F.col("_nll_sum")
    avg_nll = F.round(nll / F.col("n_tokens"), 6)
    return per_doc.select(
        "id", "n_tokens", avg_nll.alias("avg_nll")
    ).withColumn("ppl", F.round(F.exp(F.col("avg_nll")), 4))
