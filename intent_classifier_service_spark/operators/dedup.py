"""Deduplication for large-scale training-data pipelines.

Five strategies, cheapest-first; all operate on the driver-provided
``documents`` table (doc_id, text, ...):

  exact_dedup        — hash-groupBy on a normalized text digest; one
                       shuffle on the 64-bit digest (uniform by
                       construction → no skew); keeps min(doc_id).
  ngram_jaccard      — token-shingle Jaccard between candidate pairs
                       that share a shingle (inverted-index join).
  minhash_lsh        — MinHash signatures (vectorized numpy pandas_udf)
                       → LSH band buckets → within-bucket candidate
                       pairs → exact Jaccard verify. The 100 TB path:
                       candidate generation is a self-join on (band,
                       bucket-hash), never all-pairs.
  simhash            — 64-bit SimHash from token hashes; near-dup =
                       equal simhash prefix bands (Hamming via xor
                       popcount on verify).
  embedding_cosine   — near-dup by cosine ≥ τ over the embeddings
                       table; brute-force within LSH-ish buckets (see
                       similarity.py for the ANN machinery).

Scale notes: every strategy reduces to (1) a narrow per-row signature
computed JVM-side or in one Arrow batch, (2) a shuffle keyed by a
uniform hash, (3) pair verification only within buckets. All-pairs
never happens. Self-joins carry the smaller projected columns only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegralType, LongType
from pyspark.sql.window import Window

# ------------------------------------------------------------------ exact

def normalized_text(col="text", strip_punct: bool = False):
    """Lowercase, collapse whitespace — the 'same modulo formatting' key.
    ``strip_punct=True`` additionally applies the F3 normalization rule
    (punctuation removal, textstats.normalize_text) before keying, so
    'Hello, world!' and 'hello world' dedup together."""
    c = F.lower(F.trim(F.col(col)))
    if strip_punct:
        from .textstats import PUNCT_CLASS
        c = F.regexp_replace(c, PUNCT_CLASS, "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(digest, n_dups, keep_id, dup_ids) for every exactly-duplicated
    normalized text. xxhash64 is JVM-side; the groupBy key is uniform."""
    digest = F.xxhash64(normalized_text(text_col))
    return (
        docs.select(F.col(id_col), digest.alias("digest"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one row (min id) per normalized text. Two-phase min instead
    of dropDuplicates so the survivor is deterministic (SURVEY P6)."""
    digest = F.xxhash64(normalized_text(text_col)).alias("_digest")
    with_d = docs.withColumn("_digest", F.xxhash64(normalized_text(text_col)))
    keep = with_d.groupBy("_digest").agg(F.min(id_col).alias(id_col))
    return with_d.join(keep, ["_digest", id_col], "left_semi").drop("_digest")


# ------------------------------------------------------- paragraph-level

# Paragraph boundary: one-or-more newlines. Blank-line-separated
# ("\n\n") and line-grained corpora both reduce to this; the split
# regex is shared verbatim with the DuckDB oracle.
PARA_SPLIT_RE = r"\n+"


def _paragraphs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, para_index, para): posexplode of the regex-split text,
    paragraphs trimmed. para_index is the 0-based position in the
    ORIGINAL split, so surviving paragraphs re-join in document order
    even after some are filtered or stripped."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), PARA_SPLIT_RE))
        .alias("para_index", "para"),
    ).withColumn("para", F.trim("para"))


def paragraph_duplicates(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", min_chars: int = 30,
                         keep_text: bool = False) -> DataFrame:
    """Cross-document duplicate paragraphs — the Lee et al.
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) within-corpus substring problem at paragraph
    grain, the standard boilerplate killer between whole-doc dedup and
    benchmark n-gram decontamination. Emits one violation row per
    OCCURRENCE of a paragraph whose trimmed text appears in more than
    one distinct document: (id, para_index, para_hash, n_docs_sharing)
    (+ the paragraph text when ``keep_text`` — test/oracle use; at
    100 TB the 64-bit hash is the key that travels).

    Paragraphs shorter than ``min_chars`` after trim are ignored:
    short lines ("Introduction", list bullets) are near-universal and
    would flag everything while carrying no dedup value — the same
    df-cap reasoning as ngram_jaccard's stop-shingles.

    Scale shape (100 TB): explode → xxhash64 → (a) distinct on
    (id, hash) — ONE shuffle on a uniform composite key (a boilerplate
    paragraph in 10^9 docs still spreads across all partitions);
    (b) count per hash with map-side partial agg; (c) join the
    (typically tiny) duplicated-hash dimension back to occurrences —
    AQE broadcasts it. Within-doc repeats count ONCE toward
    n_docs_sharing (it is a distinct-doc count), and only cross-doc
    sharing flags — a doc quoting itself is repetition
    (textstats.repeated_line_fraction), not corpus boilerplate."""
    occ = _paragraphs(docs, id_col, text_col).filter(
        F.length("para") >= min_chars
    )
    cols = [F.col(id_col), "para_index", F.xxhash64("para").alias("para_hash")]
    if keep_text:
        cols.append(F.col("para"))
    occ = occ.select(*cols)
    sharing = (
        occ.select(id_col, "para_hash").distinct()
        .groupBy("para_hash")
        .agg(F.count(F.lit(1)).alias("n_docs_sharing"))
        .filter(F.col("n_docs_sharing") > 1)
    )
    return occ.join(sharing, "para_hash").select(
        id_col, "para_index",
        *(["para"] if keep_text else ["para_hash"]),
        "n_docs_sharing",
    )


def strip_duplicate_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text",
                               min_chars: int = 30,
                               joiner: str = "\n") -> DataFrame:
    """The dedup DECISION for paragraph boilerplate: every occurrence
    of a cross-doc duplicated paragraph is removed EXCEPT the globally
    first one — deterministic min (id, para_index), matching the
    min-id survivor convention of exact_dedup/neardup_clusters —
    and each document's text is rebuilt from its surviving paragraphs
    in original order. Returns (id, text) for EVERY input document
    (a doc whose every paragraph was stripped comes back as '').

    Normalization note: paragraphs are trimmed and re-joined with
    ``joiner``, so inter-paragraph whitespace is canonicalized even in
    untouched documents — run-idempotent by construction.

    Scale shape: the keeper min(struct(id, para_index)) is a map-side-
    combinable groupBy on the hash; the drop set (duplicate
    occurrences minus one keeper per hash) is ≪ corpus and anti-joins
    back on the uniform (id, para_index) key; the rebuild is one
    groupBy per doc over its own (bounded) paragraph list."""
    paras = _paragraphs(docs, id_col, text_col)
    qual = paras.filter(F.length("para") >= min_chars).select(
        F.col(id_col), "para_index", F.xxhash64("para").alias("para_hash")
    )
    dup_hashes = (
        qual.select(id_col, "para_hash").distinct()
        .groupBy("para_hash")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("para_hash")
    )
    dup_occ = qual.join(dup_hashes, "para_hash", "left_semi")
    keep = dup_occ.groupBy("para_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("para_index"))).alias("_first")
    )
    drop = (
        dup_occ.join(keep, "para_hash")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("para_index") == F.col("_first.para_index"))
            )
        )
        .select(id_col, "para_index")
    )
    remaining = paras.join(drop, [id_col, "para_index"], "left_anti")
    rebuilt = remaining.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_index", "para"))),
                lambda s: s["para"],
            ),
            joiner,
        ).alias(text_col)
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(F.col(id_col), F.coalesce(text_col, F.lit("")).alias(text_col))
    )


# ----------------------------------------------------------- shingles/jaccard

def tokens(col="text"):
    return F.split(normalized_text(col), " ")


def shingles(col="text", n: int = 3, let_bound: bool = True):
    """Word n-gram shingles as a distinct array, built in-array (HOF) —
    no explode needed to construct them.

    By default the token array is LET-BOUND via the
    element_at(transform(array(e), x -> body), 1) idiom: referencing
    the derived ``tokens(col)`` array directly inside the per-window
    lambda makes Catalyst inline the whole lower/regexp/split
    construction once per window — O(w²) work per doc (the same trap
    explode_spans dodges). Bound once, the construction is O(w) and
    the windows slice a materialized array; ~4.5x on full-length docs
    (benchmarked on the decontamination pass).

    ``let_bound=False`` returns a ZIP-WITH construction instead: the
    let-binding's nested lambda (inner lambda closing over the outer's
    variable) cannot be compiled when the expression is an argument OF
    A PANDAS UDF (Spark 4.1 codegen INTERNAL_ERROR) — minhash_signatures
    feeds the shingle hashes straight into its Arrow kernel and needs
    a closure-free form. The zip chain concatenates the token array
    with its own k-shifted tails ((x, y) -> concat(x, ' ', y), n−1
    times; concat propagates the null padding zip_with adds past the
    shorter side, so trailing partial windows drop in the final
    slice), referencing the derived token array O(n) times instead of
    once per window — O(n·w) per doc where the round-8 inline form
    re-ran the whole lower/regexp/split construction inside every
    window's lambda, O(w²) (measured 3.4x on the 100k full-text
    corpus' signature pass). Both forms are value-identical
    (pytest-pinned, incl. n > len and whitespace edge cases)."""
    def body(toks):
        k = F.size(toks) - (n - 1)
        return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            )
        )

    if not let_bound:
        toks = tokens(col)
        cur = toks
        for k in range(2, n + 1):
            nxt = F.slice(toks, k,
                          F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0)))
            cur = F.zip_with(cur, nxt,
                             lambda x, y: F.concat(x, F.lit(" "), y))
        kk = F.size(toks) - (n - 1)
        return F.when(kk <= 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array_distinct(F.slice(cur, 1, kk)))
    return F.element_at(F.transform(F.array(tokens(col)), body), 1)


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        max_shingle_df: int | None = 1000) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs above threshold. Candidates come
    from an inverted-index self-join on shingle hash: each shared
    shingle contributes one intersection count, and |A∪B| = |A|+|B|−∩,
    so exact Jaccard needs no second pass over texts.

    ``max_shingle_df`` caps the document frequency of shingles allowed
    into the self-join: one stop-shingle appearing in k docs would
    otherwise emit k·(k−1)/2 candidate pairs — quadratic in the hottest
    key, fatal at 100 TB. Dropping df>cap shingles undercounts the
    intersection for pairs that share them (Jaccard becomes a lower
    bound), the standard stop-shingle tradeoff; near-dup pairs share
    plenty of rare shingles, so recall at high thresholds is
    unaffected. Pass None to disable (exact, small data only)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        shingles(text_col, n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    # materialize the hashed inverted index once (round-9): the lazy
    # subtree is consumed up to four times (df-cap aggregation, the
    # semi-join's stream side, both self-join sides), re-running the
    # shingle construction + hash each time; checkpointed rows are
    # (id, n_sh, hash) — 24 B per shingle, the same order as the
    # shuffle this feeds. Cluster form: setCheckpointDir +
    # .checkpoint(), as in neardup_clusters.
    inv = sh.select("id", "n_sh", F.explode("sh").alias("s")).withColumn(
        "s", F.xxhash64("s")
    ).localCheckpoint()
    if max_shingle_df is not None:
        # pre-pass: shingle document frequency; broadcast-free semi-join
        # of the rare side (the df table is aggregated, tiny vs corpus)
        rare = (
            inv.groupBy("s").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("s")
        )
        inv = inv.join(rare, "s", "left_semi")
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


# ------------------------------------------------------------------ minhash

def _ragged_segments(hashes: pd.Series):
    """(flat uint64 array, segment starts, nonzero mask) for a pandas
    Series of ragged int64 hash arrays — the shared whole-batch
    flattening scaffold of the minhash and simhash kernels. flat/starts
    are None when every row is empty/null."""
    n = len(hashes)
    lens = np.fromiter(
        (0 if a is None else len(a) for a in hashes), dtype=np.int64, count=n
    )
    nz = lens > 0
    if not nz.any():
        return None, None, nz, lens
    flat = np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in hashes if a is not None and len(a)]
    ).astype(np.uint64)
    starts = np.zeros(int(nz.sum()), dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=starts[1:])
    return flat, starts, nz, lens

def _minhash_params(num_hashes: int, seed: int = 42):
    """Multiply-shift family in the 2^64 ring: h_i(x) = (a_i*x + b_i)
    mod 2^64 with a_i odd (Dietzfelbinger et al.) — deterministic and
    well-mixing over the full-range xxhash64 inputs. Deliberately NOT
    the classic (a*x+b) mod p prime family: a 64-bit product wraps
    before any mod-p reduction could apply, so claiming p-universality
    for the wrapped form would be false."""
    rng = np.random.RandomState(seed)
    hi = (1 << 61) - 1
    a = rng.randint(1, hi, size=num_hashes, dtype=np.int64) | 1  # odd
    b = rng.randint(0, hi, size=num_hashes, dtype=np.int64)
    sentinel = hi  # empty-doc signature component (any fixed constant)
    return a, b, sentinel


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 64,
                       shingle_n: int = 3, seed: int = 42) -> DataFrame:
    """(id, sig: array<long>) — MinHash over word-shingle hashes.

    Shingle→int64 hashing happens JVM-side (xxhash64); only the int64
    arrays cross to Python, where one Arrow batch computes all
    num_hashes permutations vectorized — multiply-shift in the 2^64
    ring (see _minhash_params; values span the FULL uint64 range, they
    are NOT bounded by a prime), segmented min per doc.
    """
    a_par, b_par, sentinel = _minhash_params(num_hashes, seed)

    a_u = a_par.astype(np.uint64)
    b_u = b_par.astype(np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def mh(hashes: pd.Series) -> pd.Series:
        # Whole-batch vectorization: flatten every doc's shingle hashes
        # into one array, apply each multiply-shift permutation to the
        # flat array (uint64 wraparound IS the mod-2^64 reduction), and
        # take per-doc minima with one segmented reduce per permutation.
        # Python touches rows only to assemble the ragged arrays; the
        # hash math runs num_hashes × one-pass numpy, O(total_shingles).
        flat, starts, nz, _lens = _ragged_segments(hashes)
        out = np.full((len(hashes), len(a_u)), np.uint64(sentinel), dtype=np.uint64)
        if flat is not None:
            mins = np.empty((len(starts), len(a_u)), dtype=np.uint64)
            for j in range(len(a_u)):  # per-permutation, vectorized over docs
                mins[:, j] = np.minimum.reduceat(flat * a_u[j] + b_u[j], starts)
            out[nz] = mins
        return pd.Series(out.astype(np.int64).tolist())

    # let_bound=False: a pandas-UDF argument can't codegen the nested
    # let-binding lambda (see shingles docstring)
    sh_hashes = F.transform(shingles(text_col, shingle_n, let_bound=False),
                            lambda s: F.xxhash64(s))
    return docs.select(F.col(id_col).alias("id"), mh(sh_hashes).alias("sig"))


def _banded_signatures(docs: DataFrame, id_col: str, text_col: str,
                       num_hashes: int, bands: int, shingle_n: int,
                       seed: int, sigs: DataFrame | None = None) -> DataFrame:
    """(id, sig, band, bucket): MinHash signatures exploded into their
    LSH band buckets — the shared candidate-key frame of
    minhash_lsh_pairs (self-join) and the persisted cross-corpus index
    (build/append/probe join). Docs with NO shingles (null text — short
    texts fall back to a whole-text shingle, so only null/absent text
    qualifies) all share the sentinel signature: two *distinct* such
    docs would collide in every band with est_jaccard 1.0, a false
    positive. Shingle-Jaccard is undefined on empty sets, so they are
    excluded here.

    ``sigs`` (round-9 perf): a precomputed (id, sig) frame — the
    banding explode is then derived from it without re-running the
    shingle + MinHash kernel (the self-join caller materializes sigs
    ONCE and derives both sides)."""
    r = num_hashes // bands
    if sigs is None:
        # text IS NOT NULL ⇔ size(shingles(text)) > 0: the normalize →
        # split chain is null-preserving and non-null text always
        # yields ≥1 shingle (short texts fall back to the whole-text
        # shingle) — the predicate form skips a full O(n·w) shingle
        # construction per doc that existed only to be size()d (r9)
        docs = docs.filter(F.col(text_col).isNotNull())
        sigs = minhash_signatures(docs, id_col, text_col, num_hashes,
                                  shingle_n, seed)
    # bucket = xxhash64 over the band's r minhash LONGS directly (r9):
    # the old form stringified the slice and hashed the joined text —
    # 4x slower on the band explode, which the self-join evaluates on
    # BOTH sides. The bucket value is an internal collision key only
    # (candidates are est-verified afterwards), but it must stay
    # consistent between an index build and its probes — both route
    # through this one function, and the bench's /tmp-cached indexes
    # are keyed on source-file identity, so rebuild them after any
    # edit here.
    return sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.xxhash64(
                    *[F.element_at("sig", bi * r + 1 + j) for j in range(r)],
                    bi,
                ),
            )
        ).alias("band", "bucket"),
    )


def _sig_jaccard_est(sig_a="sig_a", sig_b="sig_b", num_hashes: int = 64):
    """Signature-level Jaccard estimate: fraction of equal minhashes."""
    return (
        F.size(
            F.filter(
                F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
                lambda e: e == 1,
            )
        )
        / F.lit(num_hashes)
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 64,
                      bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.7, seed: int = 42) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, est_jaccard ≥ threshold).

    sig → bands of r=num_hashes/bands rows; bucket key = hash(band,
    slice); candidates = pairs sharing ≥1 bucket; verify with the
    signature-level Jaccard estimate (fraction of equal minhashes) —
    at scale the verify happens on 8-byte×num_hashes arrays, not texts.

    Round-9 plan shape (same rows, decide-with-small-rows — guide §8):

    * the signatures materialize ONCE (localCheckpoint) and everything
      derives from that — the lazy self-join evaluated the whole
      shingle + MinHash Arrow kernel twice, once per side (the
      broadcast build side shares no Exchange to reuse);
    * the band self-join carries ONLY (id, band, bucket) — the old
      plan moved both 512-byte signatures through the join and the
      pair-dedup Exchange (a corpus-sized signature broadcast/shuffle
      at scale, Sort+SortAggregate from the array payload);
    * candidate (id_a, id_b) pairs dedup as bare ids (HashAggregate,
      16-byte rows), then the signatures attach back with two joins
      against the checkpointed sig store — the pair set is
      collision-bounded (≪ corpus), so AQE broadcasts it from exact
      runtime stats and the sig store streams map-side;
    * the Jaccard verify runs once per DEDUPED pair, as before.

    On a cluster prefer setCheckpointDir + .checkpoint() for the
    materialization (survives executor loss); localCheckpoint is the
    local-mode form, same as neardup_clusters' iteration state.
    """
    # equivalent to size(shingles(text)) > 0 — see _banded_signatures
    d = docs.filter(F.col(text_col).isNotNull())
    sigs = minhash_signatures(
        d, id_col, text_col, num_hashes, shingle_n, seed).localCheckpoint()
    banded = _banded_signatures(
        None, id_col, text_col, num_hashes, bands, shingle_n, seed,
        sigs=sigs).select("id", "band", "bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = _sig_jaccard_est(num_hashes=num_hashes)
    return (
        sa.join(pairs, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# ----------------------------------- cross-corpus incremental dedup
#
# The missing shape at 100 TB with CONTINUOUS ingest (round-7 verdict
# #2/next-round #4): every pair generator above self-joins the corpus
# it is given, so "dedup this week's ingest against the standing
# corpus" would re-pair the whole corpus each run. Instead, persist the
# banded MinHash signatures ONCE (the same way similarity.py persists
# IVF cells), then each ingest batch (a) probes the index with ONE
# equi-join whose streamed side is only the batch, and (b) appends its
# own signatures — the standing corpus is never re-scanned and
# within-index pairs are never re-emitted.


def _read_mh_manifest(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)


def _write_mh_manifest(path: str, params: dict, n_docs: int,
                       n_appends: int, append_counts: list[int]) -> dict:
    import json
    import os

    manifest = {**params, "n_docs": int(n_docs),
                "n_appends": int(n_appends),
                "append_counts": [int(c) for c in append_counts]}
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def build_minhash_index(docs: DataFrame, path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_hashes: int = 64, bands: int = 16,
                        shingle_n: int = 3, seed: int = 42) -> dict:
    """Persist the standing corpus' banded MinHash signatures as a
    probe-able index: parquet (id, sig, bucket) partitioned by band
    under ``path``/bands, plus manifest.json carrying the signature
    parameters (so probes/appends can never mix incompatible hash
    families — they re-derive signatures FROM the manifest) and the
    running doc counts. One corpus scan; the write shuffles nothing
    (partitionBy on 16 band values of an already-exploded frame).
    Returns the manifest."""
    import os

    banded = _banded_signatures(
        docs, id_col, text_col, num_hashes, bands, shingle_n, seed)
    banded.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(path, "bands"))
    spark = docs.sparkSession
    n_docs = (
        spark.read.parquet(os.path.join(path, "bands"))
        .select("id").distinct().count()
    )
    params = {"num_hashes": num_hashes, "bands": bands,
              "shingle_n": shingle_n, "seed": seed,
              "id_col": id_col, "text_col": text_col}
    return _write_mh_manifest(path, params, n_docs, 0, [])


def pairs_against_index(spark, path: str, new_docs: DataFrame,
                        threshold: float = 0.7) -> DataFrame:
    """Near-dup pairs between an ingest batch and the PERSISTED index:
    (id_new, id_indexed, est_jaccard ≥ threshold). The batch's banded
    signatures (parameters from the manifest — never caller-supplied,
    so they can't diverge from the index) equi-join the index's band
    table on (band, bucket); the signature-level Jaccard verify runs on
    the 8-byte×num_hashes arrays. Within-index pairs are NOT re-emitted
    — one side of the join is always the batch — and a re-ingested id
    never pairs with itself. Scale shape: the standing corpus is read
    but never re-paired against itself (candidate row count is bounded
    by batch collisions, not |index|²); the streamed side is
    batch-sized."""
    import os

    m = _read_mh_manifest(path)
    banded_new = _banded_signatures(
        new_docs, m["id_col"], m["text_col"], m["num_hashes"],
        m["bands"], m["shingle_n"], m["seed"])
    idx = spark.read.parquet(os.path.join(path, "bands"))
    n = banded_new.alias("n")
    i = idx.alias("i")
    # est per collision + filter BEFORE the pair dedup (round-9, same
    # transformation as minhash_lsh_pairs): the dedup exchange then
    # carries 24-byte triples instead of both 512-byte signatures and
    # hash-aggregates instead of sort-aggregating; a pair's est is
    # identical in every band it collides in, so distinct() over the
    # triple equals the old dedup-then-estimate rows exactly.
    est = _sig_jaccard_est(F.col("n.sig"), F.col("i.sig"),
                           m["num_hashes"])
    cand = (
        n.join(
            i,
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bucket") == F.col("i.bucket"))
            & (F.col("n.id") != F.col("i.id")),
        )
        .select(
            F.col("n.id").alias("id_new"),
            F.col("i.id").alias("id_indexed"),
            est.alias("est_jaccard"),
        )
    )
    return cand.filter(F.col("est_jaccard") >= threshold).distinct()


def append_to_minhash_index(spark, path: str,
                            new_docs: DataFrame) -> dict:
    """Fold an ingest batch into the persisted index: append its banded
    signatures into the band partitions (parquet append — no rewrite of
    the standing corpus' files) and bump the manifest's counts. The
    normal cadence is pairs_against_index(batch) → drop/survivor-select
    → append_to_minhash_index(kept batch). Returns the updated
    manifest."""
    import os

    m = _read_mh_manifest(path)
    banded = _banded_signatures(
        new_docs, m["id_col"], m["text_col"], m["num_hashes"],
        m["bands"], m["shingle_n"], m["seed"]).persist()
    n_new = banded.select("id").distinct().count()
    banded.write.mode("append").partitionBy("band").parquet(
        os.path.join(path, "bands"))
    banded.unpersist()
    params = {k: m[k] for k in (
        "num_hashes", "bands", "shingle_n", "seed", "id_col", "text_col")}
    return _write_mh_manifest(
        path, params, m["n_docs"] + n_new, m["n_appends"] + 1,
        m["append_counts"] + [n_new])


# --------------------------------- cross-corpus EXACT-hash index
#
# The stage every continuous-ingest pipeline runs BEFORE near-dup: is
# this batch's text byte-identical (modulo normalization) to anything
# in the standing corpus? The index is (id, digest, digest2) — 24
# bytes/doc, ~2.4 TB at 100B docs — partitioned by a digest shard.
# Probing is one (shard, digest, digest2) equi-join whose streamed
# side is the batch: with a batch ≪ index, AQE broadcasts the BATCH,
# so the standing index never shuffles at all. digest2 is an
# independent xxhash64 (seeded with a literal column) — requiring both
# to match makes a false pair need a simultaneous 128-bit collision,
# which matters at 100 TB where single-64-bit birthday collisions
# start appearing around ~4B docs.


def _exact_digests(docs: DataFrame, id_col: str, text_col: str,
                   n_shards: int) -> DataFrame:
    """(id, digest, digest2, shard) — digest/digest2 are independent
    xxhash64 values of the normalized text; shard = pmod(digest,
    n_shards) drives the index's partition layout."""
    norm = normalized_text(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.xxhash64(norm).alias("digest"),
        F.xxhash64(norm, F.lit(1)).alias("digest2"),
    ).withColumn(
        "shard", F.pmod(F.col("digest"), F.lit(n_shards)).cast("int"))


def build_exact_index(docs: DataFrame, path: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_shards: int = 16) -> dict:
    """Persist the standing corpus' exact-text digests as a probe-able
    index under ``path``/shards, manifest discipline identical to the
    MinHash index (params live in manifest.json; probes/appends
    re-derive digests FROM the manifest so hash families can't mix).
    One corpus scan; texts never leave it — only 24-byte digest rows
    are written. Returns the manifest."""
    import os

    dig = _exact_digests(docs, id_col, text_col, n_shards)
    dig.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(path, "shards"))
    spark = docs.sparkSession
    n_docs = (
        spark.read.parquet(os.path.join(path, "shards"))
        .select("id").distinct().count()
    )
    params = {"kind": "exact", "n_shards": n_shards,
              "id_col": id_col, "text_col": text_col}
    return _write_mh_manifest(path, params, n_docs, 0, [])


def exact_dups_against_index(spark, path: str,
                             new_docs: DataFrame) -> DataFrame:
    """Exact duplicates between an ingest batch and the PERSISTED
    index: one row per duplicated batch doc — (id_new, id_indexed =
    min standing id with the same normalized text, n_indexed_copies).
    Batch digests equi-join the index on (shard, digest, digest2);
    a re-ingested id never pairs with itself; within-index duplicates
    are never re-emitted (one join side is always the batch). The
    min-id survivor convention matches exact_dedup, so a drain can
    drop flagged rows and keep provenance to the standing keeper."""
    import os

    m = _read_mh_manifest(path)
    new = _exact_digests(new_docs, m["id_col"], m["text_col"],
                         m["n_shards"])
    idx = spark.read.parquet(os.path.join(path, "shards"))
    n, i = new.alias("n"), idx.alias("i")
    return (
        n.join(
            i,
            (F.col("n.shard") == F.col("i.shard"))
            & (F.col("n.digest") == F.col("i.digest"))
            & (F.col("n.digest2") == F.col("i.digest2"))
            & (F.col("n.id") != F.col("i.id")),
        )
        .groupBy(F.col("n.id").alias("id_new"))
        .agg(
            F.min(F.col("i.id")).alias("id_indexed"),
            F.count_distinct(F.col("i.id")).alias("n_indexed_copies"),
        )
    )


def append_to_exact_index(spark, path: str, new_docs: DataFrame) -> dict:
    """Fold an ingest batch into the exact index: append its digest
    rows into the shard partitions (no rewrite of standing files) and
    bump the manifest counts. Cadence: exact_dups_against_index(batch)
    → drop flagged → append_to_exact_index(kept batch)."""
    import os

    m = _read_mh_manifest(path)
    dig = _exact_digests(new_docs, m["id_col"], m["text_col"],
                         m["n_shards"]).persist()
    n_new = dig.select("id").distinct().count()
    dig.write.mode("append").partitionBy("shard").parquet(
        os.path.join(path, "shards"))
    dig.unpersist()
    params = {k: m[k] for k in ("kind", "n_shards", "id_col", "text_col")}
    return _write_mh_manifest(
        path, params, m["n_docs"] + n_new, m["n_appends"] + 1,
        m["append_counts"] + [n_new])


# -------------------------------------------------- decontamination

def contaminated_docs(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                      id_col: str = "doc_id", text_col: str = "text",
                      bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: corpus docs sharing at least one word
    n-gram with an eval/benchmark set → (id, n_hits, sample_shingle),
    violation-row shape (n_hits = number of DISTINCT contaminated
    shingles in the doc; sample_shingle = the lexicographically first,
    for triage). The standard LLM-training-data hygiene pass (n≈13 in
    published pipelines); docs it flags must be dropped or the eval is
    compromised.

    Scale shape: benchmark sets are tiny relative to a 100 TB corpus,
    so the DISTINCT benchmark shingle-hash set (8 bytes per shingle) is
    broadcast — the corpus side never shuffles its exploded shingles;
    the only shuffle is the groupBy over HIT rows, which are rare by
    construction (contamination is the exception). Shingle hashing is
    JVM-side xxhash64; texts never leave the scan."""
    corpus = docs.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("s")
    ).withColumn("sh", F.xxhash64("s"))
    bench = (
        benchmark.select(F.explode(shingles(bench_text_col, n)).alias("s"))
        .select(F.xxhash64("s").alias("sh"))
        .distinct()
    )
    return (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("s").alias("sample_shingle"),
        )
    )


# -------------------------------------------------- cluster resolution

def _propagate_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One hash-min hop: deliver every neighbor's label over the
    symmetric edge list (equi-join on src), union the vertices' own
    labels, take the per-vertex min → the new (id, label) table.
    Exposed separately so the plan gate can assert the hop is
    equi-join-only (no CartesianProduct) — the loop's localCheckpoint
    truncation hides it from the final DataFrame's plan."""
    delivered = (
        edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(F.col("dst").alias("id"), "label")
    )
    # Self-delivery via union instead of a join-back: two shuffles per
    # hop (src-join + id-groupBy) instead of three, and vertices with
    # no incoming edge keep their label through the union leg.
    return (
        delivered.unionByName(labels)
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )


def _compress_labels(labels: DataFrame) -> DataFrame:
    """Pointer-doubling step: L(v) ← min(L(v), L(L(v))). Every label
    VALUE is itself a vertex id in the labels table (labels are mins
    over member ids), so one self-equi-join looks up the label's own
    label. Alternating this with the neighbor-min hop makes reach grow
    exponentially — O(log diameter) rounds instead of O(diameter)
    (classic CC-in-MapReduce pointer jumping, cf. Kiveris et al.
    "Connected Components in MapReduce and Beyond" §large-star) —
    which is what turned the bridged chain-of-cliques graphs in the
    sf0.1 corpus (observed 12-hop reach) from 6 materializations into
    3-4. Left join + coalesce: a fixpoint label maps to itself, never
    missing, but safety beats an inner join dropping rows."""
    parent = labels.select(F.col("id").alias("label"),
                           F.col("label").alias("_grand"))
    return (
        labels.join(parent, "label", "left")
        .select(
            "id",
            F.least(F.col("label"),
                    F.coalesce("_grand", "label")).alias("label"),
        )
    )


def _driver_union_find(spark, pdf, id_type) -> DataFrame:
    """Small-graph short-circuit: resolve connected components with a
    driver-side union-find over the collected (src, dst) PAIR list —
    undirected, one row per edge; the caller does not symmetrize
    (union-find needs each edge once, so collecting the symmetric form
    would double the transfer for nothing). Union-by-min (the larger
    root is linked under the smaller) makes every root the MINIMUM id
    of its component — byte-identical semantics to the distributed
    hash-min fixpoint, pytest-pinned equal. Path compression keeps it
    near-linear; a few million edges resolve in seconds where the
    iterative Spark path pays ~3 shuffles + a checkpoint
    materialization PER ROUND in job-scheduling floor."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    srcs = pdf["src"].tolist()
    dsts = pdf["dst"].tolist()
    for a, b in zip(srcs, dsts):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # larger root under smaller → root = min id
    from pyspark.sql.types import StructField, StructType

    vertices = dict.fromkeys(srcs)
    vertices.update(dict.fromkeys(dsts))
    rows = [(v, find(v)) for v in vertices]
    schema = StructType([StructField("id", id_type),
                         StructField("cluster_id", id_type)])
    # single-slice parallelize (r9, the tables.tiny_table rationale):
    # the default createDataFrame spreads these driver-local rows over
    # defaultParallelism mostly-empty Python partitions, and EVERY
    # downstream consumer of the cluster table (losers filter, score
    # join, keeper anti-join) re-evaluates them — one Python-worker
    # round-trip per partition per consumer. One slice, one round-trip
    # (~12 % off neardup_dedup_quality at sf0.1, A/B'd warm).
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def neardup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                     max_iter: int = 20,
                     driver_edge_threshold: int = 1_000_000) -> DataFrame:
    """Connected components over a near-duplicate pair graph:
    (id, cluster_id) for every id appearing in ``pairs``, where
    cluster_id is the MINIMUM id reachable through the pair relation —
    so A~B, B~C places all of {A,B,C} in cluster min(A,B,C) even though
    A and C were never paired directly. The deterministic survivor of
    each cluster is its cluster_id (min id — same convention as
    exact_duplicates.keep_id; reference analog: the keep='first'
    semantics of drop_duplicates, gpt_intent_classifier.py:782,
    generalized from equality groups to the similarity graph).

    Algorithm: hash-min label propagation WITH pointer doubling —
    every vertex starts labelled with min(self, neighbors) (the seeded
    init: one free hop in the same shuffle the plain init would cost);
    each iteration then runs one neighbor-min hop (_propagate_round)
    followed by one label-compression step (_compress_labels:
    L(v) ← min(L(v), L(L(v)))), and converges when the exact label sum
    stops changing across an iteration. The hop alone needs
    diameter-many rounds; alternating with compression the reach
    roughly DOUBLES per round, so rounds = O(log diameter) — measured
    on the sf0.1 pair graph (chains bridged by prefix cliques, 12-hop
    reach): 4 rounds instead of 6 three-hop iterations. Everything is
    equi-joins + groupBy.min (plan-gated against CartesianProduct in
    tests/test_physical_plans.py): per round, one shuffle to deliver
    neighbor labels, one to re-key, one label self-join — all on
    uniform id keys. Cliques (diameter 1 — the common near-dup case)
    are covered by the seed alone and converge in one confirming
    round; a graph still unconverged after ``max_iter`` iterations
    raises rather than returning silently-wrong clusters.

    Scale notes (100 TB): the vertex set is only the DUPLICATE
    CANDIDATES (ids in pairs), a small fraction of the corpus. Labels
    are localCheckpoint()ed each round — without truncation the lazy
    plan doubles per iteration and Catalyst analysis blows up long
    before data does. On a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` (HDFS-
    backed, survives executor loss); localCheckpoint is the right call
    in local mode and keeps this function side-effect free.
    """
    p = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).persist()  # re-joined every round on the distributed path
    # Size-gated driver short-circuit: the candidate graph is usually
    # MUCH smaller than the corpus (dup candidates only). Below the
    # threshold (expressed in symmetric-edge rows for compatibility;
    # the probe gates on pair rows = threshold/2, the same boundary),
    # a driver-side union-find returns the identical min-id components
    # without the per-round shuffle + checkpoint floor of the
    # iterative path — the same small-graph fallback real CC systems
    # use. r9: ONE limit-probe collect replaces the old count-then-
    # collect two-job gate — if the probe comes back within the
    # threshold it IS the full (unsymmetrized) edge list, so the gate
    # and the transfer share a single evaluation of the pair subtree;
    # the old form also symmetrized BEFORE the gate, which put the
    # lazy pair-generator subtree (band join + dedup + verify) in BOTH
    # union branches and evaluated it twice per count. The distributed
    # path below symmetrizes from the persisted pair cache instead
    # (and takes over past the threshold; forced in tests via
    # driver_edge_threshold=0).
    pair_thr = driver_edge_threshold // 2
    head = p.limit(pair_thr + 1).toPandas()
    if len(head) <= pair_thr:
        try:
            return _driver_union_find(
                pairs.sparkSession, head, pairs.schema[id_a].dataType
            )
        finally:
            p.unpersist()
    edges = p.unionAll(
        p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Seeded init: label0(v) = min(v, min(neighbors(v))) — the state
    # after one propagation hop from self-labels, computed in the SAME
    # single shuffle the old distinct() init cost (sym is symmetric,
    # so every vertex appears as src). One full hop of reach for free.
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_nbr_min"))
        .select("id", F.least("id", "_nbr_min").alias("label"))
        .localCheckpoint()
    )
    try:
        # Monotone-sum convergence: every hop can only DECREASE a
        # vertex's label (min over neighbors ∪ self), so the exact sum
        # of all labels is strictly decreasing until the fixpoint —
        # sum unchanged across a full iteration ⟺ no vertex changed in
        # any of its hops ⟺ converged. One tiny agg job per iteration
        # on the just-checkpointed table replaces the old per-label
        # comparison; decimal(38,0) keeps the sum exact (no long
        # overflow at 10^12 ids under ANSI mode, no FP rounding).
        # Non-INTEGRAL ids can't ride the exact sum: string labels
        # cast to null (every iteration would compare None==None,
        # "converging" after ONE round no matter the graph), and
        # float/double labels ROUND on the decimal(38,0) cast — a
        # label move like 2.6→2.5 can leave the rounded sum unchanged
        # and return early with wrong clusters. Both route through the
        # sum(xxhash64(label)) witness instead: labels still only move
        # toward the fixpoint, so "some label changed" ⟺ the hash
        # multiset changed, detected unless the 64-bit sums collide.
        numeric_labels = isinstance(
            labels.schema["label"].dataType, IntegralType
        )

        def _label_sum(lb) -> str:
            if numeric_labels:
                expr = F.sum(F.col("label").cast("decimal(38,0)"))
            else:
                expr = F.sum(F.xxhash64("label").cast("decimal(38,0)"))
            return str(lb.agg(expr.alias("s")).collect()[0]["s"])

        prev_sum = _label_sum(labels)
        for _it in range(max_iter):
            # One neighbor-min hop + one pointer-doubling compression
            # per materialization: reach grows ~2x per round, so even
            # long bridged chains converge in O(log diameter) rounds,
            # while diameter-1 cliques (already covered by the seeded
            # init) finish in one confirming round + one agg. The
            # convergence witness is unchanged: both steps only ever
            # DECREASE labels, and a round that changes nothing is
            # stable under hop AND compression — labels constant along
            # every edge — i.e. the per-component min fixpoint.
            stepped = _compress_labels(_propagate_round(edges, labels))
            labels = stepped.localCheckpoint()
            cur_sum = _label_sum(labels)
            if cur_sum == prev_sum:
                return labels.select("id", F.col("label").alias("cluster_id"))
            prev_sum = cur_sum
        raise RuntimeError(
            f"neardup_clusters: not converged after {max_iter} "
            "hop+compress rounds — with reach doubling per round this "
            "means astronomically long paths or a cycle in the edge "
            "construction; raise max_iter only after checking the "
            "pair generator"
        )
    finally:
        p.unpersist()


def neardup_dedup(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  id_a: str = "id_a", id_b: str = "id_b",
                  max_iter: int = 20, survivor: str = "min_id",
                  score_col: str | None = None,
                  driver_edge_threshold: int = 1_000_000,
                  clusters: DataFrame | None = None) -> DataFrame:
    """The dedup DECISION applied: one surviving row per connected
    component of the pair graph, all of ``docs``' columns preserved,
    non-candidates untouched. A~B, B~C ⇒ exactly one of {A,B,C}
    survives. The anti-join side is the loser set (duplicate
    candidates minus survivors) — far smaller than the corpus, so AQE
    broadcasts it when it fits.

    Survivor policies (reference analog: the keep= semantics of
    drop_duplicates, gpt_intent_classifier.py:782, generalized from
    equality groups to the similarity graph):

      survivor="min_id"      — deterministic min doc id (default).
      survivor="best_score"  — the member with the HIGHEST value of
          ``score_col`` (a numeric column on ``docs``, e.g. a text
          length or textstats.quality_score), ties broken by min id —
          what a real training-data pipeline keeps. Resolved with one
          partial-aggregating groupBy over a min-of-struct
          (−score, id) — map-side combinable, no window sort; the
          score lookup joins the candidates-only cluster table against
          the corpus (AQE broadcasts the small side).

    ``clusters`` (round-9 perf): pass a precomputed
    neardup_clusters(pairs) result to reuse it instead of resolving
    the components again — callers that need BOTH the cluster table
    and the deduped corpus (e.g. jobs/prepare_corpus: clusters key the
    leakage-safe split) were paying the full pair-generation +
    resolution twice. Identical output by construction (the argument
    replaces an identical internal call).
    """
    if clusters is None:
        clusters = neardup_clusters(pairs, id_a, id_b, max_iter,
                                    driver_edge_threshold)
    if survivor == "min_id":
        losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(id_col)
        )
    elif survivor == "best_score":
        if score_col is None:
            raise ValueError("survivor='best_score' requires score_col")
        scored = clusters.join(
            docs.select(F.col(id_col).alias("id"),
                        F.col(score_col).cast("double").alias("_s")),
            "id",
        )
        keep = (
            scored.groupBy("cluster_id")
            .agg(F.min(F.struct((-F.col("_s")).alias("neg_s"),
                                F.col("id").alias("id"))).alias("_b"))
            .select(F.col("_b.id").alias("id"))
        )
        losers = clusters.join(keep, "id", "left_anti").select(
            F.col("id").alias(id_col)
        )
    else:
        raise ValueError(f"unknown survivor policy: {survivor!r}")
    return docs.join(losers, id_col, "left_anti")


# ------------------------------------------------------------------ simhash

def earliest_per_window(df: DataFrame, ts_col: str, key_cols: list[str],
                        window: str = "1 day") -> DataFrame:
    """Earliest-wins dedup within an event-time window: one row per
    (key, window), the survivor being the row with the MINIMUM event
    time, ties broken lexicographically over the remaining columns —
    fully deterministic regardless of arrival or partition order.

    The reduction is ``min(struct(ts, payload...))``: a declarative
    JVM aggregate with a map-side partial min, so the whole operator
    is ONE shuffle on uniform (key, window) keys and the per-group
    state is a single struct. The same expression runs unchanged on a
    watermarked STREAMING frame (streaming/validate_stream.
    dedup_stream_earliest wraps it) — which is the point: Structured
    Streaming's dropDuplicatesWithinWatermark keeps an arbitrary
    first-OBSERVED row, while an ordered min-reduction cannot be
    swayed by micro-batch arrival order.

    Null ``ts_col`` rows are dropped (Spark orders null structs first
    in min while SQL engines default NULLS LAST — excluding them keeps
    the semantics engine-portable; a null event time has no place in
    an event-time dedup anyway). Null PAYLOAD fields can still appear
    on equal-ts ties: Spark's struct ordering sorts a null field
    BEFORE any value, i.e. NULLS FIRST — a SQL oracle replicating the
    survivor must say ``ORDER BY ts, payload NULLS FIRST`` explicitly
    (engines default to NULLS LAST in ascending ORDER BY).
    """
    payload = [c for c in df.columns if c != ts_col and c not in key_cols]
    best = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.window(ts_col, window).alias("_win"), *key_cols)
        .agg(F.min(F.struct(F.col(ts_col), *[F.col(c) for c in payload]))
             .alias("_b"))
    )
    return best.select(
        F.col("_win"),
        *key_cols,
        F.col(f"_b.{ts_col}").alias(ts_col),
        *[F.col(f"_b.{c}").alias(c) for c in payload],
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over token hashes.

    Token→int64 hashing is JVM-side (xxhash64 inside a transform); only
    the hash arrays cross to Python, where one Arrow batch does the bit
    voting fully vectorized: unpack all 64 bits of all token hashes with
    numpy, sum ±1 votes per bit, sign → bit. Near-dup pair generation
    buckets on 16-bit bands (4 tables → any pair with Hamming ≤ 3 shares
    a band, by pigeonhole)."""

    @pandas_udf(LongType())
    def sh(hashes: pd.Series) -> pd.Series:
        # Whole-batch vectorization: one (total_tokens, 64) bit unpack,
        # per-doc vote sums via a single segmented reduce, then 64
        # vectorized bit-set passes across all docs. Python touches rows
        # only to assemble the ragged arrays.
        flat, starts, nz, lens = _ragged_segments(hashes)
        out = np.zeros(len(hashes), dtype=np.uint64)
        if flat is not None:
            # (T, 64) bit matrix via byte unpack (little-endian per byte)
            bits = np.unpackbits(
                flat.view(np.uint8).reshape(len(flat), 8), axis=1, bitorder="little"
            )
            sums = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)  # (D, 64)
            votes = 2 * sums - lens[nz][:, None]
            simbits = votes > 0
            sig = np.zeros(len(starts), dtype=np.uint64)
            for b in range(64):  # per-bit, vectorized over docs
                sig |= simbits[:, b].astype(np.uint64) << np.uint64(b)
            out[nz] = sig
        return pd.Series(out.astype(np.int64))

    tok_hashes = F.transform(F.array_distinct(tokens(text_col)), lambda t: F.xxhash64(t))
    return docs.select(F.col(id_col).alias("id"), sh(tok_hashes).alias("simhash"))


def _simhash_banded(docs: DataFrame, id_col: str, text_col: str,
                    sh: DataFrame | None = None) -> DataFrame:
    """(id, simhash, tbl, key): the 4×16-bit band table rows behind
    both the self-join pair generator and the persisted index — by
    pigeonhole any pair within Hamming ≤ 3 shares at least one band.
    Null/blank-text docs are excluded (they all simhash to 0 → hamming
    0 between *distinct* docs, same rationale as minhash_lsh_pairs).

    ``sh`` (round-9 perf): a precomputed (id, simhash) frame — band
    rows derive from it without re-running the token-hash kernel (the
    self-join caller materializes once, derives both sides)."""
    if sh is None:
        docs = docs.filter(F.size(tokens(text_col)) > 0)
        sh = simhash64(docs, id_col, text_col)
    return sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("tbl"),
                    F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("id", "simhash", F.col("b.tbl").alias("tbl"), F.col("b.key").alias("key"))


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Candidate pairs by 16-bit prefix tables, verified by popcount of
    xor (bit_count is JVM-side). Round-9: the signatures materialize
    once (localCheckpoint) and both self-join sides derive from them —
    the lazy self-join ran the token-hash kernel twice — and the
    Hamming verify + filter run per collision BEFORE the pair dedup
    (identical per band, so distinct() over the triple equals the old
    dedup-then-verify rows; same transformation as minhash_lsh_pairs)."""
    d = docs.filter(F.size(tokens(text_col)) > 0)
    sh = simhash64(d, id_col, text_col).localCheckpoint()
    banded = _simhash_banded(None, id_col, text_col, sh=sh)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
    )
    return cand.filter(F.col("hamming") <= max_hamming).distinct()


# --------------------------------- cross-corpus SimHash index
#
# Fourth incremental-ingest modality (exact digests, MinHash bands,
# embedding LSH are the others): persist the 4×16-bit SimHash band
# rows (id, simhash, tbl, key) — 4 rows × ~20 bytes/doc — and probe
# with one (tbl, key) equi-join streamed from the batch, verified by
# JVM bit_count on the stored 64-bit signatures. Same manifest
# discipline as the MinHash index.


def build_simhash_index(docs: DataFrame, path: str,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> dict:
    """Persist the standing corpus' SimHash band rows as a probe-able
    index under ``path``/tables (parquet partitioned by tbl) plus the
    manifest. One corpus scan; texts never leave it."""
    import os

    banded = _simhash_banded(docs, id_col, text_col)
    banded.write.mode("overwrite").partitionBy("tbl").parquet(
        os.path.join(path, "tables"))
    spark = docs.sparkSession
    n_docs = (
        spark.read.parquet(os.path.join(path, "tables"))
        .select("id").distinct().count()
    )
    params = {"kind": "simhash", "id_col": id_col, "text_col": text_col}
    return _write_mh_manifest(path, params, n_docs, 0, [])


def simhash_pairs_against_index(spark, path: str, new_docs: DataFrame,
                                max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs between an ingest batch and the
    PERSISTED index: (id_new, id_indexed, hamming ≤ max_hamming).
    Batch band rows equi-join the index on (tbl, key); the Hamming
    verify is bit_count(xor) on the stored signatures. Within-index
    pairs are never re-emitted and a re-ingested id never pairs with
    itself — same contract as pairs_against_index."""
    import os

    m = _read_mh_manifest(path)
    banded_new = _simhash_banded(new_docs, m["id_col"], m["text_col"])
    idx = spark.read.parquet(os.path.join(path, "tables"))
    n, i = banded_new.alias("n"), idx.alias("i")
    # verify + filter per collision before the pair dedup (round-9,
    # same transformation as pairs_against_index)
    hamming = F.bit_count(
        F.col("n.simhash").bitwiseXOR(F.col("i.simhash")))
    cand = (
        n.join(
            i,
            (F.col("n.tbl") == F.col("i.tbl"))
            & (F.col("n.key") == F.col("i.key"))
            & (F.col("n.id") != F.col("i.id")),
        )
        .select(
            F.col("n.id").alias("id_new"),
            F.col("i.id").alias("id_indexed"),
            hamming.alias("hamming"),
        )
    )
    return cand.filter(F.col("hamming") <= max_hamming).distinct()


def append_to_simhash_index(spark, path: str, new_docs: DataFrame) -> dict:
    """Fold an ingest batch into the SimHash index: append its band
    rows into the tbl partitions and bump the manifest counts."""
    import os

    m = _read_mh_manifest(path)
    banded = _simhash_banded(
        new_docs, m["id_col"], m["text_col"]).persist()
    n_new = banded.select("id").distinct().count()
    banded.write.mode("append").partitionBy("tbl").parquet(
        os.path.join(path, "tables"))
    banded.unpersist()
    params = {k: m[k] for k in ("kind", "id_col", "text_col")}
    return _write_mh_manifest(
        path, params, m["n_docs"] + n_new, m["n_appends"] + 1,
        m["append_counts"] + [n_new])


# ------------------------------------------- substring-window exact dedup

def _token_windows(docs: DataFrame, k: int, id_col: str, text_col: str,
                   keep_text: bool = False) -> DataFrame:
    """(id, win_index, win_hash[, win]): every k-token window of the
    lowercased whitespace-tokenized text, positionally indexed.
    Documents with fewer than k tokens (or blank text) emit nothing —
    a window that cannot exist cannot be duplicated.

    The window array is built with the let-bound HOF idiom (see
    ``shingles``): binding the token array once keeps construction
    O(w) instead of Catalyst re-inlining the lower/trim/split chain
    per window (O(w^2) on long docs). Windows hash to 64-bit xxhash64
    immediately — at corpus scale the 8-byte key travels, never the
    window string (``keep_text`` re-attaches it for tests/oracles)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def body(t):
        nwin = F.size(t) - (k - 1)
        win = lambda i: F.array_join(F.slice(t, i, k), " ")
        return F.when(nwin <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(F.sequence(F.lit(1), nwin), win)
        )

    wins = F.element_at(F.transform(F.array(toks), body), 1)
    out = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.posexplode(wins).alias("win_index", "_win"))
        .select(
            id_col,
            "win_index",
            F.xxhash64("_win").alias("win_hash"),
            *(["_win"] if keep_text else []),
        )
    )
    return out.withColumnRenamed("_win", "win") if keep_text else out


def _flagged_windows(docs: DataFrame, k: int, id_col: str, text_col: str):
    """(occurrences, flagged-occurrences) of k-token windows shared by
    more than one distinct document. Shared shape with
    paragraph_duplicates one level down: distinct on (id, hash) → ONE
    shuffle on a uniform composite key; per-hash distinct-doc count is
    map-side combinable; the duplicated-hash dimension is tiny vs the
    corpus and AQE broadcasts it back onto occurrences.

    The occurrence table materializes ONCE (r9): its lazy subtree —
    the token split + per-window construction + explode + hash, the
    whole heavy pass — is consumed by up to five subplans downstream
    (the sharing aggregation, the per-doc totals, the flagged counts,
    the run/island windows), and nothing in those shapes lets Spark
    reuse an Exchange between them, so each one re-ran the pass.
    Checkpointed rows are (id, win_index, win_hash) — 24 B per token
    occurrence, the same order as the sharing shuffle this feeds.
    Cluster form: setCheckpointDir + .checkpoint(), as in
    neardup_clusters."""
    occ = _token_windows(docs, k, id_col, text_col).localCheckpoint()
    shared = (
        occ.select(id_col, "win_hash").distinct()
        .groupBy("win_hash")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("win_hash")
    )
    return occ, occ.join(shared, "win_hash", "left_semi")


def duplicate_window_stats(docs: DataFrame, k: int = 8,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Exact substring-level duplication profile — Lee et al.
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) ExactSubstr at k-token-window grain: the dedup
    modality BETWEEN whole-doc/near-dup (doc grain) and
    paragraph_duplicates (paragraph grain). Per document:

      n_windows          total k-token windows
      n_dup_windows      windows whose exact text occurs in >1 doc
      dup_window_ratio   n_dup / n_windows, rounded to 6 places
      max_dup_token_run  longest contiguous duplicated stretch in
                         TOKENS (run of r consecutive flagged windows
                         covers r + k - 1 tokens); 0 if none — the
                         Lee et al. "50-token duplicate substring"
                         threshold reads directly off this column.

    Scale shape (100 TB): one uniform-key shuffle for sharing counts
    (see _flagged_windows); the run detection is a gaps-and-islands
    row_number over (doc, win_index) — partitioned BY DOCUMENT, i.e.
    billions of small groups, never a single-task global window."""
    occ, flagged = _flagged_windows(docs, k, id_col, text_col)
    base = occ.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    dupc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_dup"))
    w = Window.partitionBy(id_col).orderBy("win_index")
    runs = (
        flagged.withColumn("_grp", F.col("win_index") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy(id_col)
        .agg(F.max("_run").alias("_max_run"))
    )
    return (
        base.join(dupc, id_col, "left")
        .join(runs, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("_n_dup", F.lit(0)).alias("n_dup_windows"),
            F.round(
                F.coalesce("_n_dup", F.lit(0)) / F.col("n_windows"), 6
            ).alias("dup_window_ratio"),
            F.coalesce(F.col("_max_run") + F.lit(k - 1), F.lit(0))
            .cast("long")
            .alias("max_dup_token_run"),
        )
    )


def duplicate_token_spans(docs: DataFrame, k: int = 8,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Actionable output of substring dedup: per document, the MERGED
    token intervals covered by cross-doc duplicated k-token windows —
    (id, start_token, end_token, n_windows) with end exclusive, i.e.
    tokens[start:end] is the duplicated stretch a cleaner would cut
    (Lee et al. remove these ranges when end-start >= 50).

    Two flagged windows [i, i+k) and [j, j+k), i<j, merge iff j <= i+k
    (overlapping or exactly adjacent). All intervals share length k,
    so the running-max-end island test collapses to a lag gap test:
    a new island starts when win_index - lag(win_index) > k. One
    per-document window pass — billions of small groups at scale."""
    _, flagged = _flagged_windows(docs, k, id_col, text_col)
    return _merge_islands(flagged, k, id_col)


def _merge_islands(flagged: DataFrame, k: int, id_col: str) -> DataFrame:
    """Merge a set of (id, win_index) window occurrences into maximal
    token intervals (id, start_token, end_token, n_windows), end
    exclusive. Gaps-and-islands over a per-DOCUMENT window."""
    w = Window.partitionBy(id_col).orderBy("win_index")
    return (
        flagged.select(id_col, "win_index")
        .withColumn("_prev", F.lag("win_index").over(w))
        .withColumn(
            "_new_island",
            F.when(
                F.col("_prev").isNull()
                | (F.col("win_index") - F.col("_prev") > k),
                1,
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(id_col, "_island")
        .agg(
            F.min("win_index").alias("start_token"),
            (F.max("win_index") + F.lit(k)).cast("long").alias("end_token"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, F.col("start_token").cast("long"), "end_token",
                "n_windows")
    )


def duplicate_cut_intervals(docs: DataFrame, k: int = 8,
                            min_run_tokens: int = 50,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """The cut list ExactSubstr removal acts on: merged token intervals
    (id, start_token, end_token, n_windows) of NON-keeper duplicated
    windows (the globally-first occurrence per window is exempt),
    filtered to >= min_run_tokens tokens. Persist this as the removal
    audit artifact; feed it back to strip_duplicate_windows via
    ``cuts`` to avoid recomputing the window pass."""
    _, flagged = _flagged_windows(docs, k, id_col, text_col)
    keep = flagged.groupBy("win_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("win_index"))).alias("_first")
    )
    nonkeeper = (
        flagged.join(keep, "win_hash")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("win_index") == F.col("_first.win_index"))
            )
        )
        .select(id_col, "win_index")
    )
    return _merge_islands(nonkeeper, k, id_col).filter(
        F.col("end_token") - F.col("start_token") >= min_run_tokens
    )


def strip_duplicate_windows(docs: DataFrame, k: int = 8,
                            min_run_tokens: int = 50,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            cuts: DataFrame | None = None) -> DataFrame:
    """The dedup DECISION at substring grain — Lee et al. ExactSubstr
    removal: cut every duplicated token stretch of at least
    ``min_run_tokens`` tokens (their published threshold is 50) EXCEPT
    its globally-first occurrence, and rebuild each document from its
    surviving tokens. Returns (id, text) for EVERY input document.

    Keeper semantics: per duplicated window, the keeper is the global
    min (id, win_index) occurrence — the same first-occurrence
    convention as strip_duplicate_paragraphs. Cut intervals are the
    merged islands of NON-keeper duplicated windows (so the doc
    holding the first occurrence keeps its stretch), filtered to
    >= min_run_tokens tokens; sub-threshold duplication is left alone
    (short shared phrases are language, not boilerplate).

    Matching is case/whitespace-insensitive (windows come from the
    lowercased tokenization) but the rebuild preserves the ORIGINAL
    token casing — positions align because both views split the same
    text on whitespace. Inter-token whitespace is canonicalized to a
    single space even in untouched documents (run-idempotent on a
    fixed corpus the same way paragraph strip is).

    Scale shape: keeper selection is a map-side-combinable
    min(struct) groupBy on the uniform window hash; cut intervals per
    doc are FEW (bounded by text length / min_run_tokens), so the
    rebuild re-attaches them as a per-doc array via one equi-join and
    filters tokens with a positional HOF lambda — no explode of the
    token stream, no range join. Pass a precomputed/persisted
    ``cuts`` frame (duplicate_cut_intervals output) to skip the
    window pass — the job surface writes the cut audit once and
    rebuilds from the written artifact."""
    if cuts is None:
        cuts = duplicate_cut_intervals(
            docs, k, min_run_tokens, id_col, text_col)
    cuts = cuts.groupBy(id_col).agg(
        F.collect_list(F.struct("start_token", "end_token")).alias("_cuts")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")  # original casing
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_cuts"),
            lambda c: (i >= c["start_token"]) & (i < c["end_token"]),
        ),
    )
    rebuilt = F.when(F.col("_cuts").isNull(), F.array_join(toks, " ")).otherwise(
        F.array_join(kept, " ")
    )
    return docs.join(cuts, id_col, "left").select(
        F.col(id_col), F.coalesce(rebuilt, F.lit("")).alias(text_col)
    )
