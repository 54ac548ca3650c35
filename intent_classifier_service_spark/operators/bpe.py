"""Byte-pair-encoding tokenizer training primitives (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909) — the vocabulary side of a training-data pipeline:
before a corpus is packed into sequences, someone has to TRAIN the
tokenizer on it.

Scale shape (the reason this belongs in a Spark engine): the corpus is
touched exactly ONCE, to build the word histogram (one scan, one
map-side-combinable groupBy on the word — uniform key, |V| << corpus
tokens). Every merge-counting round after that runs over the VOCAB
table, which is orders of magnitude smaller than the corpus — the same
factoring every production BPE trainer uses, expressed as DataFrame
ops. Pair extraction is shift-and-zip over the symbol array (zero
windows, zero explode-before-count skew), and the per-round merge
rewrite is an Arrow-batched pandas pass over vocab rows only —
explicitly NOT the corpus hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END_OF_WORD = "</w>"

# Words longer than this are dropped from the histogram: a 10^6-char
# "word" (binary garbage, base64 blobs) would otherwise materialize a
# 10^6-element symbol array per occurrence. Real trainers cap the same
# way; the mass lost is noise by construction.
MAX_WORD_LEN = 100


def word_counts(docs: DataFrame, text_col: str = "text",
                max_word_len: int = MAX_WORD_LEN) -> DataFrame:
    """(word, count): lowercase whitespace-token histogram — the ONE
    corpus-wide pass of BPE training."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(toks).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(word=None):
    """Character symbols + end-of-word marker: 'low' -> [l, o, w, </w>].
    regexp_extract_all('.') is the engine-portable char split (shared
    with the DuckDB oracle)."""
    word = F.col("word") if word is None else word
    return F.concat(
        F.regexp_extract_all(word, F.lit("."), 0),
        F.array(F.lit(END_OF_WORD)),
    )


def pair_counts(vocab: DataFrame, syms_col: str = "syms",
                count_col: str = "count") -> DataFrame:
    """(left_sym, right_sym, pair_count) over a (syms, count) vocab
    frame: adjacent symbol pairs weighted by word frequency. Pairs come
    from zipping the symbol array with its own shift —
    slice(s,1,n-1) x slice(s,2,n-1) — so no window function and no
    per-position explode until the (pair, count) rows, which aggregate
    map-side."""
    s = F.col(syms_col)
    n = F.size(s)
    pairs = F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.zip_with(
            F.slice(s, 1, n - 1),
            F.slice(s, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), F.col(count_col))
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum(count_col).alias("pair_count"))
    )


def bpe_merge_candidates(docs: DataFrame, top_n: int = 50,
                         text_col: str = "text") -> DataFrame:
    """The first BPE merge round, as a query: the top-N adjacent
    character-pair counts over the corpus vocabulary, deterministically
    ordered (count desc, then left/right symbol) — what a tokenizer
    trainer would merge first. One corpus scan + vocab-sized pair agg;
    the top-N is a TakeOrderedAndProject, never a global sort."""
    wc = word_counts(docs, text_col).withColumn("syms", _initial_symbols())
    return (
        pair_counts(wc)
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(top_n)
    )


def _merge_pair_in_syms(left: str, right: str):
    """Arrow-batched greedy left-to-right merge of one (left, right)
    pair inside symbol sequences — the per-round vocab rewrite. Runs
    over VOCAB rows only (documented scale contract: |V| rows, short
    arrays), which is why a pandas pass is the honest choice here —
    the corpus never flows through it."""
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def _merge(syms: pd.Series) -> pd.Series:
        def one(s):
            out, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(one)

    return _merge


def train_bpe(docs: DataFrame, num_merges: int, text_col: str = "text",
              checkpoint_every: int = 8) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``num_merges`` BPE merges: returns (merge list in order,
    final vocab frame (word, count, syms)). Each round counts pairs
    over the vocab frame, takes the single best pair (max count, ties
    broken lexicographically — the deterministic convention), and
    rewrites the vocab's symbol arrays. The corpus is read once; every
    round after is vocab-sized. The vocab lineage is truncated with
    localCheckpoint every ``checkpoint_every`` rounds (same discipline
    as neardup_clusters' iterative fixpoint).

    Not SQL-expressible as one query (iterative, data-dependent);
    pinned against a pure-Python reference trainer in tests
    (tests/test_bpe.py) instead of a DuckDB oracle."""
    vocab = (
        word_counts(docs, text_col)
        .withColumn("syms", _initial_symbols())
        .persist()
    )
    vocab.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["left_sym"], best[0]["right_sym"]
        merges.append((left, right))
        new_vocab = vocab.withColumn(
            "syms", _merge_pair_in_syms(left, right)(F.col("syms"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_vocab = new_vocab.localCheckpoint(eager=True)
        else:
            new_vocab = new_vocab.persist()
            new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
    return merges, vocab


def apply_merges(docs: DataFrame, merges: list[tuple[str, str]],
                 id_col: str = "doc_id", text_col: str = "text",
                 keep_tokens: bool = False) -> DataFrame:
    """Encode a corpus with a trained merge list: (id, n_subword_tokens
    [, subword_tokens]) — the apply side of train_bpe, i.e. the EXACT
    subword count corpus_token_budget approximates with its regex
    estimate. Standard rank-greedy BPE encode: repeatedly merge the
    lowest-rank pair present in the word until none remains.

    Scale shape: embarrassingly parallel — one mapInPandas pass, zero
    shuffle, nothing leaves the partition. The per-batch word->encoding
    cache exploits Zipf (a few thousand distinct words cover most
    tokens), so the Python kernel runs per DISTINCT word per batch,
    not per token. (Real deployments swap this seam for a native
    tokenizer; the pipeline shape — broadcast merge table, stateless
    projection — is the part that matters at 100 TB.)"""
    ranks = {pair: i for i, pair in enumerate(merges)}
    import pyspark.sql.types as T

    out_fields = [
        next(f for f in docs.schema.fields if f.name == id_col),
        T.StructField("n_subword_tokens", T.LongType()),
    ]
    if keep_tokens:
        out_fields.append(
            T.StructField("subword_tokens", T.ArrayType(T.StringType())))
    schema = T.StructType(out_fields)

    def encode_word(word, cache):
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END_OF_WORD]
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for p in zip(syms, syms[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, p
            if best_pair is None:
                break
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best_pair):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    def run(batches):
        for pdf in batches:
            cache: dict = {}
            ids, counts, toks = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = str(text).lower().split() if text is not None else []
                enc: list[str] = []
                for w in words:
                    if len(w) > MAX_WORD_LEN:
                        continue
                    enc.extend(encode_word(w, cache))
                ids.append(did)
                counts.append(len(enc))
                if keep_tokens:
                    toks.append(enc)
            data = {id_col: ids, "n_subword_tokens": counts}
            if keep_tokens:
                data["subword_tokens"] = toks
            yield pd.DataFrame(data)

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
