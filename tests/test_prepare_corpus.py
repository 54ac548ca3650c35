"""End-to-end corpus preparation job (jobs/prepare_corpus.py): the
composition of quality gate → exact/near dedup → leakage-safe split →
token budget → token mixture → packing, with every stage invariant
asserted on the real sf0.01 documents table."""

import os

from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import dedup
from jobs import prepare_corpus

SF = "/root/testdata/sf0.01"


def test_prepare_corpus_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "prep")
    cap = 48  # small enough that some docs overflow into chunks
    summary = prepare_corpus.run(
        spark, docs, out, max_tokens=cap,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        neardup=True,
    )
    assert summary["n_input_docs"] == docs.count()

    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    n_corpus = corpus.count()
    assert n_corpus == (summary["n_input_docs"]
                        - summary["n_exact_dup_dropped"]
                        - summary["n_neardup_dropped"])
    assert summary["n_neardup_dropped"] > 0  # datagen plants near-dups

    # dedup really resolved: no surviving LSH pair has BOTH members
    pairs = dedup.minhash_lsh_pairs(docs.select("doc_id", "text"))
    kept = corpus.select("doc_id")
    both = (pairs.join(kept.withColumnRenamed("doc_id", "id_a"), "id_a")
            .join(kept.withColumnRenamed("doc_id", "id_b"), "id_b"))
    assert both.count() == 0

    # splits are complete and leakage-safe (cluster members co-assigned)
    assert corpus.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    clusters = dedup.neardup_clusters(pairs)
    straddle = (
        corpus.join(clusters.select(F.col("id").alias("doc_id"), "cluster_id"),
                    "doc_id")
        .groupBy("cluster_id").agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
    )
    assert straddle.count() == 0

    # budget table sums match the corpus exactly
    budget = spark.read.parquet(os.path.join(out, "budget"))
    assert budget.agg(F.sum("n_docs")).collect()[0][0] == n_corpus
    assert (budget.agg(F.sum("total_tokens")).collect()[0][0]
            == corpus.agg(F.sum("n_tokens")).collect()[0][0])

    # sequences: capacity respected; token conservation — packed tokens
    # equal the train split's tokens exactly (overflow docs come back
    # as chunks, nothing silently truncated)
    seqs = spark.read.parquet(os.path.join(out, "sequences"))
    assert seqs.filter(F.col("total_tokens") > cap).count() == 0
    train_tokens = corpus.filter(F.col("split") == "train") \
        .agg(F.sum("n_tokens")).collect()[0][0]
    assert summary["packed_tokens"] == train_tokens
    assert summary["n_overflow_docs_chunked"] > 0  # cap=48 forces chunking
    assert seqs.filter(F.col("from_overflow_chunks")).count() > 0
    # every packed unit id is unique (docs once; chunks once)
    units = seqs.select(F.explode("doc_ids").alias("u"))
    assert units.count() == units.distinct().count()


def test_prepare_corpus_mixture_quotas(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "prep")
    mix = {"en": 0.5, "de": 0.25, "zh": 0.25}
    summary = prepare_corpus.run(
        spark, docs, out, max_tokens=128,
        splits={"train": 1.0},  # everything train: quotas easy to pin
        mixture=mix, mixture_total_tokens=8000,
    )
    got = summary["mixture_tokens"]
    assert set(got) <= set(mix)  # unweighted langs excluded entirely
    # each selected lang lands in [quota, quota + one doc) or is the
    # whole lang (shortfall)
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    avail = {r["lang"]: r["t"] for r in
             corpus.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    max_doc = corpus.agg(F.max("n_tokens")).collect()[0][0]
    for lang, quota_w in mix.items():
        quota = int(8000 * quota_w / sum(mix.values()))
        if avail.get(lang, 0) <= quota:
            assert got.get(lang, 0) == avail.get(lang, 0)  # shortfall: all
        else:
            assert quota <= got[lang] < quota + max_doc


def test_prepare_corpus_strip_windows(spark, tmp_path):
    """--strip-dup-windows: a planted shared stretch is cut from every
    doc except the globally-first holder BEFORE tokens are counted; the
    cut audit lands in output/substring_cuts and the summary counts
    come from the written sink."""
    stretch = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"{stretch} tail1 tail2 tail3", "en"),
        (2, f"lead1 lead2 {stretch} tail4", "en"),
        (3, f"lead3 {stretch}", "en"),
        (4, "independent document body with its own words here", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "prep")
    summary = prepare_corpus.run(
        spark, docs, out, max_tokens=64, splits={"train": 1.0},
        strip_windows=True, window_k=4, min_run_tokens=8,
    )
    # docs 2 and 3 lose the 8-token stretch; doc 1 keeps it
    assert summary["n_substring_cut_docs"] == 2
    assert summary["n_substring_cut_intervals"] == 2
    cuts = spark.read.parquet(os.path.join(out, "substring_cuts"))
    got = {(r["doc_id"], r["start_token"], r["end_token"])
           for r in cuts.collect()}
    assert got == {(2, 2, 10), (3, 1, 9)}
    # token counts in the corpus reflect the REWRITTEN text
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    toks = {r["doc_id"]: r["n_tokens"] for r in corpus.collect()}
    assert toks[1] == 11  # untouched
    assert toks[2] == 3   # lead1 lead2 tail4
    assert toks[3] == 1   # lead3
    assert toks[4] == 8


def test_prepare_corpus_exact_subword_tokens(spark, tmp_path):
    """--bpe-merges: budget, mixture, and packing all run on the EXACT
    subword counts of a tokenizer trained on the train split (round-7
    verdict next-round #3) — packed_tokens equals the independently
    recomputed apply_merges total over the train docs, conservation
    exact; the merge table persists to output/tokenizer."""
    from intent_classifier_service_spark.operators import bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "prep")
    summary = prepare_corpus.run(
        spark, docs, out, max_tokens=96, splits={"train": 1.0},
        bpe_merges=8, bpe_hot_words=16,
    )
    assert summary["n_tokenizer_merges"] == 8

    # the persisted tokenizer artifact reproduces the merge list
    tok = spark.read.parquet(os.path.join(out, "tokenizer"))
    merges = [(r["left"], r["right"])
              for r in tok.orderBy("rank").collect()]
    assert len(merges) == 8

    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    # n_tokens IS the exact subword count: recompute independently via
    # apply_merges over the same corpus rows
    enc = bpe.apply_merges(
        docs.join(corpus.select("doc_id"), "doc_id", "left_semi"), merges)
    expect = {r["doc_id"]: r["n_subword_tokens"] for r in enc.collect()}
    got = {r["doc_id"]: r["n_tokens"] for r in corpus.collect()}
    assert got == expect
    # subword counts dominate whitespace counts (every word >= 1 piece)
    bad = corpus.filter(F.col("n_tokens") < F.col("n_ws_tokens")).count()
    assert bad == 0

    # conservation in EXACT subword units: packed == train total
    train_subword = corpus.agg(F.sum("n_tokens")).collect()[0][0]
    assert summary["packed_tokens"] == train_subword

    # budget table rolls up the exact counts
    budget = spark.read.parquet(os.path.join(out, "budget"))
    assert (budget.agg(F.sum("total_tokens")).collect()[0][0]
            == train_subword)


def test_prepare_corpus_tokenizer_roundtrip(spark, tmp_path):
    """--tokenizer: a second run loading the first run's persisted
    merge table produces byte-identical exact subword counts without
    retraining — the artifact round-trip a corpus refresh uses."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out1 = str(tmp_path / "run1")
    s1 = prepare_corpus.run(
        spark, docs, out1, max_tokens=96, splits={"train": 1.0},
        bpe_merges=8, bpe_hot_words=0,
    )
    out2 = str(tmp_path / "run2")
    s2 = prepare_corpus.run(
        spark, docs, out2, max_tokens=96, splits={"train": 1.0},
        tokenizer_path=os.path.join(out1, "tokenizer"),
    )
    assert s2["n_tokenizer_merges"] == s1["n_tokenizer_merges"] == 8
    assert "tokenizer_train" in s2["stage_secs"]  # load path stamped too
    c1 = {r["doc_id"]: r["n_tokens"] for r in
          spark.read.parquet(os.path.join(out1, "corpus")).collect()}
    c2 = {r["doc_id"]: r["n_tokens"] for r in
          spark.read.parquet(os.path.join(out2, "corpus")).collect()}
    assert c1 == c2
    assert s2["packed_tokens"] == s1["packed_tokens"]
    # the re-persisted merge table equals the loaded one, rank for rank
    t1 = [(r["rank"], r["left"], r["right"]) for r in
          spark.read.parquet(os.path.join(out1, "tokenizer"))
          .orderBy("rank").collect()]
    t2 = [(r["rank"], r["left"], r["right"]) for r in
          spark.read.parquet(os.path.join(out2, "tokenizer"))
          .orderBy("rank").collect()]
    assert t1 == t2

def test_prepare_corpus_ppl_gate(spark, tmp_path):
    """--max-ppl drops exactly the gibberish doc: a corpus of docs
    built from a small shared vocabulary plus ONE doc of
    corpus-unique tokens; the threshold is picked between the scored
    populations, so the gate's effect is fully determined."""
    from intent_classifier_service_spark.operators import textstats

    rows = [(i, "the cat sat on the mat near the door " * 3, "en")
            for i in range(12)]
    # keep two exact-identical rows apart so dedup still has work
    rows.append((100, "zxq wvu tsr qpo nml kji hgf edc ba " * 2, "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    scores = {r["id"]: r["ppl"]
              for r in textstats.lm_doc_scores(docs).collect()}
    normal_max = max(v for k, v in scores.items() if k != 100)
    assert scores[100] > normal_max  # gibberish really ranks worse
    thr = (scores[100] + normal_max) / 2

    out = str(tmp_path / "prep")
    summary = prepare_corpus.run(
        spark, docs, out, max_tokens=64, max_ppl=thr,
        splits={"train": 1.0})
    assert summary["n_ppl_dropped"] == 1
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    assert corpus.filter(F.col("doc_id") == 100).count() == 0
    # accounting stays exact through the extra stage
    assert corpus.count() == (summary["n_input_docs"] - 1
                              - summary["n_exact_dup_dropped"])
    assert "ppl_gate" in summary["stage_secs"]
