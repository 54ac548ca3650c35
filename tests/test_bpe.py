"""BPE tokenizer-training primitives (operators/bpe.py): word
histogram → adjacent symbol-pair counts → iterative merges, pinned
against a pure-Python reference trainer on the classic Sennrich et al.
corpus. The single-round merge-candidate query is driver-oracled
(bpe_merge_candidates entry); the iterative trainer is data-dependent
and non-SQL-expressible, so the reference-equality tests here ARE its
correctness gate."""

from collections import Counter

from intent_classifier_service_spark.operators import bpe

# the arXiv:1508.07909 worked example
CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _docs(spark):
    words = []
    for w, c in CORPUS.items():
        words.extend([w] * c)
    # split across a few docs; whitespace/case noise must not matter
    texts = [" ".join(words[:6]), "  " + " ".join(words[6:11]).upper(),
             " ".join(words[11:]) + " "]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _ref_bpe(word_counts, num_merges):
    vocab = {tuple(list(w) + [bpe.END_OF_WORD]): c
             for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, ties broken by smallest (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges, vocab


def test_word_counts(spark):
    wc = {r["word"]: r["count"]
          for r in bpe.word_counts(_docs(spark)).collect()}
    assert wc == CORPUS  # case-folded, whitespace-noise-proof
    long_doc = spark.createDataFrame(
        [(1, "ok " + "x" * 101)], "doc_id long, text string")
    assert {r["word"] for r in bpe.word_counts(long_doc).collect()} == {"ok"}


def test_merge_candidates_match_reference(spark):
    got = {(r["left_sym"], r["right_sym"]): r["pair_count"]
           for r in bpe.bpe_merge_candidates(_docs(spark), top_n=1000)
           .collect()}
    ref = Counter()
    for w, c in CORPUS.items():
        syms = list(w) + [bpe.END_OF_WORD]
        for a, b in zip(syms, syms[1:]):
            ref[(a, b)] += c
    assert got == dict(ref)
    # headline: ('e','s') with count 9 is the canonical first merge
    assert got[("e", "s")] == 9


def test_train_bpe_matches_reference(spark):
    n = 8
    merges, vocab = bpe.train_bpe(_docs(spark), num_merges=n)
    ref_merges, ref_vocab = _ref_bpe(CORPUS, n)
    assert merges == ref_merges
    got_syms = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
    # reference vocab keys are symbol tuples; re-derive per original word
    ref_syms = {}
    for w, c in CORPUS.items():
        syms = list(w) + [bpe.END_OF_WORD]
        for l, r in ref_merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        ref_syms[w] = tuple(syms)
    assert got_syms == ref_syms
    # the classic first merges: es, est, est</w>
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe.END_OF_WORD)
    vocab.unpersist()


def test_train_bpe_driver_path_equals_distributed(spark):
    """The size-gated driver-side trainer (round-7 verdict #1) and the
    per-round distributed path (forced with driver_gate=0) produce the
    SAME merge sequence and the SAME final vocab on the same corpus."""
    merges_d, vocab_d = bpe.train_bpe(_docs(spark), num_merges=8)
    merges_x, vocab_x = bpe.train_bpe(_docs(spark), num_merges=8,
                                      driver_gate=0)
    assert merges_d == merges_x
    as_map = lambda v: {  # noqa: E731
        r["word"]: (r["count"], tuple(r["syms"])) for r in v.collect()}
    assert as_map(vocab_d) == as_map(vocab_x)
    vocab_x.unpersist()


def test_inmem_trainer_matches_naive_on_random_corpus():
    """The incremental heap+inverted-index in-memory trainer is
    byte-identical to the naive recount-every-round reference on a
    randomized corpus (tie-heavy alphabet, enough merges to exhaust
    many words), including the per-merge selection counts."""
    import random

    rng = random.Random(20260818)
    wc: dict[str, int] = {}
    for _ in range(400):
        w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 7)))
        wc[w] = wc.get(w, 0) + rng.randint(1, 9)
    n = 120
    got, final = bpe._train_bpe_inmem(wc, n)
    ref_merges, _ = _ref_bpe(wc, n)
    assert [(left, right) for left, right, _c in got] == ref_merges
    # selection counts: recompute the naive pair count at each round
    vocab = {w: list(w) + [bpe.END_OF_WORD] for w in wc}
    for left, right, cnt in got:
        naive = 0
        for w, s in vocab.items():
            for a, b in zip(s, s[1:]):
                if (a, b) == (left, right):
                    naive += wc[w]
        assert naive == cnt, (left, right)
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == (left, right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    assert {w: tuple(s) for w, s in vocab.items()} == {
        w: tuple(s) for w, s in final.items()}


def test_apply_merges_hot_word_cache_identical(spark):
    """hot_words pre-seeding (broadcast top-N encodings) changes the
    execution path, never the output."""
    merges, vocab = bpe.train_bpe(_docs(spark), num_merges=8)
    vocab.unpersist()
    base = bpe.apply_merges(_docs(spark), merges, keep_tokens=True)
    hot = bpe.apply_merges(_docs(spark), merges, keep_tokens=True,
                           hot_words=3)
    as_map = lambda df: {  # noqa: E731
        r["doc_id"]: (r["n_subword_tokens"], tuple(r["subword_tokens"]))
        for r in df.collect()}
    assert as_map(base) == as_map(hot)


def test_merge_candidates_plan_discipline(spark):
    """The query path is pure JVM (no Python eval), aggregates before
    ordering, and the top-N is a TakeOrderedAndProject — never a
    global sort of the pair table."""
    df = bpe.bpe_merge_candidates(_docs(spark), top_n=10)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_apply_merges_reproduces_training_segmentation(spark):
    """Rank-greedy encode with the trained merge list reproduces the
    trained vocab's symbol sequences on in-vocab words, and counts/
    tokens line up per document."""
    merges, vocab = bpe.train_bpe(_docs(spark), num_merges=8)
    trained = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    vocab.unpersist()
    out = bpe.apply_merges(_docs(spark), merges, keep_tokens=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    for did, text in docs.items():
        expect = []
        for w in text.lower().split():
            expect.extend(trained[w])
        assert rows[did]["subword_tokens"] == expect, did
        assert rows[did]["n_subword_tokens"] == len(expect)


def test_apply_merges_unseen_word_and_plan(spark):
    # an out-of-vocab word still encodes (falls back toward chars);
    # empty text encodes to zero tokens; the plan is one Arrow pass
    # with no shuffle
    merges, vocab = bpe.train_bpe(_docs(spark), num_merges=3)
    vocab.unpersist()
    docs = spark.createDataFrame(
        [(1, "lowest"), (2, "")], "doc_id long, text string")
    out = bpe.apply_merges(docs, merges, keep_tokens=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    # merges after 3 rounds: es, est, est</w> -> 'lowest' = l o w est</w>
    assert rows[1]["subword_tokens"] == ["l", "o", "w", "est</w>"]
    assert rows[2]["n_subword_tokens"] == 0
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
