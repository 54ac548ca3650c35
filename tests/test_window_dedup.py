"""Substring-window exact dedup (operators/dedup.duplicate_window_stats
/ duplicate_token_spans): Lee et al. (arXiv:2107.06499) ExactSubstr at
k-token-window grain — the modality between whole-doc near-dup and
paragraph boilerplate. Driver-facing oracle parity lives in
driver_queries (duplicate_window_stats / duplicate_token_spans);
these pin the semantics on planted stretches the synthetic corpus
can't guarantee: exact flagged positions, run/island merging
(overlap, exact adjacency, gap split), intra-doc-only repeats not
flagged, sub-k docs excluded, whitespace canonicalization."""

from intent_classifier_service_spark.operators import dedup

K = 4


def _docs(spark):
    rows = [
        # docs 1/2 share the 6-token stretch "one two three four five six"
        (1, "a1 a2 one two three four five six b1 b2"),
        (2, "c1 one two three four five six c2 c3 c4"),
        # too short for any k=4 window
        (3, "short text here"),
        # window repeated within ONE doc only — not cross-doc, not flagged
        (4, "x1 x2 x3 x4 y x1 x2 x3 x4"),
        # docs 5/6 share TWO stretches separated by a gap > k -> 2 islands
        (5, "one two three four g1 g2 g3 g4 g5 five six seven eight"),
        (6, "one two three four h1 h2 h3 h4 h5 five six seven eight"),
        # docs 7/8 share two 4-grams; in doc 7 the flagged windows sit at
        # win_index 0 and 4 (gap == k -> exactly-adjacent intervals merge)
        (7, "p1 p2 p3 p4 q1 q2 q3 q4 z7 z8"),
        (8, "w1 p1 p2 p3 p4 v1 v2 v3 v4 q1 q2 q3 q4"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_stats_planted(spark):
    out = {r["doc_id"]: r for r in
           dedup.duplicate_window_stats(_docs(spark), k=K).collect()}
    # doc 3 has < k tokens: no windows, no row
    assert 3 not in out
    # doc 1: 10 tokens -> 7 windows; flagged at 2,3,4 (the three windows
    # fully inside the shared stretch); run of 3 windows = 3+k-1 tokens
    assert out[1]["n_windows"] == 7
    assert out[1]["n_dup_windows"] == 3
    assert abs(out[1]["dup_window_ratio"] - round(3 / 7, 6)) < 1e-12
    assert out[1]["max_dup_token_run"] == 6
    # doc 2: same stretch at win_index 1..3
    assert (out[2]["n_dup_windows"], out[2]["max_dup_token_run"]) == (3, 6)
    # doc 4: intra-doc repeat only -> present but clean
    assert out[4]["n_windows"] == 6
    assert out[4]["n_dup_windows"] == 0
    assert out[4]["dup_window_ratio"] == 0.0
    assert out[4]["max_dup_token_run"] == 0
    # doc 5: flagged at 0 and 9 -> two singleton runs, each k tokens long
    assert out[5]["n_dup_windows"] == 2
    assert out[5]["max_dup_token_run"] == K


def test_token_spans_merge_and_split(spark):
    spans = {}
    for r in dedup.duplicate_token_spans(_docs(spark), k=K).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["start_token"], r["end_token"], r["n_windows"]))
    for v in spans.values():
        v.sort()
    # overlapping windows merge into the maximal stretch
    assert spans[1] == [(2, 8, 3)]
    assert spans[2] == [(1, 7, 3)]
    # gap > k splits islands
    assert spans[5] == [(0, 4, 1), (9, 13, 1)]
    assert spans[6] == [(0, 4, 1), (9, 13, 1)]
    # gap == k: [0,4) and [4,8) touch -> merged
    assert spans[7] == [(0, 8, 2)]
    assert spans[8] == [(1, 5, 1), (9, 13, 1)]
    # clean / sub-k docs emit nothing
    assert 3 not in spans and 4 not in spans


def test_whitespace_and_case_canonicalized(spark):
    docs = spark.createDataFrame(
        [(1, "One  Two\tthree \n four tail1 tail2"),
         (2, "pre one two three four")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.duplicate_window_stats(docs, k=K).collect()}
    # mixed case + runs of whitespace tokenize identically on both docs
    assert out[1]["n_dup_windows"] == 1 and out[2]["n_dup_windows"] == 1


def test_strip_duplicate_windows_keeper_and_threshold(spark):
    # min_run_tokens=4: every >=4-token non-keeper island is cut
    out = {r["doc_id"]: r["text"] for r in
           dedup.strip_duplicate_windows(
               _docs(spark), k=K, min_run_tokens=4).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}
    # doc 1 holds the globally-first occurrence of the shared stretch —
    # untouched (whitespace-canonicalized)
    assert out[1] == "a1 a2 one two three four five six b1 b2"
    # doc 2 loses the 6-token stretch
    assert out[2] == "c1 c2 c3 c4"
    # doc 5 keeps "five six seven eight" (it holds the first occurrence)
    # but loses "one two three four" (doc 1 got there first)
    assert out[5] == "g1 g2 g3 g4 g5 five six seven eight"
    assert out[6] == "h1 h2 h3 h4 h5"
    # doc 7 holds the first occurrence of both its shared 4-grams
    assert out[7] == "p1 p2 p3 p4 q1 q2 q3 q4 z7 z8"
    assert out[8] == "w1 v1 v2 v3 v4"
    # sub-k and intra-doc-only docs pass through canonicalized
    assert out[3] == "short text here"
    assert out[4] == "x1 x2 x3 x4 y x1 x2 x3 x4"


def test_strip_duplicate_windows_min_run_spares_short(spark):
    # min_run_tokens=6: only the 6-token stretch qualifies; the 4-token
    # islands in docs 5/6/7/8 are left alone
    out = {r["doc_id"]: r["text"] for r in
           dedup.strip_duplicate_windows(
               _docs(spark), k=K, min_run_tokens=6).collect()}
    assert out[2] == "c1 c2 c3 c4"
    assert out[5] == "one two three four g1 g2 g3 g4 g5 five six seven eight"
    assert out[6] == "one two three four h1 h2 h3 h4 h5 five six seven eight"
    assert out[8] == "w1 p1 p2 p3 p4 v1 v2 v3 v4 q1 q2 q3 q4"


def test_strip_preserves_original_casing(spark):
    docs = spark.createDataFrame(
        [(1, "Keep  My CASE one two three four five six seven"),
         (2, "pre1 pre2 ONE Two three FOUR five SIX seven post")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in
           dedup.strip_duplicate_windows(docs, k=K, min_run_tokens=4)
           .collect()}
    # matching is case-insensitive; rebuild keeps each doc's own casing
    assert out[1] == "Keep My CASE one two three four five six seven"
    assert out[2] == "pre1 pre2 post"


def test_strip_idempotent_on_fixture(spark):
    once = dedup.strip_duplicate_windows(_docs(spark), k=K, min_run_tokens=4)
    twice = dedup.strip_duplicate_windows(once, k=K, min_run_tokens=4)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


def test_window_dedup_plan_discipline(spark):
    """Equi-joins only (hash-key semi join of the duplicated-window
    dimension), zero Python eval in the plan, and the only Window is
    per-document (gaps-and-islands) — never a corpus-wide partition."""
    df = dedup.duplicate_window_stats(_docs(spark), k=K)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    p2 = dedup.duplicate_token_spans(
        _docs(spark), k=K)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoop" not in p2
    p3 = dedup.strip_duplicate_windows(
        _docs(spark), k=K)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p3 and "BroadcastNestedLoop" not in p3
    assert "BatchEvalPython" not in p3 and "ArrowEvalPython" not in p3


def test_window_stats_match_python_reference_random(spark):
    """Randomized-corpus armor: duplicate_window_stats and
    duplicate_token_spans equal a pure-Python reference on a seeded
    random corpus with injected shared stretches (beyond the planted
    fixtures above, this exercises arbitrary overlap/adjacency/run
    geometry)."""
    import random

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(30)]
    shared = [" ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12)))
              for _ in range(5)]
    rows = []
    for did in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        for s in shared:
            if rng.random() < 0.3:
                pos = rng.randint(0, len(words))
                words[pos:pos] = s.split()
        rows.append((did, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # pure-Python reference
    toks = {d: t.split() for d, t in rows if t.strip()}
    wins = {d: [" ".join(t[i:i + K]) for i in range(len(t) - K + 1)]
            for d, t in toks.items() if len(t) >= K}
    sharing = {}
    for d, ws in wins.items():
        for w in set(ws):
            sharing.setdefault(w, set()).add(d)
    dup = {w for w, ds in sharing.items() if len(ds) > 1}
    ref_stats, ref_spans = {}, {}
    for d, ws in wins.items():
        flags = [i for i, w in enumerate(ws) if w in dup]
        run = best = 0
        prev = None
        spans = []
        for i in flags:
            if prev is not None and i - prev == 1:
                run += 1
            else:
                run = 1
            best = max(best, run)
            prev = i
            if spans and i <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], i + K),
                             spans[-1][2] + 1)
            else:
                spans.append((i, i + K, 1))
        ref_stats[d] = (len(ws), len(flags),
                        round(len(flags) / len(ws), 6),
                        best + K - 1 if flags else 0)
        if spans:
            ref_spans[d] = spans

    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"],
                         r["dup_window_ratio"], r["max_dup_token_run"])
           for r in dedup.duplicate_window_stats(docs, k=K).collect()}
    assert got == ref_stats
    got_spans = {}
    for r in dedup.duplicate_token_spans(docs, k=K).collect():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["start_token"], r["end_token"], r["n_windows"]))
    for v in got_spans.values():
        v.sort()
    assert got_spans == ref_spans
