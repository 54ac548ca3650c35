import numpy as np
from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import dedup, similarity


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The quick  brown fox jumps over the lazy dog"),  # exact dup mod ws/case
    (3, "the quick brown fox jumps over the lazy cat"),   # near dup
    (4, "completely different text about spark engines"),
    (5, "completely different text about spark engines"),  # exact dup
    (6, "short"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    groups = dedup.exact_duplicates(_docs(spark)).collect()
    sets = sorted(tuple(g["dup_ids"]) for g in groups)
    assert sets == [(1, 2), (4, 5)]


def test_exact_dedup_keeps_min_id(spark):
    out = sorted(r["doc_id"] for r in dedup.exact_dedup(_docs(spark)).collect())
    assert out == [1, 3, 4, 6]


def test_ngram_jaccard_pairs(spark):
    pairs = dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got   # identical after normalization → jaccard 1.0
    assert (4, 5) in got
    assert (1, 3) in got or (2, 3) in got  # near dup above 0.5
    assert all(a < b for a, b in got)


def test_ngram_jaccard_shingle_df_cap(spark):
    """A stop-shingle present in every doc must not explode candidates:
    with the df cap, docs whose ONLY shared shingle is the hot one
    produce no pair at all, while truly similar pairs survive."""
    hot = "aaa bbb ccc"  # one 3-shingle shared by all docs
    rows = [(i, f"{hot} unique{i} token{i} word{i} extra{i}") for i in range(20)]
    rows += [(100, f"{hot} same same same same"), (101, f"{hot} same same same same")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in got           # near-dups share rare shingles too
    assert all(a >= 100 for a, _ in got)  # no hot-shingle-only pairs
    # uncapped on the original fixture stays exact (df cap is a no-op
    # when every shingle is rare): identical output either way
    exact = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
             for r in dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.5,
                                                max_shingle_df=None).collect()}
    capped = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
              for r in dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert exact == capped


def test_minhash_lsh_finds_near_dups(spark):
    pairs = dedup.minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (4, 5) in got
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert est[(1, 2)] == 1.0  # identical signatures


def test_simhash_near_pairs(spark):
    pairs = dedup.simhash_near_pairs(_docs(spark), max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (4, 5) in got
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert ham[(1, 2)] == 0 and ham[(4, 5)] == 0


def _embeddings(spark, n=50, d=8, seed=0):
    rng = np.random.RandomState(seed)
    mat = rng.normal(size=(n, d))
    rows = [(i, mat[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), mat


def test_brute_force_topk_matches_numpy(spark):
    df, mat = _embeddings(spark)
    q = mat[7]
    got = similarity.brute_force_topk(df, [(7, q.tolist())], k=5).collect()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ (q / np.linalg.norm(q))
    expected = np.argsort(-sims)[:5].tolist()
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == expected
    assert got[0]["score"] > 0.999  # self-match first


def test_lsh_topk_self_recall(spark):
    df, mat = _embeddings(spark)
    got = similarity.lsh_topk(df, [(7, mat[7].tolist())], k=5, n_bits=16, bands=8)
    rows = got.collect()
    # the query vector itself must land in its own buckets → rank 1
    best = min(rows, key=lambda r: r["rank"])
    assert best["vec_id"] == 7 and best["score"] > 0.999


def test_cosine_pairs(spark):
    df, mat = _embeddings(spark)
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in similarity.cosine_pairs(df, pairs).collect()}
    for a, b in [(1, 2), (3, 4)]:
        exp = float(mat[a] @ mat[b] / (np.linalg.norm(mat[a]) * np.linalg.norm(mat[b])))
        assert abs(got[(a, b)] - exp) < 1e-9


def test_null_text_docs_never_pair(spark):
    """Two distinct docs with NULL text share the sentinel minhash
    signature / zero simhash — they must NOT emerge as near-dup pairs
    (review finding: sentinel collision = est_jaccard 1.0 false
    positive)."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text here with several words"),
         (4, "real text here with several words")],
        "doc_id long, text string",
    )
    mh = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert mh == {(3, 4)}
    sh = {(r["id_a"], r["id_b"]) for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()}
    assert sh == {(3, 4)}


# ----------------------------------------------- cluster resolution

def test_neardup_clusters_transitive_chain(spark):
    """A~B, B~C (no A~C edge) must land all three in ONE cluster with
    the min id as survivor — the property a pair list cannot express."""
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 21)], "id_a long, id_b long"
    )
    # default path (small graph -> driver union-find) and the forced
    # distributed fixpoint must agree exactly
    got = {r["id"]: r["cluster_id"]
           for r in dedup.neardup_clusters(pairs).collect()}
    assert got == {3: 3, 7: 3, 9: 3, 20: 20, 21: 20}
    dist = {r["id"]: r["cluster_id"]
            for r in dedup.neardup_clusters(
                pairs, driver_edge_threshold=0).collect()}
    assert dist == got


def test_neardup_dedup_one_survivor_per_component(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        # component {1,2,3} via chain, component {5,6}, singletons 0,4,7,8,9
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = sorted(r["doc_id"] for r in dedup.neardup_dedup(docs, pairs).collect())
    assert out == [0, 1, 4, 5, 7, 8, 9]  # kept min of each component
    # all original columns preserved
    assert dedup.neardup_dedup(docs, pairs).columns == ["doc_id", "text"]


def test_neardup_dedup_quality_survivor(spark):
    """survivor='best_score' keeps the HIGHEST-score member per
    cluster (here the longest text), not the min id — and ties break
    on min id. Component {1,2,3}: doc 3 is longest → survives even
    though 1 is the min id. Component {5,6}: equal lengths → tie-break
    keeps 5."""
    docs = spark.createDataFrame(
        [(0, "solo"), (1, "short"), (2, "medium text"),
         (3, "the longest text of the cluster"), (4, "alone"),
         (5, "same len"), (6, "same len")],
        "doc_id long, text string",
    ).withColumn("text_len", F.length("text"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = sorted(
        r["doc_id"]
        for r in dedup.neardup_dedup(
            docs, pairs, survivor="best_score", score_col="text_len"
        ).collect()
    )
    assert out == [0, 3, 4, 5]
    import pytest

    with pytest.raises(ValueError, match="score_col"):
        dedup.neardup_dedup(docs, pairs, survivor="best_score")
    with pytest.raises(ValueError, match="survivor"):
        dedup.neardup_dedup(docs, pairs, survivor="bogus")


def test_neardup_clusters_long_path_converges(spark):
    """A 12-hop path needs ~12 propagation rounds — converges under the
    default budget, raises loudly when the budget is too small (never
    returns silently-wrong clusters)."""
    import pytest

    chain = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    # force the DISTRIBUTED path: the convergence budget is its
    # property (the driver union-find has no rounds to exhaust)
    got = dedup.neardup_clusters(pairs, driver_edge_threshold=0).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 13
    with pytest.raises(RuntimeError, match="not converged"):
        dedup.neardup_clusters(pairs, max_iter=3, driver_edge_threshold=0)


def test_neardup_clusters_string_ids(spark):
    """String doc ids (the input_hint's doc_id:string shape) ride the
    hashed-label convergence witness: the exact-decimal sum would cast
    to null and compare None==None, falsely converging after one
    round — on this 12-hop chain that would leave far vertices
    mislabelled. Lexicographic min is the survivor convention."""
    chain = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(12)]
    pairs = spark.createDataFrame(chain, "id_a string, id_b string")
    # distributed path: pins the hashed witness for string labels
    got = dedup.neardup_clusters(pairs, driver_edge_threshold=0).collect()
    assert {r["cluster_id"] for r in got} == {"d00"}
    assert len(got) == 13
    # driver path handles string ids identically
    drv = dedup.neardup_clusters(pairs).collect()
    assert sorted(map(tuple, drv)) == sorted(map(tuple, got))


def test_neardup_clusters_fractional_ids(spark):
    """Fractional (double) ids must ride the hashed witness, not the
    exact decimal sum: casting each label to decimal(38,0) ROUNDS, so
    a hop that moves a label 2.6→2.5 (both round to 3) leaves the
    rounded sum unchanged and the exact-sum witness would return
    'converged' with wrong clusters. This chain is built so the first
    post-seed hop changes ONLY 2.7's label 2.6→2.5 and 2.8's 2.7→2.6
    — every per-label rounded value stays 3, reproducing the silent
    premature convergence unless the hash witness is used."""
    chain = [(2.5, 2.6), (2.6, 2.7), (2.7, 2.8)]
    pairs = spark.createDataFrame(chain, "id_a double, id_b double")
    # distributed path: pins the hashed witness for fractional labels
    got = dedup.neardup_clusters(pairs, driver_edge_threshold=0).collect()
    assert {r["cluster_id"] for r in got} == {2.5}
    assert len(got) == 4
    drv = dedup.neardup_clusters(pairs).collect()
    assert sorted(map(tuple, drv)) == sorted(map(tuple, got))


def test_earliest_per_window_null_payload_tie(spark):
    """Equal-ts tie where payloads differ in null-ness: Spark's struct
    min orders a null field FIRST (before any value) — pinned here
    because a SQL oracle must say NULLS FIRST explicitly to pick the
    same survivor (engines default to NULLS LAST)."""
    rows = [(1, "2024-01-01 00:02:00", "a"), (1, "2024-01-01 00:02:00", None)]
    df = spark.createDataFrame(rows, "k long, ts string, v string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = dedup.earliest_per_window(df, "ts", ["k"], "1 day").collect()
    assert len(out) == 1 and out[0]["v"] is None


def test_neardup_dedup_composes_with_minhash(spark):
    """End-to-end: MinHash+LSH pair generation feeding the cluster
    resolver — three mutually-near docs collapse to one survivor."""
    rows = [(i, f"totally unrelated document number {i} with its own words "
                f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(10, 16)]
    near = "the quick brown fox jumps over the lazy dog again and again"
    rows += [(1, near), (2, near), (3, near)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9).select("id_a", "id_b")
    out = sorted(r["doc_id"] for r in dedup.neardup_dedup(docs, pairs).collect())
    assert out == [1, 10, 11, 12, 13, 14, 15]


# ----------------------------------------------- decontamination

def test_contaminated_docs_flags_planted_benchmark(spark):
    """A corpus doc embedding a benchmark question verbatim is flagged;
    clean docs are not; the benchmark set rides in as a broadcast."""
    bench = spark.createDataFrame(
        [(100, "what is the capital city of france in europe"),
         (101, "how many legs does a healthy adult spider have")],
        "bench_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "intro text what is the capital city of france in europe outro words"),
         (2, "a perfectly clean training document about something else entirely"),
         (3, "how many legs does a healthy adult spider have is a classic question"),
         (4, "capital city of france is mentioned but the full five gram is absent")],
        "doc_id long, text string",
    )
    out = dedup.contaminated_docs(corpus, bench, n=8)
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert set(got) == {1, 3}
    assert all(v >= 1 for v in got.values())
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_contaminated_docs_short_doc_whole_text_shingle(spark):
    """Docs shorter than n words fall back to a whole-text shingle, so
    an exact short benchmark string still matches."""
    bench = spark.createDataFrame([(1, "tiny eval prompt")], "i long, text string")
    corpus = spark.createDataFrame(
        [(1, "tiny eval prompt"), (2, "tiny eval other")],
        "doc_id long, text string",
    )
    got = [r["doc_id"] for r in dedup.contaminated_docs(corpus, bench, n=8).collect()]
    assert got == [1]


def test_earliest_per_window_deterministic_tiebreak(spark):
    """Min event time wins; an equal-ts tie falls to lexicographic
    payload order; null-ts rows are dropped (engine-portable NULL
    ordering — see the operator docstring)."""
    rows = [(1, "2024-01-01 00:02:00", "b"), (1, "2024-01-01 00:02:00", "a"),
            (1, "2024-01-01 00:01:00", "z"), (2, "2024-01-01 00:03:00", "x"),
            (3, None, "null-ts-dropped")]
    df = spark.createDataFrame(rows, "k long, ts string, v string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = dedup.earliest_per_window(df, "ts", ["k"], "1 day").collect()
    got = {r["k"]: (str(r["ts"]), r["v"]) for r in out}
    assert set(got) == {1, 2}                       # null-ts key dropped
    assert got[1] == ("2024-01-01 00:01:00", "z")   # min ts wins
    assert got[2] == ("2024-01-01 00:03:00", "x")

    out2 = dedup.earliest_per_window(
        df.filter(F.col("v") != "z"), "ts", ["k"], "1 day"
    ).collect()
    assert {r["k"]: r["v"] for r in out2}[1] == "a"  # tie → lexicographic


def test_neardup_clusters_random_graph_matches_bfs(spark):
    """Property pin for the hop+pointer-doubling propagation: on a
    seeded random graph (mixed cliques, chains, isolated pairs, and
    random cross-edges — including components far wider than one
    round's reach), every vertex's cluster_id must equal the
    BFS-computed component minimum. Guards the whole algorithm family:
    a wrong compression step or a premature convergence return shows
    up as a label mismatch here, not as a plausible-looking cluster."""
    import collections
    import random

    rng = random.Random(20240817)
    edges = []
    # three cliques
    for base in (0, 40, 80):
        members = [base + i for i in range(6)]
        edges += [(a, b) for a in members for b in members if a < b]
    # two long chains (diameter 14)
    for base in (200, 300):
        edges += [(base + i, base + i + 1) for i in range(14)]
    # random sparse edges over a wider id space (bridges some of the above)
    for _ in range(60):
        a, b = rng.randrange(0, 400), rng.randrange(0, 400)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    truth, seen = {}, set()
    for v in adj:
        if v in seen:
            continue
        comp, stack = [v], [v]
        seen.add(v)
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
                    comp.append(w)
        m = min(comp)
        for u in comp:
            truth[u] = m

    # BOTH paths must equal the BFS truth: the driver union-find
    # (default at this size) and the forced distributed fixpoint
    got = {r["id"]: r["cluster_id"]
           for r in dedup.neardup_clusters(pairs).collect()}
    assert got == truth
    dist = {r["id"]: r["cluster_id"]
            for r in dedup.neardup_clusters(
                pairs, driver_edge_threshold=0).collect()}
    assert dist == truth


def test_minhash_index_lifecycle(spark, tmp_path):
    """Cross-corpus incremental dedup: build the banded index over the
    standing corpus, probe it with an ingest batch (cross-batch dup
    found; within-index pairs never re-emitted; a re-ingested id never
    pairs with itself), append the batch, then probe a second batch
    that matches ONLY an appended doc — visible iff the append landed.
    Manifest running counts checked at every step."""
    old = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "an entirely different standing document about engines"),
         (3, "yet another unrelated corpus document with words")],
        "doc_id long, text string")
    path = str(tmp_path / "mh_idx")
    m = dedup.build_minhash_index(old, path)
    assert (m["n_docs"], m["n_appends"], m["append_counts"]) == (3, 0, [])

    batch1 = spark.createDataFrame(
        [(11, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (12, "completely novel ingest text nothing like the corpus"),
         (2, "an entirely different standing document about engines")],
        "doc_id long, text string")  # id 2 re-ingested verbatim
    pairs = dedup.pairs_against_index(spark, path, batch1, threshold=0.9)
    got = {(r["id_new"], r["id_indexed"]): r["est_jaccard"]
           for r in pairs.collect()}
    # cross-batch dup found at est 1.0; NO within-index (old x old)
    # pair; re-ingested id 2 never pairs with itself
    assert set(got) == {(11, 1)} and got[(11, 1)] == 1.0

    kept = batch1.filter(F.col("doc_id") > 10)  # survivor policy: drop
    # nothing, append only genuinely-new ids (the caller's choice)
    m2 = dedup.append_to_minhash_index(spark, path, kept)
    assert (m2["n_docs"], m2["n_appends"], m2["append_counts"]) == (5, 1, [2])

    batch2 = spark.createDataFrame(
        [(21, "completely novel ingest text nothing like the corpus")],
        "doc_id long, text string")  # dup of APPENDED doc 12 only
    got2 = {(r["id_new"], r["id_indexed"])
            for r in dedup.pairs_against_index(
                spark, path, batch2, threshold=0.9).collect()}
    assert got2 == {(21, 12)}

    m3 = dedup.append_to_minhash_index(spark, path, batch2)
    assert (m3["n_docs"], m3["n_appends"], m3["append_counts"]) == (6, 2, [2, 1])


def test_exact_index_lifecycle(spark, tmp_path):
    """Cross-corpus EXACT dedup (the pre-near-dup ingest stage):
    build the digest index over the standing corpus, probe with an
    ingest batch — normalization-equal text flagged with the min-id
    standing survivor and the standing copy count, a re-ingested id
    never self-pairs, within-index duplicates never re-emitted —
    append, then probe a second batch that matches ONLY an appended
    doc. Manifest counts at every step."""
    old = spark.createDataFrame(
        [(2, "The Quick  Brown Fox"),   # 2 and 4: standing dups of
         (4, "the quick brown fox"),    # each other (never re-emitted)
         (6, "an entirely different standing document")],
        "doc_id long, text string")
    path = str(tmp_path / "ex_idx")
    m = dedup.build_exact_index(old, path)
    assert (m["n_docs"], m["n_appends"], m["kind"]) == (3, 0, "exact")

    batch1 = spark.createDataFrame(
        [(11, "  the QUICK brown   fox "),  # normalizes to 2/4's text
         (13, "completely novel ingest text"),
         (6, "an entirely different standing document")],  # re-ingested
        "doc_id long, text string")
    got = {r["id_new"]: (r["id_indexed"], r["n_indexed_copies"])
           for r in dedup.exact_dups_against_index(
               spark, path, batch1).collect()}
    # min-id survivor (2, not 4), BOTH standing copies counted; the
    # re-ingested id 6 pairs with nothing (self excluded, no other copy)
    assert got == {11: (2, 2)}

    kept = batch1.filter(F.col("doc_id") == 13)
    m2 = dedup.append_to_exact_index(spark, path, kept)
    assert (m2["n_docs"], m2["n_appends"], m2["append_counts"]) == (4, 1, [1])

    batch2 = spark.createDataFrame(
        [(21, "Completely NOVEL ingest text")],  # dup of APPENDED 13
        "doc_id long, text string")
    got2 = {r["id_new"]: (r["id_indexed"], r["n_indexed_copies"])
            for r in dedup.exact_dups_against_index(
                spark, path, batch2).collect()}
    assert got2 == {21: (13, 1)}

    m3 = dedup.append_to_exact_index(spark, path, batch2)
    assert (m3["n_docs"], m3["n_appends"], m3["append_counts"]) == (5, 2, [1, 1])


def test_simhash_index_lifecycle(spark, tmp_path):
    """Cross-corpus SimHash index: build over the standing corpus,
    probe with a batch (identical text → hamming 0 via a shared band;
    re-ingested id never self-pairs; within-index pairs never
    re-emitted), append, then probe a second batch that matches ONLY
    an appended doc. Manifest counts at every step."""
    old = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "an entirely different standing document about engines")],
        "doc_id long, text string")
    path = str(tmp_path / "sh_idx")
    m = dedup.build_simhash_index(old, path)
    assert (m["n_docs"], m["n_appends"], m["kind"]) == (2, 0, "simhash")

    batch1 = spark.createDataFrame(
        [(11, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (12, "completely novel ingest text nothing like the corpus"),
         (2, "an entirely different standing document about engines")],
        "doc_id long, text string")  # id 2 re-ingested verbatim
    got = {(r["id_new"], r["id_indexed"]): r["hamming"]
           for r in dedup.simhash_pairs_against_index(
               spark, path, batch1, max_hamming=3).collect()}
    assert set(got) == {(11, 1)} and got[(11, 1)] == 0

    kept = batch1.filter(F.col("doc_id") > 10)
    m2 = dedup.append_to_simhash_index(spark, path, kept)
    assert (m2["n_docs"], m2["n_appends"], m2["append_counts"]) == (4, 1, [2])

    batch2 = spark.createDataFrame(
        [(21, "completely novel ingest text nothing like the corpus")],
        "doc_id long, text string")  # dup of APPENDED doc 12 only
    got2 = {(r["id_new"], r["id_indexed"])
            for r in dedup.simhash_pairs_against_index(
                spark, path, batch2, max_hamming=3).collect()}
    assert got2 == {(21, 12)}


def test_pairs_against_index_equals_batch_cross_pairs(spark, tmp_path):
    """Randomized-corpus equivalence armor (round 8): probing the
    persisted index with a batch must produce EXACTLY the
    cross-(indexed, batch) subset of minhash_lsh_pairs over the union
    corpus — identical band keys, identical signature-level verify —
    including planted cross-parity duplicates and whatever incidental
    collisions the random draw produces."""
    import random

    rng = random.Random(8)
    pool = [f"tok{i}" for i in range(30)]
    rows = []
    for i in range(120):
        n = rng.randint(4, 12)
        rows.append((i, " ".join(rng.choice(pool) for _ in range(n))))
    # planted duplicates straddling the parity boundary, both ways,
    # plus a dup-of-a-dup chain (doc 203 copies doc 202 = rows[122],
    # which itself copies doc 7) and one within-index pair (202, 7)
    # that must never be re-emitted by the probe
    for i, j in [(200, 3), (201, 4), (202, 7), (203, 122)]:
        rows.append((i, rows[j][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    dedup.build_minhash_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    got = {(r["id_new"], r["id_indexed"], round(r["est_jaccard"], 9))
           for r in dedup.pairs_against_index(
               spark, path, docs.filter(F.col("doc_id") % 2 == 1),
               threshold=0.5).collect()}
    expect = set()
    for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect():
        a, b = r["id_a"], r["id_b"]
        if a % 2 != b % 2:
            nw, ix = (a, b) if a % 2 == 1 else (b, a)
            expect.add((nw, ix, round(r["est_jaccard"], 9)))
    assert len(expect) >= 3  # the planted cross-parity dups at least
    assert got == expect


def test_embedding_index_lifecycle(spark, tmp_path):
    """Embedding-modality cross-corpus dedup: build the hyperplane band
    index, probe with a batch (planted exact copy found at cosine ~1;
    within-index pairs never re-emitted; re-ingested id never
    self-pairs), append, probe again vs an APPENDED vector only."""
    rng = np.random.RandomState(5)
    base = rng.normal(size=(6, 16))
    old = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(6)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "emb_idx")
    m = similarity.build_embedding_index(old, path, dim=16)
    assert (m["n_docs"], m["n_appends"]) == (6, 0)

    fresh = rng.normal(size=16)
    batch1 = spark.createDataFrame(
        [(11, base[2].tolist()),        # exact copy of indexed vec 2
         (12, fresh.tolist()),          # genuinely new direction
         (3, base[3].tolist())],        # re-ingested id 3, verbatim
        "vec_id long, embedding array<double>")
    got = {(r["id_new"], r["id_indexed"]): r["cosine"]
           for r in similarity.embedding_pairs_against_index(
               spark, path, batch1, threshold=0.95).collect()}
    assert set(got) == {(11, 2)} and got[(11, 2)] > 0.999999

    kept = batch1.filter(F.col("vec_id") > 10)
    m2 = similarity.append_to_embedding_index(spark, path, kept)
    assert (m2["n_docs"], m2["n_appends"], m2["append_counts"]) == (8, 1, [2])

    batch2 = spark.createDataFrame(
        [(21, fresh.tolist())],  # copy of APPENDED vec 12 only
        "vec_id long, embedding array<double>")
    got2 = {(r["id_new"], r["id_indexed"])
            for r in similarity.embedding_pairs_against_index(
                spark, path, batch2, threshold=0.95).collect()}
    assert got2 == {(21, 12)}


def test_shingles_zip_form_matches_let_bound(spark):
    """The UDF-arg-safe zip-with shingle construction (let_bound=False,
    round-9: O(n·w) instead of the old inline form's O(w²)) must be
    value-identical to the let-bound slice form on every edge case:
    n > token count (whole-text fallback), single token, empty and
    null text, repeated windows (array_distinct), multi-space runs."""
    rows = [(1, "a b c d e"), (2, "a"), (3, ""), (4, None),
            (5, "  x   y  "), (6, "a b"), (7, "a b c"),
            (8, "r s r s r s r s"), (9, "Q w E r T y U i O p")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3, 8):
        bad = docs.select(
            dedup.shingles("text", n).alias("lb"),
            dedup.shingles("text", n, let_bound=False).alias("zip"),
        ).filter(~F.col("lb").eqNullSafe(F.col("zip"))).count()
        assert bad == 0, f"n={n}"


def test_minhash_signatures_udf_arg_compiles_and_segments(spark):
    """minhash_signatures feeds the zip-form shingles straight into its
    pandas UDF (the let-bound form is a Spark 4.1 codegen
    INTERNAL_ERROR as a UDF argument) — pin that the plan executes and
    that identical texts still get identical signatures while disjoint
    texts differ."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "entirely different words with no overlap at all here")],
        "doc_id long, text string")
    sigs = {r["id"]: tuple(r["sig"])
            for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
