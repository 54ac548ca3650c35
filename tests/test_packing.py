"""Document packing (operators/packing): greedy fixed-token-budget
sequence assembly — invariants (capacity, doc conservation, overflow
isolation), determinism, and packing quality."""

from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import packing


def _docs(spark, n=3000, seed_mod=97):
    # token counts 1..96 spread deterministically
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(seed_mod)) + 1).alias("n_tokens"),
    )


def test_pack_invariants_and_conservation(spark):
    docs = _docs(spark)
    cap = 64
    packed, overflow = packing.pack_greedy(docs, cap)
    p = packed.collect()
    # capacity: no sequence exceeds the budget; totals/counters consistent
    for r in p:
        assert 0 < r["total_tokens"] <= cap
        assert r["n_docs"] == len(r["doc_ids"])
        assert abs(r["fill_ratio"] - r["total_tokens"] / cap) < 1e-12
    # conservation: every eligible doc in exactly one sequence
    assigned = packing.pack_assignments(packed)
    eligible = docs.filter(F.col("n_tokens") <= cap)
    assert assigned.count() == eligible.count()
    assert assigned.select("doc_id").distinct().count() == eligible.count()
    assert assigned.join(eligible, "doc_id", "left_anti").count() == 0
    # overflow: exactly the too-big docs, never packed
    ov = {r["doc_id"] for r in overflow.collect()}
    assert ov == {r["doc_id"] for r in
                  docs.filter(F.col("n_tokens") > cap).collect()}
    assert not ov & {r["doc_id"] for r in assigned.collect()}


def test_pack_deterministic_and_bucket_stable(spark):
    docs = _docs(spark)
    p1, _ = packing.pack_greedy(docs, 64)
    p2, _ = packing.pack_greedy(docs, 64)
    a = sorted((r["seq_id"], tuple(r["doc_ids"])) for r in p1.collect())
    b = sorted((r["seq_id"], tuple(r["doc_ids"])) for r in p2.collect())
    assert a == b  # same corpus -> byte-identical packing, every run
    # determinism must not depend on spark.sql.shuffle.partitions
    p3, _ = packing.pack_greedy(docs.repartition(7), 64)
    c = sorted((r["seq_id"], tuple(r["doc_ids"])) for r in p3.collect())
    assert a == c


def test_pack_quality_fill_ratio(spark):
    """FFD within hash buckets: with thousands of docs per bucket the
    mean fill should be near 1 (the loss is one underfull tail sequence
    per bucket)."""
    docs = _docs(spark, n=20000)
    packed, _ = packing.pack_greedy(docs, 64, n_buckets=16)
    stats = packed.agg(F.avg("fill_ratio").alias("f"),
                       F.count(F.lit(1)).alias("n")).collect()[0]
    assert stats["f"] > 0.95, stats
    # sanity: sequences actually multi-doc on average
    tot_docs = packed.agg(F.sum("n_docs")).collect()[0][0]
    assert tot_docs / stats["n"] > 1.5


def test_pack_rejects_bad_budget(spark):
    import pytest

    with pytest.raises(ValueError):
        packing.pack_greedy(_docs(spark, 10), 0)


def test_pack_bucket_spanning_arrow_batches(spark):
    """A bucket larger than arrow.maxRecordsPerBatch (10k in session.py)
    arrives at the kernel as MULTIPLE pandas batches; packing must treat
    the partition as ONE bucket — per-batch packing would restart the
    seq counter (duplicate seq_ids) and drop cross-batch fill quality.
    25k docs into a single bucket forces ≥3 Arrow batches."""
    docs = _docs(spark, n=25_000)
    packed, _ = packing.pack_greedy(docs, 64, n_buckets=1)
    rows = packed.collect()
    seq_ids = [r["seq_id"] for r in rows]
    assert len(seq_ids) == len(set(seq_ids)), "duplicate seq_ids across batches"
    # conservation through the multi-batch path
    assigned = packing.pack_assignments(packed)
    eligible = docs.filter(F.col("n_tokens") <= 64)
    assert assigned.count() == eligible.count()
    assert assigned.select("doc_id").distinct().count() == eligible.count()
    # single-bucket FFD over the whole partition packs tight: only the
    # tail sequence may be underfull, so mean fill must stay near 1 —
    # the per-batch restart bug would crater this
    fills = [r["fill_ratio"] for r in rows]
    assert sum(fills) / len(fills) > 0.99, sum(fills) / len(fills)


def test_pack_string_doc_ids(spark):
    """Doc ids need not be integral: string ids pack identically (the
    output doc_ids array carries the input id type through)."""
    docs = _docs(spark, n=500).select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "n_tokens",
    )
    packed, overflow = packing.pack_greedy(docs, 64)
    assert dict(packed.dtypes)["doc_ids"] == "array<string>"
    assigned = packing.pack_assignments(packed)
    n_eligible = docs.filter(F.col("n_tokens") <= 64).count()
    assert assigned.count() == n_eligible
    assert assigned.select("doc_id").distinct().count() == n_eligible
    assert all(r["doc_id"].startswith("doc-") for r in assigned.collect())


def _brute_best_fit(ids, toks, cap):
    """Reference best-fit with the SAME tie rule as the kernel (FIFO
    deque per remaining capacity) but a linear successor scan — the
    Fenwick tree is a pure speedup over this."""
    from collections import deque

    bin_ids, bin_rem = [], []
    avail = {}
    for did, tok in zip(ids, toks):
        tok = int(tok)
        r = next((r for r in range(tok, cap + 1) if avail.get(r)), -1)
        if r < 0:
            b = len(bin_ids)
            bin_ids.append([did])
            rem = cap - tok
            bin_rem.append(rem)
        else:
            b = avail[r].popleft()
            bin_ids[b].append(did)
            rem = r - tok
            bin_rem[b] = rem
        avail.setdefault(rem, deque()).append(b)
    return [(ids_, cap - rem) for ids_, rem in zip(bin_ids, bin_rem)]


def test_pack_best_fit_kernel_matches_reference_loop():
    """The Fenwick-indexed kernel must be bin-for-bin identical to a
    brute-force best-fit with the same tie rules, and land within 2
    bins of the LP lower bound on FFD-style input."""
    import random

    rng = random.Random(7)
    cap = 64
    rows = sorted(((rng.randint(1, cap), i) for i in range(2000)),
                  key=lambda t: (-t[0], t[1]))
    ids = [i for _, i in rows]
    toks = [t for t, _ in rows]
    out = packing._pack_bucket(ids, toks, cap)
    assert out == _brute_best_fit(ids, toks, cap)
    # invariants: conservation + capacity + quality
    packed_ids = [d for ids_, _ in out for d in ids_]
    assert sorted(packed_ids) == sorted(ids)
    assert all(0 < total <= cap for _, total in out)
    lower = -(-sum(toks) // cap)
    assert len(out) <= lower * 1.01 + 1, (len(out), lower)


def test_split_overflow_chunks(spark):
    """Overflow docs chunk into ceil(n/max) pieces of exactly max
    tokens plus a remainder tail; token totals conserve; chunk rows are
    packable (composition with pack_greedy keyed by (id, chunk))."""
    docs = _docs(spark, n=400)  # tokens 1..97
    cap = 32
    _, overflow = packing.pack_greedy(docs, cap)
    chunks = packing.split_overflow(overflow, cap)
    got = chunks.collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["chunk_tokens"]))
    orig = {r["doc_id"]: r["n_tokens"] for r in overflow.collect()}
    assert set(by_doc) == set(orig)
    for did, parts in by_doc.items():
        parts.sort()
        n = orig[did]
        assert len(parts) == -(-n // cap)                    # ceil
        assert [i for i, _ in parts] == list(range(len(parts)))
        assert sum(t for _, t in parts) == n                 # conservation
        assert all(0 < t <= cap for _, t in parts)
        assert all(t == cap for _, t in parts[:-1])          # full heads
    # composition: chunks pack cleanly under the same budget
    ck = chunks.select(
        F.concat_ws("#", F.col("doc_id").cast("string"),
                    F.col("chunk_index").cast("string")).alias("doc_id"),
        F.col("chunk_tokens").alias("n_tokens"))
    packed2, overflow2 = packing.pack_greedy(ck, cap)
    assert overflow2.count() == 0
    assert packing.pack_assignments(packed2).count() == chunks.count()


def test_split_overflow_is_shuffle_free(spark):
    docs = _docs(spark, n=100)
    _, overflow = packing.pack_greedy(docs, 32)
    chunks = packing.split_overflow(overflow, 32)
    p = chunks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
