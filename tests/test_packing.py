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
