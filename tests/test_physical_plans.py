"""Plan-quality gates: the physical plans Catalyst produces for the
engine's key operators must keep their scale-critical properties —
pushdown, pruning, broadcast-only joins, top-k without global sort,
partial aggregation. A regression here is a performance bug even if
results stay correct."""

import re

from intent_classifier_service_spark import datagen, driver_queries as DQ
from intent_classifier_service_spark.operators import referential
from intent_classifier_service_spark.plans import rules as R

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    p = _plan(DQ.q_tpch_q1(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in p
    m = re.search(r"ReadSchema: struct<([^\n]*)", p)
    # the plan printer may truncate the line; check pruning on the
    # visible prefix — key columns must be absent, projected ones present
    line = m.group(1)
    assert "l_quantity" in line
    assert "l_orderkey" not in line and "l_partkey" not in line
    assert "HashAggregate" in p  # partial+final hash agg


def test_q3_broadcast_only_topk(spark):
    p = _plan(DQ.q_tpch_q3(spark, SF))
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p  # no global sort for top-10


def _hint_count(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count("UnresolvedHint") \
        + df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_no_forced_broadcast_on_fact_scaling_tables(spark):
    """customer and part grow linearly with the fact data (~15M
    customer / ~20M part rows at sf100), so q3/q10/q14/q18 must NOT
    carry a hard broadcast hint on them — the hint would bypass AQE's
    size check and force a multi-GB broadcast at scale (round-3/round-4
    verdict scale-killers). Only bounded dims (nation: 25 rows) may
    keep hints. The optimizer must still CHOOSE broadcast at sf0.1
    from its size estimates — proving the hint was redundant at test
    scale and dangerous only at 100×."""
    sf01 = "/root/testdata/sf0.1"
    assert _hint_count(DQ.q_tpch_q3(spark, sf01)) == 0
    assert _hint_count(DQ.q_tpch_q18(spark, sf01)) == 0
    assert _hint_count(DQ.q_tpch_q14(spark, sf01)) == 0
    assert _hint_count(DQ.q_tpch_q10(spark, sf01)) == 1  # nation only

    for q in (DQ.q_tpch_q3, DQ.q_tpch_q10, DQ.q_tpch_q14, DQ.q_tpch_q18):
        df = q(spark, sf01)
        df.collect()  # let AQE finalize the executed plan
        p = _plan(df)
        assert "BroadcastHashJoin" in p, q.__name__
        assert "SortMergeJoin" not in p, q.__name__


def test_tpch_suite_hint_discipline(spark):
    """Round-5 TPC-H completions: forced broadcast hints may appear
    ONLY on bounded dims (nation: 25 rows, region: 5 rows) and 1-row
    scalar riders — never on customer/part/supplier-derived inputs,
    which scale with the fact data. Exact counts pin the hint set."""
    assert _hint_count(DQ.q_tpch_q2(spark, SF)) == 2   # nation + region
    assert _hint_count(DQ.q_tpch_q7(spark, SF)) == 2   # nation ×2
    assert _hint_count(DQ.q_tpch_q8(spark, SF)) == 3   # nation ×2 + region
    assert _hint_count(DQ.q_tpch_q9(spark, SF)) == 1   # nation
    # q11: nation hint counts twice (val's subtree is embedded again
    # under the 1-row `tot` scalar aggregate) + the tot hint itself.
    assert _hint_count(DQ.q_tpch_q11(spark, SF)) == 3
    assert _hint_count(DQ.q_tpch_q12(spark, SF)) == 0
    assert _hint_count(DQ.q_tpch_q19(spark, SF)) == 0
    assert _hint_count(DQ.q_tpch_q20(spark, SF)) == 1  # nation


def test_q19_disjunctive_predicate_stays_equi_join(spark):
    """Q19's OR-of-ANDs references both join sides; Catalyst must still
    extract the l_partkey equi-key — a nested-loop/cartesian here reads
    every (lineitem, part) pair at 100 TB."""
    p = _plan(DQ.q_tpch_q19(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_referential_is_broadcast_anti(spark):
    docs = datagen.documents_spans(spark, 100)
    p = _plan(referential.referential_violations(docs, datagen.valid_media_refs(spark)))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_referential_large_dim_plan_and_parity(spark):
    """The large-dim referential variant must (a) carry exactly ONE
    broadcast hint — the dangling-set broadcast-back, never the dim —
    (b) compile to equi-joins only, and (c) return row-identical
    results to the broadcast path (same oracle)."""
    docs = datagen.documents_spans(spark, 200)
    dim = datagen.valid_media_refs(spark)
    big = referential.referential_violations_large_dim(docs, dim)
    assert _hint_count(big) == 1
    p = _plan(big)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "LeftSemi" in p and "LeftAnti" in p
    small = referential.referential_violations(docs, dim)
    assert sorted(map(tuple, big.collect()), key=lambda t: (t[0], t[2])) == \
           sorted(map(tuple, small.collect()), key=lambda t: (t[0], t[2]))
    assert big.count() > 0  # datagen plants dangling refs


def test_span_query_prunes_documents_scan(spark):
    p = _plan(DQ.q_span_kind_violations(spark, SF))
    m = re.search(r"ReadSchema: struct<([^\n]*)", p)
    assert m and "doc_id" in m.group(1) and "text" in m.group(1)
    assert "lang" not in m.group(1) and "source" not in m.group(1)


def test_rule_pass_has_no_shuffle_before_emit(spark):
    """The fused span-rule violation pass must be shuffle-free: scan →
    project/explode/filter only (Exchange appears only if the caller
    repartitions)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from intent_classifier_service_spark.driver_queries import derived_spans

    v = R.violations(derived_spans(docs), R.RuleSet(doc_rules=[]))
    p = _plan(v)
    # exactly the one deliberate round-robin repartition from
    # derived_spans; the rule pass itself adds none
    assert p.count("Exchange") <= 1


def test_word_topk_take_ordered(spark):
    p = _plan(DQ.q_word_topk(spark, SF))
    assert "TakeOrderedAndProject" in p


def test_pair_generators_never_cartesian(spark):
    """Every near-dup pair generator must build candidates from
    equi-joins on band/bucket/shingle keys — a CartesianProduct or
    BroadcastNestedLoopJoin anywhere is the 100 TB scale killer."""
    from intent_classifier_service_spark.operators import dedup

    for q in (DQ.q_minhash_lsh_pairs, DQ.q_simhash_pairs,
              DQ.q_embedding_neardup_lsh):
        p = _plan(q(spark, SF))
        assert "CartesianProduct" not in p, q.__name__
        assert "BroadcastNestedLoop" not in p, q.__name__

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(dedup.ngram_jaccard_pairs(docs.select("doc_id", "text")))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    # the shingle df-cap pre-pass rides in as a semi-join
    assert "LeftSemi" in p

    # the cross-corpus index probe is the same discipline: ONE
    # (band, bucket) equi-join between the batch and the persisted
    # index; the id inequality must ride as a post-join filter, never
    # demote the join to a nested loop
    p = _plan(DQ.q_crosscorpus_neardup(spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p

    # ... and the exact-digest index probe: one (shard, digest,
    # digest2) equi-join, id inequality as a residual filter
    p = _plan(DQ.q_crosscorpus_exact(spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p

    # ... and the SimHash band-table index probe
    p = _plan(DQ.q_crosscorpus_simhash(spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_lm_scoring_zero_shuffle(spark):
    """The unigram-LM SCORING pass must be key-shuffle-free (round-9):
    one mapInPandas over (id, token-string) with the broadcast vocab
    dict — no hash-partitioned Exchange anywhere. The old plan's
    per-doc collect_list re-aggregation shipped every token's log-prob
    through a doc-keyed Exchange (~corpus-sized shuffle at 100 TB for
    a per-doc scalar), and the round-8 gate (BroadcastHashJoin
    present) guarded the wrong axis — the join was never the problem.
    The only Exchange permitted is _tw's RoundRobin under-split guard
    above the scan, which vanishes at scale (fires only when the
    input arrives with fewer splits than cores)."""
    p = _plan(DQ.q_lm_quality_scores(spark, SF))
    assert "MapInPandas" in p
    assert "hashpartitioning" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_cluster_resolution_equi_joins_only(spark):
    """Hash-min label propagation must be equi-joins + groupBy.min:
    gate one propagation round (the loop's localCheckpoint truncation
    hides it from the final plan) and the dedup anti-join."""
    from pyspark.sql import functions as F

    from intent_classifier_service_spark.operators import dedup

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    p = _plan(dedup._propagate_round(edges, labels))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p

    docs = spark.createDataFrame([(i, "t") for i in range(5)],
                                 "doc_id long, text string")
    p = _plan(dedup.neardup_dedup(docs, pairs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "LeftAnti" in p


def test_q21_quantifiers_are_aggregates_single_fact_scan(spark):
    """r9: the EXISTS/NOT-EXISTS pair compiles to per-order aggregates
    over distinct (order, supplier) pairs — ONE lineitem scan (the join
    form read the fact table three times and its semi/anti build sides
    were full-fact projections: a corpus-sized broadcast or shuffle at
    scale). Still no nested-loop/cartesian anywhere, the finished-order
    restriction stays a semi hash join, and the fact table must appear
    in exactly one scan node."""
    p = _plan(DQ.q_tpch_q21(spark, SF))
    assert "LeftSemi" in p
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p
    assert p.count("lineitem.parquet") == 1


def test_q13_outer_join_keeps_zero_order_customers(spark):
    p = _plan(DQ.q_tpch_q13(spark, SF))
    assert "LeftOuter" in p
    assert "CartesianProduct" not in p
    rows = {r["c_count"]: r["custdist"] for r in DQ.q_tpch_q13(spark, SF).collect()}
    assert 0 in rows  # customers with no qualifying orders survive


def test_text_normalize_is_shuffle_free(spark):
    """F3/F13 normalization is a pure scan→project pass: zero
    Exchange, zero Python."""
    p = _plan(DQ.q_text_normalize(spark, SF))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_split_ops_plan_discipline(spark):
    """hash_split is a pure scan->project pass (zero Exchange, zero
    Python); leakage_safe_split's only join is the equi join against
    the candidates-only cluster table — never a cartesian."""
    from intent_classifier_service_spark.operators import sampling as S

    docs = DQ._t(spark, SF, "documents").select("doc_id")
    p = _plan(S.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    p2 = _plan(DQ.q_leakage_safe_split(spark, SF))
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoop" not in p2


def test_mixture_sample_window_is_boundary_bucket_only(spark):
    """mixture_sample's hash path must never put a corpus-scale group
    through a Window: the ONLY Window in the plan is the boundary-
    bucket exact top-up, whose subtree carries the `_mbkt = t` equality
    filter (so ~group_size/buckets rows reach it); the below-threshold
    branch is a stateless filter with no Window at all. Guards the
    round-6 scale-killer (row_number over whole source groups)."""
    df = DQ.q_mixture_sample(spark, SF)
    p = _plan(df)
    lines = p.splitlines()
    win_lines = [i for i, ln in enumerate(lines) if re.search(r"\bWindow\b", ln)]
    assert len(win_lines) == 1, f"expected exactly one Window:\n{p}"
    w = win_lines[0]
    # the window's subtree (Sort → Exchange → Filter → scan) must pin
    # the boundary-bucket equality before any scan; Catalyst inlines
    # _mbkt into `pmod(...) = CASE ...` pushed onto the FileScan
    subtree = "\n".join(lines[w:w + 10])
    assert re.search(r"pmod\([^\n]*\) = CASE", subtree), subtree
    # and the below-threshold branch is a windowless pmod(...) < filter
    assert re.search(r"pmod\([^\n]*\) < CASE", p), p

    # the token-grain variant shares the two-phase shape: its one
    # Window (the boundary running sum) also sits above the boundary-
    # bucket equality filter
    p2 = _plan(DQ.q_mixture_sample_tokens(spark, SF))
    lines2 = p2.splitlines()
    wins2 = [i for i, ln in enumerate(lines2) if re.search(r"\bWindow\b", ln)]
    assert len(wins2) == 1, f"expected exactly one Window:\n{p2}"
    subtree2 = "\n".join(lines2[wins2[0]:wins2[0] + 10])
    assert re.search(r"pmod\([^\n]*\) = CASE", subtree2), subtree2
    assert re.search(r"pmod\([^\n]*\) < CASE", p2), p2


def test_paragraph_dedup_driver_query_plans(spark):
    """The driver-facing paragraph queries stay equi-join only (the
    operator-level gate lives in test_paragraph_dedup; this covers the
    synthesized multi-paragraph corpus path end to end)."""
    for q in (DQ.q_paragraph_dedup, DQ.q_strip_dup_paragraphs):
        p = _plan(q(spark, SF))
        assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
