"""Resume semantics (SURVEY §5: kill after k partitions → rerun →
identical final verdicts, no partition validated twice) + the
end-to-end validate job."""

import os

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.streaming.checkpoint import CheckpointStore
from jobs import validate


def test_pending_partitions_anti_join(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    all_parts = spark.createDataFrame([(i,) for i in range(4)], "part_key int")
    assert store.pending_partitions(all_parts).count() == 4
    store.mark_done(0, "snap-1", 1, 100, 2)
    store.mark_done(2, "snap-1", 1, 50, 0)
    pending = sorted(r["part_key"] for r in store.pending_partitions(all_parts).collect())
    assert pending == [1, 3]


def test_rule_version_isolation(spark, tmp_path):
    path = str(tmp_path / "ckpt2")
    v1 = CheckpointStore(spark, path, rule_version="v1")
    v1.mark_done(0, "snap-1", 1, 10, 0)
    v2 = CheckpointStore(spark, path, rule_version="v2")
    all_parts = spark.createDataFrame([(0,)], "part_key int")
    # new rule version must re-validate everything
    assert v2.pending_partitions(all_parts).count() == 1
    assert v1.pending_partitions(all_parts).count() == 0


def test_validate_job_end_to_end_and_resume(spark, tmp_path):
    docs = datagen.documents_spans(spark, 1500)
    refs = datagen.valid_media_refs(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    store = CheckpointStore(spark, ckpt)
    r1 = validate.run(spark, docs, refs, out, store)
    assert r1["gate_pass"] is True
    assert r1["n_docs"] == 1500

    violations = spark.read.parquet(os.path.join(out, "violations"))
    assert violations.filter(F.col("rule_id") == "R-SPAN-KIND").count() > 0
    assert violations.filter(F.col("rule_id") == "R-REF-MEDIA").count() > 0
    assert violations.filter(F.col("rule_id") == "R-DOC-UNIQUE").count() > 0

    # resume: everything checkpointed → second run validates 0 docs,
    # but the final verdicts are reconstructed from the checkpointed
    # per-rule stats and the gate still passes (drift runs on the full
    # table, not the empty pending subset)
    store2 = CheckpointStore(spark, ckpt)
    out2 = str(tmp_path / "out2")
    r2 = validate.run(spark, docs, refs, out2, store2, resume=True)
    assert r2["n_docs"] == 0
    assert r2["gate_pass"] is True
    assert all(d["pass"] for d in r2["drift"])

    fresh_vd = spark.read.parquet(os.path.join(out, "verdicts"))
    resumed_vd = spark.read.parquet(os.path.join(out2, "verdicts"))
    assert fresh_vd.exceptAll(resumed_vd).count() == 0
    assert resumed_vd.exceptAll(fresh_vd).count() == 0

    # checkpoint lineage: n_docs is a true per-partition doc count
    total_ckpt_docs = (
        store2.spark.read.parquet(ckpt)
        .groupBy("part_key").agg(F.max("n_docs").alias("n"))
        .agg(F.sum("n")).collect()[0][0]
    )
    assert total_ckpt_docs == 1500


def test_validate_job_depth_opts(spark, tmp_path):
    """The opt-in depth features wired through the job (round-5 verdict
    #6): Gopher repetition DocRules join the gate, and the near-dup
    dedup stage (survivor=best_score, quality_score) writes the
    surviving corpus to <output>/deduped — planted clone docs collapse
    to one survivor each while the gate verdict is still asserted."""
    from intent_classifier_service_spark.plans import rules as R

    docs = datagen.documents_spans(spark, 800)
    clones = docs.limit(20).withColumn(
        "doc_id", F.concat(F.lit("clone-"), F.col("doc_id")))
    refs = datagen.valid_media_refs(spark)
    out = str(tmp_path / "out")

    rules = R.RuleSet(doc_rules=[*R.DOC_RULES, *R.repetition_rules()])
    r = validate.run(spark, docs.unionByName(clones), refs, out,
                     rules=rules, dedup_survivor="best_score")
    assert r["gate_pass"] is True  # synthetic corpus passes the Gopher bars
    assert r["n_docs"] == 820

    # repetition rules really joined the gate: verdict rows exist
    vd = spark.read.parquet(os.path.join(out, "verdicts"))
    reps = {row["rule_id"] for row in vd.collect()}
    assert {"R-DOC-REP-LINES", "R-DOC-REP-2GRAM"} <= reps

    # dedup stage: each planted clone pairs with its source (identical
    # text → est_jaccard 1.0) and exactly one of the pair survives
    assert r["dedup"]["survivor"] == "best_score"
    assert r["dedup"]["n_in"] == 820
    assert r["dedup"]["n_dropped"] >= 20
    deduped = spark.read.parquet(os.path.join(out, "deduped"))
    assert deduped.count() == r["dedup"]["n_kept"]
    assert set(deduped.columns) == {"doc_id", "spans", "part_key"}
    # per clone pair, exactly one member survives
    survivors = {row["doc_id"] for row in deduped.select("doc_id").collect()}
    clone_ids = {row["doc_id"] for row in clones.select("doc_id").collect()}
    for cid in clone_ids:
        assert (cid in survivors) != (cid.removeprefix("clone-") in survivors)


def test_resume_refuses_legacy_violations_layout(tmp_path):
    """A violations dir from the old partition_by=('rule_id',) layout
    (parquet files directly under rule_id=*/) must make --resume fail
    loudly: dynamic overwrite under the new (rule_id, part_key) layout
    would leave stale files mixed with fresh partition dirs."""
    import pytest

    viol = tmp_path / "out" / "violations" / "rule_id=R-SPAN-KIND"
    viol.mkdir(parents=True)
    (viol / "part-00000.parquet").write_bytes(b"PAR1")
    with pytest.raises(RuntimeError, match="single-level partition layout"):
        validate._check_violations_layout(str(tmp_path / "out" / "violations"))
    # new layout (files nested under part_key=*/) passes
    new = tmp_path / "out2" / "violations" / "rule_id=R-SPAN-KIND" / "part_key=3"
    new.mkdir(parents=True)
    (new / "part-00000.parquet").write_bytes(b"PAR1")
    validate._check_violations_layout(str(tmp_path / "out2" / "violations"))
    # absent dir (fresh output) passes
    validate._check_violations_layout(str(tmp_path / "nope"))


def test_validate_job_strip_dup_paragraphs(spark, tmp_path):
    """--strip-dup-paragraphs (round-6 verdict #3): planted cross-doc
    boilerplate paragraphs are stripped from the text spans before rule
    validation (exactly ONE occurrence survives corpus-wide), every
    occurrence lands in the violations sink as an R-PARA-DUP row, and
    the gate verdict is computed over the stripped corpus."""
    BOILER = "subscribe to our newsletter for weekly updates and offers"
    docs = datagen.documents_spans(spark, 600)
    planted = docs.limit(30).withColumn(
        "doc_id", F.concat(F.lit("boiler-"), F.col("doc_id"))
    ).withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.when(
                s["kind"] == "text",
                s.withField("text", F.concat(s["text"], F.lit("\n" + BOILER))),
            ).otherwise(s)),
    )
    all_docs = docs.unionByName(planted)
    n_boiler_spans = (
        planted.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "text").count()
    )
    assert n_boiler_spans >= 30

    # unit-level: the strip keeps exactly one occurrence corpus-wide
    docs2, viol = validate._apply_paragraph_strip(all_docs, 30)
    kept = (
        docs2.select(F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "text")
                & F.col("s.text").contains(BOILER)).count()
    )
    assert kept == 1
    assert docs2.count() == all_docs.count()
    assert viol.count() == n_boiler_spans  # one row per occurrence

    # e2e through the job flag: violations sink + gate verdict
    out = str(tmp_path / "out")
    r = validate.run(spark, all_docs, datagen.valid_media_refs(spark), out,
                     strip_dup_paragraphs=True)
    assert r["gate_pass"] is True
    assert r["n_docs"] == 630
    assert r["paragraph_dedup"]["n_duplicate_occurrences"] == n_boiler_spans
    v = spark.read.parquet(os.path.join(out, "violations"))
    para_rows = v.filter(F.col("rule_id") == "R-PARA-DUP")
    assert para_rows.count() == n_boiler_spans
    # sharing is counted per distinct text-span UNIT (doc, span pos)
    assert para_rows.filter(~F.col("observed").contains(
        f"n_docs_sharing={n_boiler_spans}")).count() == 0


def test_validate_job_strip_dup_windows(spark, tmp_path):
    """--strip-dup-windows: a planted duplicated token run is cut from
    every text span except the globally-first occurrence, each cut
    interval lands in the violations sink as an R-SUBSTR-DUP row, and
    the gate verdict is computed over the stripped corpus."""
    RUN = " ".join(f"dup{i}" for i in range(60))  # 60-token planted run
    docs = datagen.documents_spans(spark, 600)
    planted = docs.limit(20).withColumn(
        "doc_id", F.concat(F.lit("substr-"), F.col("doc_id"))
    ).withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.when(
                s["kind"] == "text",
                s.withField("text", F.concat(s["text"], F.lit(" " + RUN))),
            ).otherwise(s)),
    )
    all_docs = docs.unionByName(planted)
    n_run_spans = (
        planted.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "text").count()
    )
    assert n_run_spans >= 20

    # unit-level: exactly one occurrence of the run survives corpus-wide
    docs2, viol = validate._apply_window_strip(all_docs, 8, 50)
    kept = (
        docs2.select(F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "text")
                & F.col("s.text").contains("dup0 dup1 dup2")).count()
    )
    assert kept == 1
    assert docs2.count() == all_docs.count()
    # every non-keeper occurrence contributes at least one cut interval
    assert viol.count() >= n_run_spans - 1

    # e2e through the job flag: violations sink + gate verdict + summary
    out = str(tmp_path / "out")
    r = validate.run(spark, all_docs, datagen.valid_media_refs(spark), out,
                     strip_dup_windows=True)
    assert r["gate_pass"] is True
    assert r["n_docs"] == 620
    assert r["substring_dedup"]["min_run_tokens"] == 50
    n_sink = r["substring_dedup"]["n_cut_intervals"]
    v = spark.read.parquet(os.path.join(out, "violations"))
    assert v.filter(F.col("rule_id") == "R-SUBSTR-DUP").count() == n_sink
    assert n_sink >= n_run_spans - 1


def test_validate_job_lm_ppl_flags(spark, tmp_path):
    """--max-ppl: the job flags EXACTLY the text spans whose
    self-scored unigram-LM perplexity exceeds the threshold — the
    expected (doc_id, span_index) set is derived from the oracled
    operator itself, the threshold placed between the two highest
    distinct ppl values so the set is non-empty, non-total and
    tie-stable. Text is untouched (flagging, not stripping)."""
    from intent_classifier_service_spark.operators import textstats

    docs = datagen.documents_spans(spark, 300)
    _ex, units = validate._text_span_units(docs)
    scores = textstats.lm_doc_scores(units, id_col="_uid",
                                     text_col="text").collect()
    vals = sorted({r["ppl"] for r in scores}, reverse=True)
    assert len(vals) >= 3
    thr = (vals[0] + vals[1]) / 2  # flags only the top distinct ppl
    expected = {(r["id"]["doc_id"], r["id"]["_pos"])
                for r in scores if r["ppl"] > thr}
    assert 0 < len(expected) < len(scores)

    out = str(tmp_path / "out")
    r = validate.run(spark, docs, datagen.valid_media_refs(spark), out,
                     max_ppl=thr)
    assert r["gate_pass"] is True
    assert r["lm_ppl"]["max_ppl"] == thr
    assert r["lm_ppl"]["n_flagged_spans"] == len(expected)
    v = spark.read.parquet(os.path.join(out, "violations")).filter(
        F.col("rule_id") == "R-LM-PPL")
    got = {(row["doc_id"], row["span_index"])
           for row in v.select("doc_id", "span_index").collect()}
    assert got == expected
    # observed payload carries the score; text was not rewritten
    assert all(row["observed"].startswith("ppl=")
               for row in v.select("observed").collect())
