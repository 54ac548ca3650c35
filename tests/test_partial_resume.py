"""SURVEY §5 resume test: kill after k partitions → rerun → identical
final verdicts, no partition validated twice."""

import os

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.streaming.checkpoint import CheckpointStore
from jobs import validate


def test_partial_resume_completes_only_pending(spark, tmp_path):
    docs = datagen.documents_spans(spark, 2000)
    refs = datagen.valid_media_refs(spark)
    ckpt = str(tmp_path / "ckpt")

    # simulate a run killed after validating partitions {0, 5, 9}:
    # status rows + the per-rule stats those partitions really produce
    store = CheckpointStore(spark, ckpt)
    done_docs = docs.filter(F.col("part_key").isin(0, 5, 9))
    from intent_classifier_service_spark.plans import rules as R
    store.append_rule_stats(R.verdicts(done_docs, R.RuleSet(), by=("part_key",)))
    for pk in (0, 5, 9):
        store.mark_done(pk, "snap-0", 1, 100, 3)

    # resumed run: must validate only the pending partitions
    out = str(tmp_path / "out_resumed")
    store2 = CheckpointStore(spark, ckpt)
    r = validate.run(spark, docs, refs, out, store2, resume=True)

    done_parts = {0, 5, 9}
    all_parts = {row["part_key"] for row in docs.select("part_key").distinct().collect()}
    expected_docs = docs.filter(~F.col("part_key").isin(*done_parts)).count()
    assert r["n_docs"] == expected_docs

    # the artifact is the COMPLETE per-partition table (completed
    # partitions reconstructed from checkpointed stats)...
    vd_part = spark.read.parquet(os.path.join(out, "verdicts_by_partition"))
    covered = {row["part_key"] for row in vd_part.select("part_key").distinct().collect()}
    assert covered == all_parts
    # ...while THIS run only computed the pending partitions — nothing
    # validated twice (run-scoped rows in the rule-stats log)
    ran = {
        row["part_key"]
        for row in spark.read.parquet(ckpt + "_rules")
        .filter(F.col("run_id") == store2.run_id)
        .select("part_key").distinct().collect()
    }
    assert ran == all_parts - done_parts

    # after the resumed run, everything is checkpointed → next run: 0 docs
    r2 = validate.run(spark, docs, refs, str(tmp_path / "out_final"),
                      CheckpointStore(spark, ckpt), resume=True)
    assert r2["n_docs"] == 0

    # and the union of both runs' verdicts equals a from-scratch run
    fresh_out = str(tmp_path / "out_fresh")
    validate.run(spark, docs, refs, fresh_out)
    fresh = spark.read.parquet(os.path.join(fresh_out, "verdicts_by_partition"))
    resumed_subset = vd_part.join(
        spark.createDataFrame([(p,) for p in all_parts - done_parts], "part_key int"),
        "part_key", "left_semi",
    )
    fresh_subset = fresh.join(
        spark.createDataFrame([(p,) for p in all_parts - done_parts], "part_key int"),
        "part_key", "left_semi",
    )
    assert fresh_subset.exceptAll(resumed_subset).count() == 0
    assert resumed_subset.exceptAll(fresh_subset).count() == 0

    # the resumed run's GLOBAL verdicts already equal the from-scratch
    # run's: completed partitions contribute their checkpointed
    # per-rule stats to the rollup
    fresh_vd = spark.read.parquet(os.path.join(fresh_out, "verdicts"))
    resumed_vd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert fresh_vd.exceptAll(resumed_vd).count() == 0
    assert resumed_vd.exceptAll(fresh_vd).count() == 0


def test_resume_into_same_output_preserves_artifacts(spark, tmp_path):
    """A resumed run into the SAME --output dir must leave the complete
    violations and column_stats artifacts intact: dynamic partition
    overwrite replaces only the re-validated partitions, so a
    zero-pending rerun replaces nothing (the round-2 advice bug: static
    overwrite clobbered the complete tables with pending-only/empty)."""
    docs = datagen.documents_spans(spark, 1500)
    refs = datagen.valid_media_refs(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    validate.run(spark, docs, refs, out, CheckpointStore(spark, ckpt))
    # materialize driver-side: the DataFrame's file listing would go
    # stale once a later run rewrites partition files
    from collections import Counter
    v_before = Counter(
        map(tuple, spark.read.parquet(os.path.join(out, "violations")).collect())
    )
    n_v = sum(v_before.values())
    n_s = spark.read.parquet(os.path.join(out, "column_stats")).count()
    assert n_v > 0 and n_s > 0

    # zero-pending resume into the SAME dir → artifacts unchanged
    r = validate.run(spark, docs, refs, out, CheckpointStore(spark, ckpt),
                     resume=True)
    assert r["n_docs"] == 0
    assert spark.read.parquet(os.path.join(out, "violations")).count() == n_v
    assert spark.read.parquet(os.path.join(out, "column_stats")).count() == n_s

    # partial resume (one partition re-opened) rewrites ONLY that
    # partition; the union stays the complete, from-scratch-equal table
    pk = int(docs.select("part_key").first()["part_key"])
    # simulate a partial checkpoint: drop pk from the log by filtering
    # it into a fresh checkpoint path
    ckpt2 = str(tmp_path / "ckpt2")
    spark.read.parquet(ckpt).filter(F.col("part_key") != pk) \
        .write.parquet(ckpt2)
    spark.read.parquet(ckpt + "_rules").filter(F.col("part_key") != pk) \
        .write.parquet(ckpt2 + "_rules")
    r2 = validate.run(spark, docs, refs, out, CheckpointStore(spark, ckpt2),
                      resume=True)
    assert r2["n_docs"] == docs.filter(F.col("part_key") == pk).count()
    v_after = Counter(
        map(tuple, spark.read.parquet(os.path.join(out, "violations")).collect())
    )
    assert v_after == v_before
    assert spark.read.parquet(os.path.join(out, "column_stats")).count() == n_s


def test_done_without_rule_stats_is_revalidated(spark, tmp_path):
    """A partition whose latest status is 'done' but with no rows in
    the _rules log (crash between stat append and mark-done under the
    OLD ordering, or a pre-rules-log checkpoint) must be treated as
    pending — otherwise the rollup silently omits it while claiming
    completeness."""
    docs = datagen.documents_spans(spark, 1000)
    refs = datagen.valid_media_refs(spark)
    ckpt = str(tmp_path / "ckpt")

    store = CheckpointStore(spark, ckpt)
    store.mark_done(0, "snap-0", 1, 100, 3)  # done, but NO rule stats
    all_parts = docs.select("part_key").distinct()
    pending = {
        r["part_key"]
        for r in store.pending_partitions(
            all_parts, require_rule_stats=True).collect()
    }
    assert 0 in pending  # the gap partition is surfaced as pending

    # and the job actually re-validates it → global verdicts equal a
    # from-scratch run
    out = str(tmp_path / "out")
    r = validate.run(spark, docs, refs, out, CheckpointStore(spark, ckpt),
                     resume=True)
    assert r["n_docs"] == docs.count()  # partition 0 re-validated too
    fresh_out = str(tmp_path / "fresh")
    validate.run(spark, docs, refs, fresh_out)
    fresh = spark.read.parquet(os.path.join(fresh_out, "verdicts"))
    resumed = spark.read.parquet(os.path.join(out, "verdicts"))
    assert fresh.exceptAll(resumed).count() == 0
    assert resumed.exceptAll(fresh).count() == 0


def test_incremental_resume_never_rescans_completed(spark, tmp_path):
    """Merge-based resume (round-3 verdict #4): after a fully
    checkpointed run, the table's completed partitions are REPLACED
    with poison (duplicate doc_ids everywhere + all-media spans — data
    that would blow up uniqueness and kind-PSI if read). A resume must
    produce verdicts and drift identical to the fresh run, proving the
    global rules were reconstructed from checkpointed per-partition
    state, not from a table scan. A second phase re-opens ONE
    partition (left unpoisoned) and checks the same invariant under a
    genuine pending subset."""
    import shutil

    from pyspark.sql import functions as F
    from intent_classifier_service_spark.sources import tables

    orig = str(tmp_path / "docs_orig")
    datagen.documents_spans(spark, 1500).write.parquet(orig)
    path = str(tmp_path / "docs")
    shutil.copytree(orig, path)

    refs = datagen.valid_media_refs(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stored = tables.read_documents_spans(spark, path)
    r1 = validate.run(spark, stored, refs, out, CheckpointStore(spark, ckpt))
    fresh_vd = sorted(map(tuple, spark.read.parquet(
        os.path.join(out, "verdicts")).collect()))
    fresh_uniq = sorted(
        r["doc_id"] for r in spark.read.parquet(os.path.join(out, "violations"))
        .filter(F.col("rule_id") == "R-DOC-UNIQUE").collect()
    )

    def poisoned(df):
        bad_span = lambda s: F.struct(  # noqa: E731
            F.lit("media").alias("kind"), s["text"].alias("text"),
            s["media_ref"].alias("media_ref"), s["offset"].alias("offset"),
        )
        return df.select(
            F.lit("dup").alias("doc_id"),
            F.transform("spans", bad_span).alias("spans"),
            "part_key",
        )

    # ---- phase 1: zero pending, every partition's data poisoned ----
    pdf = poisoned(tables.read_documents_spans(spark, orig))
    shutil.rmtree(path)
    pdf.write.parquet(path)
    stored2 = tables.read_documents_spans(spark, path)
    out2 = str(tmp_path / "out2")
    r2 = validate.run(spark, stored2, refs, out2,
                      CheckpointStore(spark, ckpt), resume=True)
    assert r2["n_docs"] == 0
    assert r2["drift"] == r1["drift"]          # exact same statistics
    assert r2["gate_pass"] == r1["gate_pass"] is True
    resumed_vd = sorted(map(tuple, spark.read.parquet(
        os.path.join(out2, "verdicts")).collect()))
    assert resumed_vd == fresh_vd
    resumed_uniq = sorted(
        r["doc_id"] for r in spark.read.parquet(os.path.join(out2, "violations"))
        .filter(F.col("rule_id") == "R-DOC-UNIQUE").collect()
    )
    assert resumed_uniq == fresh_uniq

    # ---- phase 2: one partition re-opened; only IT is scanned ----
    pk = int(datagen.documents_spans(spark, 1500)
             .select("part_key").first()["part_key"])
    store = CheckpointStore(spark, ckpt)
    store._append(spark.createDataFrame(
        [(pk, "reopened", "snap", 1, store.rule_version, 0, 0,
          store.run_id, store._stamp())],
        "part_key int, status string, snapshot_id string, files_read int, "
        "rule_version string, n_docs long, n_violations long, "
        "run_id string, completed_at string",
    ))
    o = tables.read_documents_spans(spark, orig)
    mixed = poisoned(o.filter(F.col("part_key") != pk)).unionByName(
        o.filter(F.col("part_key") == pk)
    )
    shutil.rmtree(path)
    mixed.write.parquet(path)
    stored3 = tables.read_documents_spans(spark, path)
    out3 = str(tmp_path / "out3")
    r3 = validate.run(spark, stored3, refs, out3,
                      CheckpointStore(spark, ckpt), resume=True)
    assert r3["n_docs"] == o.filter(F.col("part_key") == pk).count()
    assert r3["drift"] == r1["drift"]
    vd3 = sorted(map(tuple, spark.read.parquet(
        os.path.join(out3, "verdicts")).collect()))
    assert vd3 == fresh_vd
    uniq3 = sorted(
        r["doc_id"] for r in spark.read.parquet(os.path.join(out3, "violations"))
        .filter(F.col("rule_id") == "R-DOC-UNIQUE").collect()
    )
    assert uniq3 == fresh_uniq
