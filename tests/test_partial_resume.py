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
