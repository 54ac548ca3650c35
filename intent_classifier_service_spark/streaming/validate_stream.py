"""Structured Streaming validation.

The reference is batch-only (SURVEY §2.9) and the north rule's
resumability is handled by the checkpoint store — but the same compiled
rule plan runs unchanged over a stream, because the span/doc rule pass
is fully stateless (explode + filter, no aggregation). This module
wires that up:

  violations_stream  — the single-scan fused rule pass as a streaming
                       transformation (append-mode safe)
  run_available_now  — drain a parquet directory as a stream with
                       Trigger.AvailableNow (incremental batch: same
                       semantics as a kicked-off-hourly batch job, with
                       Spark's own checkpoint tracking files consumed)
  windowed_violation_counts — watermarked per-event-time-window verdict
                       counts for streams that carry a timestamp

At scale: a stateless stream shards by input file; no state store is
touched, so throughput ≈ batch. The windowed variant keeps one small
state row per (window, rule_id) — watermark bounds state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import rules as R
from ..sources.tables import DOCUMENTS_SPANS_SCHEMA


def read_documents_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(DOCUMENTS_SPANS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def violations_stream(docs_stream: DataFrame, rules: R.RuleSet | None = None,
                      valid_refs: DataFrame | None = None) -> DataFrame:
    """The exact batch rule pass — stateless, so valid on a stream.
    With ``valid_refs`` (a BATCH dim of valid media_refs), the
    referential check rides the same fused scan as a stream-static
    broadcast left join — stateless too, so still append-safe.
    Uniqueness stays batch-side (global aggregation = unbounded state
    on an infinite stream; full_violations(include_uniqueness=False))."""
    if valid_refs is None:
        return R.violations(docs_stream, rules)
    return R.full_violations(docs_stream, valid_refs, rules,
                             include_uniqueness=False)


def run_available_now(spark: SparkSession, in_dir: str, out_dir: str,
                      checkpoint_dir: str, rules: R.RuleSet | None = None) -> None:
    """Drain everything currently in in_dir, then stop (incremental
    batch). Re-running only processes files added since the last run —
    file-level resumability on top of the partition-level checkpoint
    store."""
    v = violations_stream(read_documents_stream(spark, in_dir), rules)
    q = (
        v.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(docs_stream: DataFrame, ts_col: str,
                 watermark: str = "30 minutes",
                 id_col: str = "doc_id") -> DataFrame:
    """Streaming uniqueness ENFORCEMENT with bounded state: ONE
    arbitrary copy per ``id_col`` within the watermark horizon
    survives — dropDuplicatesWithinWatermark keeps the first-OBSERVED
    row, and within a micro-batch (or an availableNow drain) there is
    no event-time ordering guarantee, so the survivor is not
    necessarily the earliest arrival (use dedup_stream_earliest below
    when first-by-event-time matters). Per-id state is evicted
    once the watermark passes its event time, so state size is bounded
    by arrival rate × watermark, not by corpus size. The streaming complement of the batch salted
    uniqueness rule — exact global uniqueness needs unbounded state on
    an infinite stream, so streams bound it by time (the standard
    lateness contract), and the batch layer owns the full-corpus check."""
    return docs_stream.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark([id_col])


def dedup_stream_earliest(docs_stream: DataFrame, ts_col: str,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          id_col: str = "doc_id") -> DataFrame:
    """Earliest-wins streaming dedup: one survivor per (id, event-time
    window), the row with the MINIMUM event time (full-row
    lexicographic tie-break) — the DETERMINISTIC variant dedup_stream
    cannot provide, since dropDuplicatesWithinWatermark keeps whichever
    copy a micro-batch happened to observe first. The reduction is the
    shared batch expression (operators/dedup.earliest_per_window:
    watermarked groupBy(window, id).min(struct(ts, payload))), so the
    batch query q_dedup_earliest_window oracles the exact semantics
    the stream runs.

    The trade vs dedup_stream: the dedup horizon is the WINDOW (an id
    recurring in two windows survives twice), and survivors emit only
    when the watermark closes their window — deterministic-but-late vs
    immediate-but-arbitrary. State is one struct per (id, open
    window), bounded by arrival rate × window and evicted at the
    watermark."""
    from ..operators.dedup import earliest_per_window

    return earliest_per_window(
        docs_stream.withWatermark(ts_col, watermark),
        ts_col, [id_col], window,
    )


def windowed_drift_psi(docs_stream: DataFrame, ts_col: str,
                       baseline_kind: DataFrame,
                       window: str = "10 minutes",
                       watermark: str = "30 minutes",
                       psi_threshold: float = 0.2) -> DataFrame:
    """Per-event-time-window span-kind PSI against the FROZEN batch
    baseline — the streaming analog of the batch drift gate
    (operators/drift.psi), so a drifted micro-batch flips a window's
    verdict the way a drifted corpus fails the batch job.

    Shape: two chained watermarked aggregations (supported since Spark
    3.4 multiple-stateful-operators): (window, kind) counts, then a
    per-window fold. The baseline is collected ONCE driver-side (it is
    a ≤ n_kinds-row frozen table) into literal map/array expressions,
    so the PSI — including the mass of baseline kinds ABSENT from the
    window, which a join-free sum would silently drop — is a pure JVM
    column expression (drift.psi_vs_frozen, shared with the batch
    windowed-PSI query so the two paths can never gate differently);
    no Python, no state beyond the windowed counts, watermark bounds
    everything.

    Output (append mode, finalized windows only): (window, n_spans,
    psi, pass, rule_id)."""
    from ..functions.spans import explode_spans
    from ..operators.drift import psi_vs_frozen

    rows = baseline_kind.collect()  # frozen baseline: tiny by contract
    qmap = {r["bucket"]: float(r["freq"]) for r in rows}

    exploded = explode_spans(
        docs_stream.withWatermark(ts_col, watermark), keep=(ts_col,)
    )
    counts = exploded.groupBy(
        F.window(ts_col, window).alias("window"),
        F.col("kind").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per_win = counts.groupBy("window").agg(
        F.collect_list(F.struct("bucket", "n")).alias("ks"),
        F.sum("n").alias("n_spans"),
    )
    psi_col = psi_vs_frozen(qmap, n_col="n_spans")
    return per_win.select(
        "window", "n_spans",
        psi_col.alias("psi"),
        (psi_col <= psi_threshold).alias("pass"),
        F.lit("R-DRIFT-KIND-PSI").alias("rule_id"),
    )


def windowed_violation_counts(docs_stream: DataFrame, ts_col: str,
                              window: str = "10 minutes",
                              watermark: str = "30 minutes",
                              rules: R.RuleSet | None = None) -> DataFrame:
    """Per-window violation counts with late-data handling: watermark
    bounds state, append mode emits each window once it's final."""
    v = R.violations(docs_stream.withWatermark(ts_col, watermark),
                     rules, keep=(ts_col,))
    return v.groupBy(F.window(ts_col, window), "rule_id").agg(
        F.count(F.lit(1)).alias("n_violations")
    )


def run_ingest_dedup(spark: SparkSession, in_dir: str, index_path: str,
                     out_dir: str, checkpoint_dir: str,
                     threshold: float = 0.7,
                     append_survivors: bool = True,
                     exact_index_path: str | None = None,
                     docs_schema: str = "doc_id long, text string") -> None:
    """Continuous-ingest cross-corpus dedup: drain new document files
    from ``in_dir`` (Trigger.AvailableNow — re-running processes only
    files added since the last run, Spark's own source checkpoint
    tracks what was consumed), and per micro-batch run the EXACT batch
    probe against the persisted MinHash band index via foreachBatch —
    the standard stream-batch reuse seam, so the streaming path
    executes dedup.pairs_against_index literally (same function the
    crosscorpus_neardup driver query oracles), never a re-derived
    streaming approximation.

    Per micro-batch:
      flagged pairs  → out_dir/flagged  (id_new, id_indexed,
                                         est_jaccard, batch_id)
      surviving docs → out_dir/kept     (docs with no index match)
      survivors fold into the index (append_survivors=True), so the
      NEXT batch — and the next RUN — dedups against them too.

    This is the 100 TB continuous-ingest loop the batch operators
    alone can't give: the standing corpus is probed, never re-paired,
    and grows monotonically with each drained batch. State: none in
    the stream itself (foreachBatch output is batch-written); the
    index IS the state, persisted and manifest-counted.

    Exactly-once caveat (documented, deliberate): sink writes inside
    foreachBatch are at-least-once under micro-batch RETRY — a crash
    between the parquet append and the source-offset commit replays
    the batch. The flagged/kept sinks carry batch_id so replays are
    detectable (and idempotent to consumers that dedup on it); the
    index append would double-count a replayed batch in the manifest,
    which overstates n_docs but never loses a signature — safe for
    candidate generation (extra identical band rows produce the same
    pairs). A transactional index (e.g. Iceberg) closes this at
    deployment; see sources/iceberg.py for the pinning machinery.

    ``exact_index_path`` (optional) runs the EXACT-digest probe first
    — the stage real ingest pipelines put before near-dup, since
    byte-identical copies are the overwhelming majority of web dups:
    exact hits land in out_dir/flagged_exact (id_new, id_indexed,
    n_indexed_copies, batch_id) and drop out of the batch before any
    MinHash signature is computed; survivors fold into BOTH indexes."""
    from ..operators import dedup as D

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        work = batch_df
        ex = None
        try:
            if batch_df.isEmpty():
                return
            if exact_index_path is not None:
                ex = D.exact_dups_against_index(
                    spark, exact_index_path, batch_df).persist()
                ex.withColumn("batch_id", F.lit(batch_id)) \
                    .write.mode("append").parquet(f"{out_dir}/flagged_exact")
                ex_ids = ex.select(F.col("id_new").alias("doc_id")).distinct()
                # ex stays persisted until the finally block: work is
                # LAZY here, so unpersisting now would recompute the
                # exact-probe join (index read + batch re-hash) at
                # every downstream action that evaluates work
                work = batch_df.join(ex_ids, "doc_id", "left_anti").persist()
            pairs = D.pairs_against_index(
                spark, index_path, work, threshold=threshold,
            ).persist()
            pairs.withColumn("batch_id", F.lit(batch_id)) \
                .write.mode("append").parquet(f"{out_dir}/flagged")
            dup_ids = pairs.select(
                F.col("id_new").alias("doc_id")).distinct()
            kept = work.join(dup_ids, "doc_id", "left_anti").persist()
            kept.withColumn("batch_id", F.lit(batch_id)) \
                .write.mode("append").parquet(f"{out_dir}/kept")
            if append_survivors:
                D.append_to_minhash_index(spark, index_path, kept)
                if exact_index_path is not None:
                    D.append_to_exact_index(spark, exact_index_path, kept)
            kept.unpersist()
            pairs.unpersist()
        finally:
            if ex is not None:
                ex.unpersist()
            if work is not batch_df:
                work.unpersist()
            batch_df.unpersist()

    q = (
        spark.readStream.schema(docs_schema).parquet(in_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_ingest_embedding_dedup(
        spark: SparkSession, in_dir: str, index_path: str,
        out_dir: str, checkpoint_dir: str,
        threshold: float = 0.95,
        append_survivors: bool = True,
        vec_schema: str = "vec_id long, embedding array<float>") -> None:
    """The EMBEDDING-modality twin of run_ingest_dedup: drain new
    vector files from ``in_dir`` (Trigger.AvailableNow + source
    checkpoint — re-running processes only files added since the last
    run) and per micro-batch run the literal batch probe
    similarity.embedding_pairs_against_index against the persisted
    hyperplane-LSH index. Flagged pairs → out_dir/flagged (id_new,
    id_indexed, cosine, batch_id); surviving vectors → out_dir/kept;
    survivors fold into the index so later batches AND later runs
    dedup against them. Same at-least-once sink caveat as the text
    drain (batch_id makes replays detectable)."""
    from ..operators import similarity as S

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            pairs = S.embedding_pairs_against_index(
                spark, index_path, batch_df, threshold=threshold,
            ).persist()
            pairs.withColumn("batch_id", F.lit(batch_id)) \
                .write.mode("append").parquet(f"{out_dir}/flagged")
            dup_ids = pairs.select(
                F.col("id_new").alias("vec_id")).distinct()
            kept = batch_df.join(dup_ids, "vec_id", "left_anti").persist()
            kept.withColumn("batch_id", F.lit(batch_id)) \
                .write.mode("append").parquet(f"{out_dir}/kept")
            if append_survivors:
                S.append_to_embedding_index(spark, index_path, kept)
            kept.unpersist()
            pairs.unpersist()
        finally:
            batch_df.unpersist()

    q = (
        spark.readStream.schema(vec_schema).parquet(in_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
