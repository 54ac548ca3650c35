"""End-to-end validation job — the engine's EP1 (reference service
startup: load → evaluate → threshold gate → start/refuse,
server.py:140-185, gpt_intent_classifier.py:318-403).

spark-submit --py-files engine.zip jobs/validate.py \
    --input <parquet of (doc_id, spans, part_key)> \
    --output <dir> [--checkpoint <dir>] [--resume] [--n-docs 100000]

Exit code 0 iff every rule passes (the 'server starts' decision);
1 otherwise. Violations, verdicts, and stats land under --output.
Resumable: with --checkpoint, completed partitions are skipped on rerun.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intent_classifier_service_spark import datagen  # noqa: E402
from intent_classifier_service_spark.operators import drift, stats  # noqa: E402
from intent_classifier_service_spark.plans import fused as F_fused  # noqa: E402
from intent_classifier_service_spark.plans import rules as R  # noqa: E402
from intent_classifier_service_spark.session import get_spark  # noqa: E402
from intent_classifier_service_spark.sources import tables  # noqa: E402
from intent_classifier_service_spark.streaming.checkpoint import CheckpointStore  # noqa: E402


def _check_violations_layout(path: str) -> None:
    """Refuse to resume into a violations dir written by the old
    single-level layout (partition_by=('rule_id',) — parquet files
    directly under rule_id=*/). Dynamic overwrite on the new
    ('rule_id','part_key') layout would replace NONE of the old files,
    leaving stale and fresh rows mixed for hive-partitioned readers.
    Failing loudly beats silent duplication; a full (non-resume) run
    into the same --output rewrites the dir cleanly."""
    import glob as _glob
    legacy = [
        f for f in _glob.glob(os.path.join(path, "rule_id=*", "*.parquet"))
        if os.path.isfile(f)
    ]
    if legacy:
        raise RuntimeError(
            f"--resume into {path}: found {len(legacy)} parquet file(s) "
            "directly under rule_id=*/ (old single-level partition "
            "layout). Dynamic overwrite with the current "
            "(rule_id, part_key) layout would leave stale rows mixed "
            "with new ones. Rerun without --resume (full rewrite) or "
            "delete the old violations dir first."
        )


def _doc_counts(docs):
    """(part_key, doc_id, n) — the per-partition uniqueness state."""
    return docs.groupBy(
        F.col("part_key").cast("int").alias("part_key"), F.col("doc_id")
    ).agg(F.count(F.lit(1)).alias("n"))


def _apply_paragraph_strip(docs, min_chars: int):
    """Boilerplate removal over the spans corpus (--strip-dup-paragraphs):
    every TEXT span's text is a paragraph-bearing unit keyed by
    (doc_id, part_key, span position); dedup.strip_duplicate_paragraphs
    removes every occurrence of a cross-doc duplicated paragraph except
    the globally-first, and the doc's span array is rebuilt with the
    stripped text in original span order. Returns (stripped_docs,
    violation_rows) — one R-PARA-DUP violation row per duplicate-
    paragraph occurrence, shaped for the violations sink.

    Global transform like drift: it always reads the FULL corpus (a
    pending-only view would miss cross-partition sharing), so it runs
    BEFORE the resume pending filter; resume semantics are untouched.
    Docs with a null doc_id are excluded from stripping (they fail
    R-DOC-ID-NOTNULL anyway and a null key can't equi-join back).
    Precondition: (doc_id, part_key) identifies a document — the span
    rebuild groups on it, so a corpus that already violates R-DOC-
    UNIQUE would see duplicate ids' span sets merged; run uniqueness
    first (the default gate does) before trusting stripped output."""
    from intent_classifier_service_spark.operators import dedup as D

    ex, units = _text_span_units(docs)
    viol = D.paragraph_duplicates(units, id_col="_uid",
                                  min_chars=min_chars).select(
        F.col("_uid.part_key").alias("part_key"),
        F.col("_uid.doc_id").alias("doc_id"),
        F.lit("R-PARA-DUP").alias("rule_id"),
        F.col("_uid._pos").cast("int").alias("span_index"),
        F.format_string("para_index=%d,para_hash=%d,n_docs_sharing=%d",
                        F.col("para_index"), F.col("para_hash"),
                        F.col("n_docs_sharing")).alias("observed"),
        F.lit("paragraph unique across corpus "
              "(duplicate stripped, first occurrence kept)").alias("expected"),
    )
    stripped = D.strip_duplicate_paragraphs(
        units, id_col="_uid", min_chars=min_chars
    ).select(F.col("_uid"), F.col("text").alias("_new_text"))
    return _rebuild_spans(docs, ex, stripped), viol


def _text_span_units(docs):
    """(exploded, units): every TEXT span's text as a rewrite unit keyed
    by struct(doc_id, part_key, span position) — shared by the
    paragraph and substring-window strips. Null doc_ids are excluded
    (they fail R-DOC-ID-NOTNULL anyway and can't equi-join back)."""
    ex = docs.select(
        "doc_id", "part_key",
        F.posexplode_outer("spans").alias("_pos", "_span"),
    )
    units = ex.filter(
        (F.col("_span.kind") == "text") & F.col("_span.text").isNotNull()
        & F.col("doc_id").isNotNull()
    ).select(
        F.struct("doc_id", "part_key", "_pos").alias("_uid"),
        F.col("_span.text").alias("text"),
    )
    return ex, units


def _rebuild_spans(docs, ex, stripped):
    """Re-attach rewritten unit texts onto their spans and rebuild each
    doc's span array in original order (unmatched spans untouched)."""
    rebuilt = (
        ex.filter(F.col("_pos").isNotNull())
        .join(stripped,
              F.struct("doc_id", "part_key", "_pos") == F.col("_uid"), "left")
        .withColumn(
            "_span2",
            F.when(F.col("_new_text").isNotNull(),
                   F.col("_span").withField("text", F.col("_new_text")))
            .otherwise(F.col("_span")))
        .groupBy("doc_id", "part_key")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_span2"))),
            lambda s: s["_span2"]).alias("_spans2"))
    )
    return (
        docs.join(rebuilt, ["doc_id", "part_key"], "left")
        .select("doc_id",
                F.coalesce("_spans2", "spans").alias("spans"), "part_key")
    )


def _apply_window_strip(docs, k: int, min_run_tokens: int):
    """ExactSubstr removal over the spans corpus (--strip-dup-windows):
    cross-doc duplicated token runs of >= min_run_tokens tokens are cut
    from every TEXT span except the globally-first occurrence
    (dedup.strip_duplicate_windows semantics at span-unit grain).
    Returns (stripped_docs, violation_rows) — one R-SUBSTR-DUP row per
    cut interval, shaped for the violations sink. Same global-transform
    contract as the paragraph strip: full-corpus view, runs BEFORE the
    resume pending filter."""
    from intent_classifier_service_spark.operators import dedup as D

    ex, units = _text_span_units(docs)
    cuts = D.duplicate_cut_intervals(
        units, k=k, min_run_tokens=min_run_tokens, id_col="_uid")
    viol = cuts.select(
        F.col("_uid.part_key").alias("part_key"),
        F.col("_uid.doc_id").alias("doc_id"),
        F.lit("R-SUBSTR-DUP").alias("rule_id"),
        F.col("_uid._pos").cast("int").alias("span_index"),
        F.format_string("start_token=%d,end_token=%d,n_windows=%d",
                        F.col("start_token"), F.col("end_token"),
                        F.col("n_windows")).alias("observed"),
        F.lit("token run unique across corpus "
              "(duplicate run cut, first occurrence kept)").alias("expected"),
    )
    stripped = D.strip_duplicate_windows(
        units, k=k, min_run_tokens=min_run_tokens, id_col="_uid", cuts=cuts
    ).select(F.col("_uid"), F.col("text").alias("_new_text"))
    return _rebuild_spans(docs, ex, stripped), viol


def _lm_ppl_violations(docs, max_ppl: float):
    """R-LM-PPL violation rows (--max-ppl): TEXT span units whose
    self-scored unigram-LM perplexity (textstats.lm_doc_scores, the
    CCNet quality stage) exceeds the threshold. Pure flagging — the
    corpus is NOT rewritten; verdicts describe the original text, the
    gate decides. Same global-transform contract as the strips: the
    LM trains on the FULL corpus view, so resume reruns it whole."""
    from intent_classifier_service_spark.operators import textstats as T

    _ex, units = _text_span_units(docs)
    flagged = T.lm_doc_scores(units, id_col="_uid", text_col="text") \
        .filter(F.col("ppl") > max_ppl)
    return flagged.select(
        F.col("id.part_key").alias("part_key"),
        F.col("id.doc_id").alias("doc_id"),
        F.lit("R-LM-PPL").alias("rule_id"),
        F.col("id._pos").cast("int").alias("span_index"),
        F.format_string("ppl=%.4f,n_tokens=%d",
                        F.col("ppl"), F.col("n_tokens")).alias("observed"),
        F.format_string("unigram-LM perplexity <= %.4f",
                        F.lit(float(max_ppl))).alias("expected"),
    )


def run(spark, docs, valid_refs, output: str, store: CheckpointStore | None = None,
        resume: bool = False, rules: R.RuleSet | None = None,
        baseline: str | None = None, snapshot_id: str = "parquet-v0",
        dedup_survivor: str | None = None,
        strip_dup_paragraphs: bool = False,
        para_min_chars: int = 30,
        strip_dup_windows: bool = False,
        window_k: int = 8,
        min_run_tokens: int = 50,
        max_ppl: float | None = None) -> dict:
    rules = rules or R.RuleSet()
    t0 = time.time()
    para_viol = None
    n_para_viol = None
    win_viol = None
    n_win_viol = None
    lm_viol = None
    n_lm_viol = None
    if strip_dup_paragraphs:
        # boilerplate strip BEFORE rule validation: verdicts/violations
        # describe the STRIPPED corpus; the duplicate-paragraph
        # occurrences themselves surface as R-PARA-DUP violation rows
        docs, para_viol = _apply_paragraph_strip(docs, para_min_chars)
    if strip_dup_windows:
        # ExactSubstr removal (on the post-paragraph text when both are
        # on): cut intervals surface as R-SUBSTR-DUP violation rows
        docs, win_viol = _apply_window_strip(docs, window_k, min_run_tokens)
    if strip_dup_paragraphs or strip_dup_windows:
        # the stripped corpus feeds several downstream actions
        # (verdicts, drift, profiles); without a materialization each
        # action re-runs the whole strip explode/join subtree. At
        # 100 TB this would be a parquet write+read; in-process the
        # persist is the same plan cut.
        docs = docs.persist()
    if max_ppl is not None:
        # LM perplexity flagging on the POST-strip corpus — rows only,
        # text untouched
        lm_viol = _lm_ppl_violations(docs, max_ppl)
    docs_all = docs  # the legacy (non-incremental) resume path scans it
    done_keys: list[int] = []
    if store is not None and resume:
        all_parts = docs.select("part_key").distinct()
        # SNAPSHOT the pending set to driver-side literals: a lazy
        # anti-join against the checkpoint log would be re-evaluated on
        # every downstream action — including ones AFTER this run marks
        # its partitions done, silently collapsing the lineage to empty
        # (bit the per-rule stats append). The set is metadata-sized.
        # require_rule_stats: a 'done' partition with no rows in the
        # rules log can't contribute to the rollup reconstruction below
        # (crash between stat append and mark-done, or an old-format
        # checkpoint) — treat it as pending and re-validate it.
        pending_keys = [
            r["part_key"]
            for r in store.pending_partitions(
                all_parts, require_rule_stats=True
            ).collect()
        ]
        done_keys = sorted(
            {r["part_key"] for r in store.completed_partitions().collect()}
            - set(pending_keys)
        )
        docs = (
            docs.filter(F.col("part_key").isin(pending_keys))
            if pending_keys else docs.limit(0)
        )

    # Explicit repartition by doc_id hash (north rule) — evens out skew
    # from the hot part_key before the multi-action validation pass, and
    # persist so the N downstream actions reuse one shuffle instead of
    # re-shuffling the input N times. At 100 TB you would NOT persist:
    # each rule family re-scans parquet (cheaper than caching), the span
    # rules are already fused into one scan (plans/rules.py), and only
    # uniqueness/referential shuffle — on narrow projected columns.
    docs = docs.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions")), F.col("doc_id")
    ).persist()
    n_docs = docs.count()

    # fused two-scan pass: span + referential violations from one
    # explode (broadcast-left-join flag), uniqueness from a doc_id-only
    # columnar scan (plans/rules.py full_violations)
    # Partitioned by (rule_id, part_key); resumed runs overwrite in
    # DYNAMIC mode so a pending-only pass replaces only the partitions
    # it re-validated — never the completed ones already on disk (the
    # inputs are immutable under checkpointing, so a re-validated
    # partition's rows are identical to what a from-scratch run writes,
    # and the on-disk union stays the complete artifact).
    resuming = store is not None and resume
    if resuming:
        _check_violations_layout(os.path.join(output, "violations"))
    # Uniqueness and drift are GLOBAL rules (duplicate doc_ids and
    # distribution mass span partitions). Resumed runs take one of two
    # paths:
    #   incremental — when the checkpoint holds per-partition doc
    #     counts AND drift histogram counts for every completed
    #     partition: merge stored state with this run's pending-only
    #     state. NO scan of completed partitions happens at all (the
    #     round-3 verdict's resume-cost fix).
    #   legacy — checkpoints predating the incremental state (or
    #     simulated ones) fall back to full-table scans of the narrow
    #     projections, exactly as before.
    incremental = resuming and store.global_state_covers(done_keys)
    uniq_rows = None
    pending_profiles = None
    pending_doc_counts = None
    dups = None
    if incremental:
        if n_docs > 0:
            # persisted: each feeds two actions (checkpoint write +
            # merged-global computation); both frames are narrow
            # (ids / histogram rows), spillable, unpersisted below.
            pending_profiles = drift.partitioned_profile_counts(
                docs, lo=0, hi=128
            ).persist()
            pending_doc_counts = _doc_counts(docs).persist()
        # the merge runs on the fixed-width 128-bit hashed state
        # (streaming/checkpoint.py round-4 #6); names are resolved only
        # for the duplicate set — from pending rows in memory and from
        # the bucket-pruned _docnames sidecar for completed partitions.
        from intent_classifier_service_spark.operators import uniqueness as U
        from intent_classifier_service_spark.streaming import checkpoint as CK
        merged_doc_counts = store.stored_doc_counts(done_keys)
        pending_names = None
        if pending_doc_counts is not None:
            merged_doc_counts = merged_doc_counts.unionByName(
                CK.hash_doc_counts(pending_doc_counts)
            )
            pending_names = CK.doc_name_rows(pending_doc_counts)
        # persisted: consumed by the bucket-list collect, the name
        # join, AND the violations write — tiny (gate-passing corpora
        # have few duplicates)
        dups = U.duplicate_hashes(merged_doc_counts).persist()
        names = store.lookup_doc_names(dups)
        if pending_names is not None:
            names = names.unionByName(pending_names)
        uniq_rows = U.violations_from_hashed_counts(dups, names)
    all_v = R.full_violations(
        docs, valid_refs, rules, keep=("part_key",),
        uniqueness_from=docs_all if (resuming and not incremental) else None,
        uniqueness_rows=uniq_rows,
    )
    if para_viol is not None:
        # R-PARA-DUP rows ride the same sink; they are recomputed over
        # the FULL corpus every run (global transform), so on resume
        # the dynamic overwrite replaces exactly the (R-PARA-DUP, *)
        # partitions with a complete fresh set — never a stale mix
        all_v = all_v.unionByName(para_viol.select(*all_v.columns))
    if win_viol is not None:
        # R-SUBSTR-DUP rides the same global-transform contract
        all_v = all_v.unionByName(win_viol.select(*all_v.columns))
    if lm_viol is not None:
        # R-LM-PPL rides the same global-transform contract
        all_v = all_v.unionByName(lm_viol.select(*all_v.columns))
    tables.write_violations(all_v, os.path.join(output, "violations"),
                            partition_by=("rule_id", "part_key"),
                            dynamic=resuming)
    if para_viol is not None or win_viol is not None or lm_viol is not None:
        # summary counts from the just-written sink — re-counting the
        # lazy viol frames would re-run the whole strip explode/join
        # subtree a second time
        written = spark.read.parquet(os.path.join(output, "violations"))
        if para_viol is not None:
            n_para_viol = written.filter(
                F.col("rule_id") == "R-PARA-DUP").count()
        if win_viol is not None:
            n_win_viol = written.filter(
                F.col("rule_id") == "R-SUBSTR-DUP").count()
        if lm_viol is not None:
            n_lm_viol = written.filter(
                F.col("rule_id") == "R-LM-PPL").count()

    # one scan for per-partition verdicts; global verdicts are a rollup
    # of the tiny per-partition table, not a second pass over the docs.
    # On resume, completed partitions contribute their checkpointed
    # per-rule stats, so the final verdict table equals a from-scratch
    # run even when this run validated 0 docs.
    #
    # Fresh runs fuse verdicts + both drift distributions into ONE
    # grouping-sets scan (plans/fused.py — parity-pinned). Resumed runs
    # fall back to separate passes because drift must profile the FULL
    # table while verdicts cover only pending partitions.
    fused_profile = None
    fused_text = None
    fused_counts = None
    if store is None or not resume:
        vd_part, fused_kind, fused_off, fused_lang, fused_q, fused_counts = (
            F_fused.fused_verdicts_and_drift(docs, rules, lo=0, hi=128)
        )
        fused_profile = (fused_kind, fused_off)
        fused_text = (fused_lang, fused_q)
    else:
        # persist: three consumers below (verdicts write, rule-stats
        # append, mark-done counts) would otherwise each re-run the
        # full explode + hash aggregation over the pending partitions;
        # the aggregate itself is parts×rules rows — metadata-sized.
        # (The fused path needs no persist: it collects once.)
        vd_part = R.verdicts(docs, rules, by=("part_key",)).persist()

    # verdicts_by_partition is always the COMPLETE per-partition table:
    # on resume, completed partitions' rows are reconstructed from the
    # checkpointed per-rule stats (rate/pass re-derived with the same
    # formula), so resuming into the same --output dir never replaces a
    # complete artifact with a pending-only one.
    vd_part_full = vd_part
    if store is not None and resume:
        stored = store.completed_rule_stats()
        rate = F.when(F.col("n_checked") > 0,
                      F.col("n_violations") / F.col("n_checked")).otherwise(F.lit(0.0))
        vd_part_full = vd_part.unionByName(
            stored.select(
                "part_key", "rule_id", "n_checked", "n_violations",
                rate.alias("violation_rate"),
            ).withColumn(  # per-rule pass bars (RuleSet.threshold_expr)
                "pass", F.col("violation_rate") <= rules.threshold_expr()
            )
        )
    tables.write_violations(vd_part_full, os.path.join(output, "verdicts_by_partition"))
    vd_new = spark.read.parquet(os.path.join(output, "verdicts_by_partition"))
    vd = R.rollup_verdicts(
        vd_new.select("part_key", "rule_id", "n_checked", "n_violations"), rules
    )
    tables.write_violations(vd, os.path.join(output, "verdicts"))

    # column_stats is per-partition → same dynamic-overwrite treatment
    # on resume as violations (complete artifact survives a pending-only
    # or zero-pending rerun into the same --output dir).
    st = stats.column_stats(docs, ["doc_id", "spans"], by=("part_key",))
    tables.write_violations(st, os.path.join(output, "column_stats"),
                            partition_by=("part_key",), dynamic=resuming)

    # drift vs the frozen baseline snapshot; first run freezes one.
    # Drift is a GLOBAL distribution check, so it always reads the full
    # table (docs_all), never the pending subset — a resumed run over 0
    # pending docs must not compare an empty distribution to the
    # baseline. One extra scan of completed partitions; acceptable
    # because the drift pass reads only kind+offset columns.
    baseline_path = os.path.join(output, "..", "drift_baseline") if baseline is None else baseline
    if not os.path.exists(baseline_path):
        drift.write_baseline(docs_all, baseline_path)
    b_kind, b_off = drift.load_baseline(spark, baseline_path)
    merged_text = None
    if fused_profile is not None:
        cur_kind, cur_off = fused_profile  # from the fused single scan
        drift_rows = drift.verdicts_from_profiles(cur_kind, cur_off, b_kind, b_off)
    elif incremental:
        # merge-based resume: stored per-partition histogram counts for
        # completed partitions + this run's pending-only counts sum to
        # EXACTLY the full-table counts — no scan of completed data.
        merged_counts = store.stored_profiles(done_keys)
        if pending_profiles is not None:
            merged_counts = merged_counts.unionByName(pending_profiles)
        m_kind, m_off, m_lang, m_q = drift.distributions_from_counts(
            spark, merged_counts
        )
        merged_text = (m_lang, m_q)
        drift_rows = drift.verdicts_from_profiles(m_kind, m_off, b_kind, b_off)
    else:
        drift_rows = drift.drift_verdicts(docs_all, b_kind, b_off, lo=0, hi=128)

    # text-profile drift (lang-ID PSI + quality-histogram KS) — the
    # LLM-pipeline text operators feeding the validation gate. Skipped
    # for baselines frozen before these rows existed. Fresh runs get
    # the current profiles from the SAME fused scan as everything else;
    # resumed runs pay one doc-level scan of the full table (global
    # distribution, like the span drift above).
    b_text = drift.load_text_baseline(spark, baseline_path)
    if b_text is not None:
        if fused_text is not None:
            cur_lang, cur_q = fused_text
        elif merged_text is not None:
            cur_lang, cur_q = merged_text  # from the same merged counts
        else:
            cur_lang, cur_q = drift.text_distributions(docs_all)
        drift_rows += drift.text_verdicts_from_profiles(
            cur_lang, cur_q, b_text[0], b_text[1]
        )

    gate_pass = R.gate(vd) and all(d["pass"] for d in drift_rows)

    # Optional near-dup dedup stage (--dedup-survivor): MinHash+LSH →
    # label propagation → survivor policy over the FULL corpus (a
    # global transform like drift — resume never shrinks its input),
    # surviving docs written to output/deduped. 'best_score' keeps the
    # highest textstats.quality_score member per cluster (the default
    # score a training-data pipeline wants); 'min_id' is the
    # deterministic baseline. Independent of the gate verdict: the
    # gate answers "is this corpus valid", dedup emits the corpus a
    # downstream trainer should read.
    dedup_summary = None
    if dedup_survivor is not None:
        from intent_classifier_service_spark.operators import dedup as D
        from intent_classifier_service_spark.operators.drift import doc_text
        from intent_classifier_service_spark.operators.textstats import quality_score

        corpus = docs_all.withColumn("_text", doc_text())
        pairs = D.minhash_lsh_pairs(
            corpus.select("doc_id", F.col("_text").alias("text"))
        )
        score_col = None
        if dedup_survivor == "best_score":
            corpus = corpus.withColumn("_score", quality_score("_text"))
            score_col = "_score"
        kept = D.neardup_dedup(
            corpus, pairs, survivor=dedup_survivor, score_col=score_col
        ).drop("_text", "_score")
        tables.write_violations(kept, os.path.join(output, "deduped"))
        n_total = docs_all.count()
        n_kept = spark.read.parquet(os.path.join(output, "deduped")).count()
        dedup_summary = {
            "survivor": dedup_survivor,
            "n_in": n_total,
            "n_kept": n_kept,
            "n_dropped": n_total - n_kept,
        }

    if store is not None:
        # n_docs per partition: a doc rule's n_checked counts exactly
        # one row per document (first-span or empty-doc row), so the
        # count is already in THIS RUN's vd_part — no extra corpus scan
        # (max() across all rules would wrongly pick a span count).
        # n_violations is the sum across rules (a multi-rule row counts
        # once per rule — documented summary semantics).
        if rules.doc_rules:
            part_counts = vd_part.filter(
                F.col("rule_id") == rules.doc_rules[0].rule_id
            ).select("part_key", F.col("n_checked").alias("n_docs"))
        else:  # no doc rules in the set → fall back to a count scan
            part_counts = docs.groupBy("part_key").agg(
                F.count(F.lit(1)).alias("n_docs")
            )
        part_viols = vd_part.groupBy("part_key").agg(
            F.sum("n_violations").alias("n_violations")
        )
        # Rule stats BEFORE mark-done: a crash between the two leaves a
        # rule-stats row without 'done' (harmless — the partition stays
        # pending and is re-validated). The reverse order would leave a
        # 'done' partition whose verdicts can never be reconstructed —
        # which pending_partitions(require_rule_stats=True) also guards
        # against for pre-existing checkpoints.
        # Incremental global-rule state (drift histogram counts +
        # doc_id occurrence counts) for the partitions THIS run
        # validated — written before mark-done like the rule stats, so
        # a crash in between leaves the partition pending, never
        # 'done'-without-state. Fresh runs reuse the fused scan's
        # per-partition counts (no extra pass); resumed runs write
        # their pending-only state, so even a legacy-path resume
        # builds coverage toward future merge-based resumes.
        if fused_counts is not None:
            store.write_profiles(fused_counts)
            store.write_doc_counts(_doc_counts(docs))
        elif n_docs > 0:
            if pending_profiles is None:
                pending_profiles = drift.partitioned_profile_counts(
                    docs, lo=0, hi=128
                )
                pending_doc_counts = _doc_counts(docs)
            store.write_profiles(pending_profiles)
            store.write_doc_counts(pending_doc_counts)
        store.append_rule_stats(vd_part)
        store.mark_done_bulk(part_counts.join(part_viols, "part_key"),
                             snapshot_id=snapshot_id)

    if resuming:
        vd_part.unpersist()
    for _df in (pending_profiles, pending_doc_counts, dups):
        if _df is not None and _df.is_cached:
            _df.unpersist()
    docs.unpersist()
    wall = time.time() - t0
    out = {
        "n_docs": n_docs,
        "gate_pass": bool(gate_pass),
        "wall_sec": wall,
        "docs_per_sec": n_docs / wall if wall > 0 else None,
        "drift": drift_rows,
    }
    if dedup_summary is not None:
        out["dedup"] = dedup_summary
    if n_para_viol is not None:
        out["paragraph_dedup"] = {"min_chars": para_min_chars,
                                  "n_duplicate_occurrences": n_para_viol}
    if n_win_viol is not None:
        out["substring_dedup"] = {"window_k": window_k,
                                  "min_run_tokens": min_run_tokens,
                                  "n_cut_intervals": n_win_viol}
    if n_lm_viol is not None:
        out["lm_ppl"] = {"max_ppl": max_ppl,
                         "n_flagged_spans": n_lm_viol}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="stored (doc_id, spans, part_key) table; default: synthetic")
    ap.add_argument("--input-format", choices=("parquet", "jsonl"), default="parquet",
                    help="storage format of --input (jsonl = one JSON doc per line)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--max-violation-rate", type=float, default=0.05,
                    help="per-rule gate threshold (reference: valid >= 95%%)")
    ap.add_argument("--baseline", default=None,
                    help="frozen drift-baseline parquet (written on first run if absent)")
    ap.add_argument("--repetition-rules", action="store_true",
                    help="add the Gopher-style intra-doc repetition DocRules "
                         "(repeated-line fraction / top-2-gram mass) to the gate")
    ap.add_argument("--dedup-survivor", choices=("min_id", "best_score"), default=None,
                    help="run MinHash near-dup dedup over the corpus and write "
                         "survivors to <output>/deduped; best_score keeps the "
                         "highest quality_score member per cluster")
    ap.add_argument("--strip-dup-paragraphs", action="store_true",
                    help="strip cross-document duplicate paragraphs from text "
                         "spans before rule validation (first occurrence kept); "
                         "occurrences surface as R-PARA-DUP violation rows")
    ap.add_argument("--para-min-chars", type=int, default=30,
                    help="minimum trimmed paragraph length considered by "
                         "--strip-dup-paragraphs (shorter lines are near-"
                         "universal and carry no dedup value)")
    ap.add_argument("--strip-dup-windows", action="store_true",
                    help="ExactSubstr removal: cut cross-document duplicated "
                         "token runs >= --min-run-tokens from text spans "
                         "before rule validation (first occurrence kept); "
                         "cut intervals surface as R-SUBSTR-DUP rows")
    ap.add_argument("--window-k", type=int, default=8,
                    help="token-window width for --strip-dup-windows")
    ap.add_argument("--min-run-tokens", type=int, default=50,
                    help="minimum duplicated run length (tokens) cut by "
                         "--strip-dup-windows (Lee et al. use 50)")
    ap.add_argument("--max-ppl", type=float, default=None,
                    help="flag text spans whose self-scored unigram-LM "
                         "perplexity exceeds this as R-LM-PPL violation "
                         "rows (CCNet quality stage; text untouched)")
    args = ap.parse_args()

    spark = get_spark("validate")
    snapshot_id = "synthetic-v0"
    if args.input:
        if args.input_format == "jsonl":
            docs = tables.read_documents_jsonl(spark, args.input)
            snapshot_id = f"jsonl:{args.input}"
        else:
            # freeze the input's CURRENT file set as a manifest snapshot
            # and pin the whole run to it — genuine lineage: the
            # checkpoint records which exact files each partition's
            # verdicts came from, and files appended mid-run or later
            # can't leak in (Iceberg VERSION AS OF semantics; parquet
            # manifest fallback in this sandbox).
            from intent_classifier_service_spark.operators import schema_check
            from intent_classifier_service_spark.sources import iceberg as IB
            snapshot_id = IB.write_snapshot_manifest(args.input)
            # fail-fast schema gate BEFORE forcing the declared schema:
            # a missing column would otherwise read as all-null and
            # surface late as a flood of null-rate violations. Pure
            # footer metadata — no data scan. Extra columns tolerated
            # (evolution-by-addition is the one compatible change).
            # PER-FILE footer diff: a single-footer (or merged) read
            # hides per-file drift — older files missing a column union
            # away behind newer ones while the forced-schema read still
            # yields all-null values for them (the exact failure this
            # gate exists to prevent).
            schema_check.assert_schema_per_file(
                args.input, tables.DOCUMENTS_SPANS_SCHEMA
            )
            docs = tables.read_documents_spans(spark, args.input,
                                               snapshot_id=snapshot_id)
    else:
        docs = datagen.documents_spans(spark, args.n_docs)
    refs = datagen.valid_media_refs(spark)
    store = CheckpointStore(spark, args.checkpoint) if args.checkpoint else None
    doc_rules = list(R.DOC_RULES)
    if args.repetition_rules:
        doc_rules += R.repetition_rules()
    rules = R.RuleSet(doc_rules=doc_rules,
                      max_violation_rate=args.max_violation_rate)
    result = run(spark, docs, refs, args.output, store, args.resume, rules,
                 baseline=args.baseline, snapshot_id=snapshot_id,
                 dedup_survivor=args.dedup_survivor,
                 strip_dup_paragraphs=args.strip_dup_paragraphs,
                 para_min_chars=args.para_min_chars,
                 strip_dup_windows=args.strip_dup_windows,
                 window_k=args.window_k,
                 min_run_tokens=args.min_run_tokens,
                 max_ppl=args.max_ppl)
    print(json.dumps(result))
    return 0 if result["gate_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
