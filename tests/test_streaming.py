"""Streaming validation: the stateless rule pass over a file stream
must produce exactly the batch result; re-run consumes nothing new."""

import os

from pyspark.sql import functions as F

from intent_classifier_service_spark import datagen
from intent_classifier_service_spark.plans import rules as R
from intent_classifier_service_spark.streaming import validate_stream as VS


def test_available_now_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = datagen.documents_spans(spark, 1000)
    docs.write.parquet(in_dir)

    VS.run_available_now(spark, in_dir, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    expected = R.violations(spark.read.parquet(in_dir))
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0

    # incremental semantics: nothing new → second drain appends nothing
    VS.run_available_now(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == expected.count()

    # new file arrives → only its violations are appended
    datagen.documents_spans(spark, 200).write.mode("append").parquet(in_dir)
    VS.run_available_now(spark, in_dir, out_dir, ckpt)
    total_expected = R.violations(spark.read.parquet(in_dir)).count()
    assert spark.read.parquet(out_dir).count() == total_expected


def test_windowed_violation_counts_plan(spark, tmp_path):
    """Watermarked windowed aggregation compiles and runs (availableNow,
    append mode) over a timestamped stream."""
    in_dir = str(tmp_path / "win_in")
    docs = datagen.documents_spans(spark, 500).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(mins=(F.crc32("doc_id") % 120).cast("int")),
    )
    docs.write.parquet(in_dir)

    stream = (
        spark.readStream.schema(
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
            "part_key int, ts timestamp"
        ).parquet(in_dir)
    )
    agg = VS.windowed_violation_counts(stream, "ts")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    # watermark semantics: append emits only windows older than the
    # max event time minus watermark — with a 2h spread and 30min
    # watermark, most windows finalize
    assert len(rows) > 0
    assert all(r["n_violations"] > 0 for r in rows)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: state survives across
    micro-batches (file 2 closes the session file 1 opened), and the
    emitted sessions match the batch sessionizer's semantics."""
    import datetime as dt
    import glob
    import time

    from pyspark.sql import functions as F
    from intent_classifier_service_spark.streaming.sessions_stream import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    in_dir = str(tmp_path / "in")
    # file 1: user 1 has a 3-event session; user 2 one event
    spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=5)), (1, t0 + dt.timedelta(minutes=10)),
         (2, t0)],
        "user_id long, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    # file 2: 2 hours later — closes user 1's and user 2's sessions
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=2)), (2, t0 + dt.timedelta(hours=3))],
        "user_id long, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    assert len(glob.glob(in_dir + "/*.parquet")) == 2

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory").queryName("closed_sessions")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    for _ in range(60):
        if not q.isActive:
            break
        time.sleep(1)
    got = {
        (r["user_id"], r["n_events"], r["duration_sec"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # user 1: 3 events over 10 min; user 2: singleton session
    assert (1, 3, 600) in got
    assert (2, 1, 0) in got


def test_stateful_sessionize_idle_timeout_flush(spark, tmp_path):
    """A user with NO further events still gets their session emitted
    once the watermark passes last+gap (EventTimeTimeout): user 1's
    12:00-12:10 session is flushed by user 2's much-later event
    advancing the watermark — under NoTimeout it would stay open
    forever (round-2 gap #3)."""
    import datetime as dt
    import glob
    import time

    from intent_classifier_service_spark.streaming.sessions_stream import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    in_dir = str(tmp_path / "in")
    # file 1: user 1's only events ever
    spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=10))],
        "user_id long, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    # file 2: a DIFFERENT user 6h later — advances the watermark past
    # user 1's last+gap (12:40); user 1 never appears again
    spark.createDataFrame(
        [(2, t0 + dt.timedelta(hours=6))],
        "user_id long, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    assert len(glob.glob(in_dir + "/*.parquet")) == 2

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30, idle_timeout=True,
                          watermark_delay="1 hour")
        .writeStream.format("memory").queryName("idle_sessions")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    for _ in range(60):
        if not q.isActive:
            break
        time.sleep(1)
    got = {
        (r["user_id"], r["n_events"], r["duration_sec"])
        for r in spark.sql("SELECT * FROM idle_sessions").collect()
    }
    # user 1 flushed by timeout despite no later user-1 event
    assert (1, 2, 600) in got
    # user 2's session stays open (watermark never passes 18:00+gap)
    assert not any(u == 2 for u, _, _ in got)


def test_sessionizer_function_pure():
    """The state-merge function itself, without a streaming query:
    gap closes a session, state carries the open tail."""
    import pandas as pd
    from intent_classifier_service_spark.streaming.sessions_stream import make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self.exists = True
            self._v = v

    fn = make_sessionizer(gap_minutes=30)
    state = FakeState()
    ts = pd.to_datetime(["2024-01-01 12:00", "2024-01-01 12:10"])
    out = list(fn((7,), iter([pd.DataFrame({"ts": ts})]), state))
    assert out == []                      # session still open
    assert state._v[2] == 2               # 2 events in state
    ts2 = pd.to_datetime(["2024-01-01 15:00"])
    out = list(fn((7,), iter([pd.DataFrame({"ts": ts2})]), state))
    assert len(out) == 1 and out[0].iloc[0]["n_events"] == 2
    assert out[0].iloc[0]["duration_sec"] == 600
    assert state._v[2] == 1               # new session open with 1 event


def test_sessionizer_handles_late_events():
    """`last` stays monotone under out-of-order arrivals: a late event
    inside the open session is absorbed (extending start backwards);
    one beyond the gap becomes its own closed singleton; gap detection
    against subsequent on-time events is unaffected."""
    import pandas as pd
    from intent_classifier_service_spark.streaming.sessions_stream import make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self.exists = True
            self._v = v

    fn = make_sessionizer(gap_minutes=30)
    state = FakeState()
    # batch 1: on-time event at 12:00
    list(fn((1,), iter([pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 12:00"])})]), state))
    # batch 2: late event 11:50 (within gap of start) then on-time 12:05
    out = list(fn((1,), iter([pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 11:50", "2024-01-01 12:05"])})]), state))
    assert out == []                       # session still open, NOT spuriously closed
    start, last, n = state._v
    assert n == 3 and start == pd.Timestamp("2024-01-01 11:50").timestamp()
    assert last == pd.Timestamp("2024-01-01 12:05").timestamp()
    # batch 3: far-too-late event 09:00 -> emitted as closed singleton
    out = list(fn((1,), iter([pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 09:00"])})]), state))
    assert len(out) == 1 and out[0].iloc[0]["n_events"] == 1
    assert state._v == (start, last, 3)    # open session untouched


def test_sessionizer_chains_late_events_together():
    """Two+ late events within gap of each other merge into ONE closed
    session (matching the batch sessionizer), not N singletons."""
    import pandas as pd
    from intent_classifier_service_spark.streaming.sessions_stream import make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self.exists = True
            self._v = v

    fn = make_sessionizer(gap_minutes=30)
    state = FakeState()
    list(fn((1,), iter([pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 12:00"])})]), state))
    out = list(fn((1,), iter([pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 08:00", "2024-01-01 08:05"])})]), state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["n_events"], row["duration_sec"]) == (2, 300)
    # open 12:00 session untouched
    assert state._v[2] == 1


def test_sessionizer_folds_chain_when_absorb_extends_start():
    """A late event absorbed into the open session can extend `start`
    backwards to within gap of a pending late chain — the batch
    sessionizer sees ONE contiguous session there, so the chain must
    fold into the open session instead of flushing separately
    (round-2 advice: gap=30m, open 12:00, late events 11:25 then 11:50)."""
    import pandas as pd
    from intent_classifier_service_spark.streaming.sessions_stream import make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self.exists = True
            self._v = v

    fn = make_sessionizer(gap_minutes=30)
    state = FakeState()
    list(fn((1,), iter([pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 12:00"])})]), state))
    # 11:25 is > gap before 12:00 → chained; 11:50 is within gap →
    # absorbed, start drops to 11:50, and 11:25+30m >= 11:50 → the
    # chain folds in. NOTHING closes; the open session covers all 3.
    out = list(fn((1,), iter([pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 11:25", "2024-01-01 11:50"])})]), state))
    assert out == []
    start, last, n = state._v
    assert n == 3
    assert start == pd.Timestamp("2024-01-01 11:25").timestamp()
    assert last == pd.Timestamp("2024-01-01 12:00").timestamp()


def test_windowed_drift_psi_flips_on_drifted_microbatch(spark, tmp_path):
    """Streaming drift gate: a window of baseline-like docs passes, a
    window whose span-kind mix collapses to all-media fails — same PSI
    semantics as the batch gate, per event-time window. A far-future
    sentinel advances the watermark so both windows finalize under
    append mode; the sentinel's own window stays open and unemitted."""
    from intent_classifier_service_spark.operators import drift

    in_dir = str(tmp_path / "drift_in")
    normal = datagen.documents_spans(spark, 400)
    baseline_kind = drift.span_kind_frequencies(normal)

    all_media = normal.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                F.lit("media").alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), s["offset"].alias("offset"),
            ),
        ).alias("spans"),
        "part_key",
    )
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    stamped = (
        normal.withColumn("ts", t0 + F.make_interval(mins=F.lit(5)))
        .unionByName(all_media.withColumn("ts", t0 + F.make_interval(mins=F.lit(25))))
        .unionByName(
            normal.limit(1).withColumn("ts", t0 + F.make_interval(hours=F.lit(3)))
        )
    )
    stamped.write.parquet(in_dir)

    stream = spark.readStream.schema(
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "part_key int, ts timestamp"
    ).parquet(in_dir)
    out = VS.windowed_drift_psi(stream, "ts", baseline_kind,
                                window="10 minutes", watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("drift_win")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {r["window"]["start"].minute: r
            for r in spark.sql("SELECT * FROM drift_win").collect()}
    assert set(rows) == {0, 20}          # sentinel window not finalized
    assert rows[0]["pass"] is True       # baseline-like mix
    assert rows[0]["psi"] < 0.05
    assert rows[20]["pass"] is False     # all-media collapse
    assert rows[20]["psi"] > 0.2
    assert all(r["rule_id"] == "R-DRIFT-KIND-PSI" for r in rows.values())


def test_stream_referential_matches_batch(spark, tmp_path):
    """The referential media_ref check runs on the stream as a
    stream-static broadcast join inside the same fused scan; output
    equals the batch pass (minus uniqueness, which is batch-only)."""
    in_dir = str(tmp_path / "ref_in")
    out_dir = str(tmp_path / "ref_out")
    datagen.documents_spans(spark, 800).write.parquet(in_dir)
    refs = datagen.valid_media_refs(spark)

    stream = VS.read_documents_stream(spark, in_dir)
    v = VS.violations_stream(stream, valid_refs=refs)
    q = (
        v.writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ref_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    expected = R.full_violations(
        spark.read.parquet(in_dir), refs, include_uniqueness=False
    )
    assert got.filter(F.col("rule_id") == "R-REF-MEDIA").count() > 0
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_dedup_stream_drops_in_watermark_duplicates(spark, tmp_path):
    """Duplicate doc_ids arriving within the watermark horizon are
    dropped (first wins, bounded state); distinct ids all survive."""
    in_dir = str(tmp_path / "dd_in")
    out_dir = str(tmp_path / "dd_out")
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    base = datagen.documents_spans(spark, 300)
    dups = base.orderBy("doc_id").limit(50)  # re-arrivals
    stamped = (
        base.withColumn("ts", t0 + F.make_interval(mins=F.lit(1)))
        .unionByName(dups.withColumn("ts", t0 + F.make_interval(mins=F.lit(5))))
    )
    stamped.write.parquet(in_dir)

    stream = spark.readStream.schema(
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "part_key int, ts timestamp"
    ).parquet(in_dir)
    out = VS.dedup_stream(stream, "ts", watermark="30 minutes")
    q = (
        out.writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    # datagen itself injects duplicate doc_ids (uniqueness-rule fodder),
    # so the exact survivor count is the DISTINCT id count of the input
    n_distinct = base.select("doc_id").distinct().count()
    assert n_distinct < 300          # the injected dups are really there
    assert got.count() == n_distinct            # one row per distinct id
    assert got.select("doc_id").distinct().count() == n_distinct


def test_dedup_stream_earliest_keeps_min_event_time(spark, tmp_path):
    """Earliest-wins determinism: the LATE copies (ts = t0+5min) are
    written first — so dropDuplicatesWithinWatermark-style
    first-observed semantics would keep them — but the survivors must
    all be the EARLY copies (ts = t0+1min) because the reduction is an
    ordered min over event time, not arrival order. A far-future flush
    row advances the watermark past the window so it emits; its own
    window stays open and is not emitted."""
    in_dir = str(tmp_path / "de_in")
    out_dir = str(tmp_path / "de_out")
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    base = datagen.documents_spans(spark, 100)
    late_first = base.withColumn("part_key", F.lit(111)) \
        .withColumn("ts", t0 + F.make_interval(mins=F.lit(5)))
    early_second = base.withColumn("part_key", F.lit(222)) \
        .withColumn("ts", t0 + F.make_interval(mins=F.lit(1)))
    flush = base.limit(1).withColumn("doc_id", F.lit("zzz-flush")) \
        .withColumn("part_key", F.lit(333)) \
        .withColumn("ts", t0 + F.make_interval(days=F.lit(2)))
    late_first.write.parquet(in_dir)                      # observed FIRST
    early_second.unionByName(flush).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, part_key int, ts timestamp"
    ).parquet(in_dir)
    out = VS.dedup_stream_earliest(stream, "ts", window="10 minutes",
                                   watermark="30 minutes")
    q = (
        out.writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "de_ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    n_distinct = base.select("doc_id").distinct().count()
    assert got.count() == n_distinct          # one survivor per id/window
    assert got.filter(F.col("part_key") != 222).count() == 0   # early wins
    assert got.filter(F.col("doc_id") == "zzz-flush").count() == 0
    assert got.select("ts").distinct().count() == 1           # all t0+1min


def _run_sessionize_until_done(spark, in_dir, ckpt, out_dir, gap_minutes=30):
    """One AvailableNow pass of the stateful sessionizer: consume
    whatever files exist under in_dir (1 file per micro-batch), append
    closed sessions to out_dir parquet via foreachBatch (the
    checkpoint-recoverable sink for update-mode stateful output),
    then stop — i.e. one 'process lifetime'."""
    from intent_classifier_service_spark.streaming.sessions_stream import sessionize_stream

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sessionize_stream(stream, gap_minutes=gap_minutes)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)


def test_sessionize_stream_checkpoint_recovery(spark, tmp_path):
    """Crash-recovery (round-5 verdict #5): run AvailableNow over HALF
    the input, stop the query, restart a NEW query from the SAME
    checkpoint with the rest of the input present — the union of
    emitted sessions must equal a single uninterrupted run: the open
    session in the state store survives the restart (closed later, not
    lost), the session already emitted before the stop is not
    re-emitted (no duplicates)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # file 1 (first lifetime): user 1's 12:00-12:10 session CLOSES
    # in-batch (the 14:00 event is > gap away and opens a new one);
    # user 2 opens at 12:00.
    file1 = [(1, m(0)), (1, m(5)), (1, m(10)), (1, m(120)), (2, m(0))]
    # file 2 (after restart): closes user 1's 14:00 session (singleton)
    # and user 2's 12:00-12:03 pair; the closers stay open (in state).
    file2 = [(1, m(270)), (2, m(3)), (2, m(180))]
    expect = {(1, 3, 600), (1, 1, 0), (2, 2, 180)}

    spark.createDataFrame(file1, "user_id long, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    _run_sessionize_until_done(spark, in_dir, ckpt, out_dir)
    phase1 = {(r["user_id"], r["n_events"], r["duration_sec"])
              for r in spark.read.parquet(out_dir).collect()}
    assert phase1 == {(1, 3, 600)}  # only the in-batch closure so far

    spark.createDataFrame(file2, "user_id long, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    _run_sessionize_until_done(spark, in_dir, ckpt, out_dir)
    got = spark.read.parquet(out_dir)
    assert got.count() == 3  # no duplicated closures across the restart
    assert {(r["user_id"], r["n_events"], r["duration_sec"])
            for r in got.collect()} == expect

    # reference: one uninterrupted run over the same two files
    solo_out = str(tmp_path / "solo_out")
    _run_sessionize_until_done(spark, in_dir, str(tmp_path / "solo_ckpt"),
                               solo_out)
    solo = spark.read.parquet(solo_out)
    assert solo.count() == 3
    assert {(r["user_id"], r["n_events"], r["duration_sec"])
            for r in solo.collect()} == expect


def test_dedup_earliest_stream_recovery_late_then_early(spark, tmp_path):
    """Watermarked-aggregation state recovery, LATE-copies-first
    direction (the sibling test below covers early-first): the window
    opened before the stop must still dedup (and eventually emit) rows
    arriving after the restart — survivors identical to an
    uninterrupted run."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    base = datagen.documents_spans(spark, 60)
    late = base.withColumn("part_key", F.lit(111)) \
        .withColumn("ts", t0 + F.make_interval(mins=F.lit(5)))
    early = base.withColumn("part_key", F.lit(222)) \
        .withColumn("ts", t0 + F.make_interval(mins=F.lit(1)))
    flush = base.limit(1).withColumn("doc_id", F.lit("zzz-flush")) \
        .withColumn("part_key", F.lit(333)) \
        .withColumn("ts", t0 + F.make_interval(days=F.lit(2)))

    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>, part_key int, ts timestamp")

    def one_pass():
        stream = spark.readStream.schema(schema) \
            .option("maxFilesPerTrigger", 1).parquet(in_dir)
        q = (
            VS.dedup_stream_earliest(stream, "ts", window="10 minutes",
                                     watermark="30 minutes")
            .writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    # lifetime 1: only the LATE copies — window open, nothing emits
    late.coalesce(1).write.mode("append").parquet(in_dir)
    one_pass()
    assert spark.read.parquet(out_dir).count() == 0

    # restart from the same checkpoint: early copies + watermark flush
    early.unionByName(flush).coalesce(1).write.mode("append").parquet(in_dir)
    one_pass()
    got = spark.read.parquet(out_dir)
    n = base.select("doc_id").distinct().count()
    assert got.count() == n
    # the pre-restart state still participated: min(ts) wins, so every
    # survivor is the EARLY copy even though the late ones arrived in a
    # previous process lifetime
    assert got.filter(F.col("part_key") != 222).count() == 0


_DOCS_TS_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
                   "media_ref:string,offset:int>>, part_key int, ts timestamp")


def _run_earliest_until_done(spark, in_dir, ckpt, out_dir):
    """One AvailableNow 'process lifetime' of the earliest-wins dedup
    stream (1 file per micro-batch, append sink, shared checkpoint)."""
    stream = (
        spark.readStream.schema(_DOCS_TS_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        VS.dedup_stream_earliest(stream, "ts", window="10 minutes",
                                 watermark="30 minutes")
        .writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)


def test_dedup_earliest_stream_checkpoint_recovery(spark, tmp_path):
    """Crash-recovery for dedup-within-watermark (round-6 verdict #5):
    the EARLY copies arrive before the stop, the LATE copies + flush
    after the restart — the survivors must still all be the early
    copies, which is only possible if the open (id, window) min-structs
    in the state store survive the restart (a fresh query over the
    post-restart files alone would keep the late copies). No survivor
    is lost or duplicated vs an uninterrupted run."""
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    base = datagen.documents_spans(spark, 100)
    early = base.withColumn("part_key", F.lit(222)) \
        .withColumn("ts", t0 + F.make_interval(mins=F.lit(1)))
    late = base.withColumn("part_key", F.lit(111)) \
        .withColumn("ts", t0 + F.make_interval(mins=F.lit(5)))
    flush = base.limit(1).withColumn("doc_id", F.lit("zzz-flush")) \
        .withColumn("part_key", F.lit(333)) \
        .withColumn("ts", t0 + F.make_interval(days=F.lit(2)))
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    early.coalesce(1).write.mode("append").parquet(in_dir)
    _run_earliest_until_done(spark, in_dir, ckpt, out_dir)   # lifetime 1
    # nothing finalized yet: the watermark hasn't closed any window
    assert not os.path.exists(out_dir) or \
        spark.read.parquet(out_dir).count() == 0

    late.coalesce(1).write.mode("append").parquet(in_dir)
    flush.coalesce(1).write.mode("append").parquet(in_dir)
    _run_earliest_until_done(spark, in_dir, ckpt, out_dir)   # lifetime 2
    got = spark.read.parquet(out_dir)
    n_distinct = base.select("doc_id").distinct().count()
    assert got.count() == n_distinct           # none lost, none duplicated
    assert got.filter(F.col("part_key") != 222).count() == 0   # early wins
    assert got.filter(F.col("doc_id") == "zzz-flush").count() == 0

    # reference: one uninterrupted run over the same three files
    solo_out = str(tmp_path / "solo_out")
    _run_earliest_until_done(spark, in_dir, str(tmp_path / "solo_ckpt"),
                             solo_out)
    solo = spark.read.parquet(solo_out)
    assert solo.count() == n_distinct
    assert sorted(r["doc_id"] for r in got.collect()) == \
        sorted(r["doc_id"] for r in solo.collect())


def _run_psi_until_done(spark, in_dir, ckpt, out_dir, baseline_kind):
    stream = (
        spark.readStream.schema(_DOCS_TS_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        VS.windowed_drift_psi(stream, "ts", baseline_kind,
                              window="10 minutes", watermark="30 minutes")
        .writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)


def test_windowed_psi_stream_checkpoint_recovery(spark, tmp_path):
    """Crash-recovery for the windowed-PSI stream: half of window A's
    docs arrive before the stop, the other half + window B + flush
    after the restart. Window A's emitted n_spans must count BOTH
    halves (its windowed counts survived the restart in the state
    store), each window emits exactly once, and (n_spans, psi, pass)
    match an uninterrupted run row for row."""
    from intent_classifier_service_spark.operators import drift

    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    docs = datagen.documents_spans(spark, 200)
    half_a1 = docs.limit(100).withColumn(
        "ts", t0 + F.make_interval(mins=F.lit(1)))
    half_a2 = docs.exceptAll(docs.limit(100)).withColumn(
        "ts", t0 + F.make_interval(mins=F.lit(7)))
    win_b = docs.limit(50).withColumn(
        "doc_id", F.concat(F.lit("b-"), "doc_id")).withColumn(
        "ts", t0 + F.make_interval(mins=F.lit(15)))
    flush = docs.limit(1).withColumn("doc_id", F.lit("zzz-flush")) \
        .withColumn("ts", t0 + F.make_interval(days=F.lit(2)))
    baseline_kind, _ = drift.drift_profile(docs, lo=0, hi=128)

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    half_a1.coalesce(1).write.mode("append").parquet(in_dir)
    _run_psi_until_done(spark, in_dir, ckpt, out_dir, baseline_kind)
    assert not os.path.exists(out_dir) or \
        spark.read.parquet(out_dir).count() == 0  # no window final yet

    half_a2.coalesce(1).write.mode("append").parquet(in_dir)
    win_b.coalesce(1).write.mode("append").parquet(in_dir)
    flush.coalesce(1).write.mode("append").parquet(in_dir)
    _run_psi_until_done(spark, in_dir, ckpt, out_dir, baseline_kind)
    got = spark.read.parquet(out_dir)
    assert got.count() == 2  # windows A and B, each exactly once

    def n_spans(df):
        return df.select(F.explode("spans")).count()

    rows = {r["window"]["start"].minute: r for r in got.collect()}
    assert rows[0]["n_spans"] == n_spans(half_a1) + n_spans(half_a2)
    assert rows[10]["n_spans"] == n_spans(win_b)

    # reference: one uninterrupted run emits identical rows
    solo_out = str(tmp_path / "solo_out")
    _run_psi_until_done(spark, in_dir, str(tmp_path / "solo_ckpt"),
                        solo_out, baseline_kind)
    key = lambda r: (r["window"]["start"], r["n_spans"],
                     round(r["psi"], 9), r["pass"])
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, spark.read.parquet(solo_out).collect()))


def test_ingest_dedup_stream_incremental(spark, tmp_path):
    """Continuous-ingest cross-corpus dedup (run_ingest_dedup): two
    availableNow drains over a growing ingest directory. Drain 1 flags
    the doc duplicating the standing index and appends survivors;
    drain 2 processes ONLY the newly arrived file (file-level
    checkpoint) and flags a dup of a drain-1 SURVIVOR — proof the
    index grew between runs. The probe inside foreachBatch is the
    literal batch operator (dedup.pairs_against_index), so semantics
    are the oracled ones."""
    from intent_classifier_service_spark.operators import dedup

    idx = str(tmp_path / "idx")
    in_dir = str(tmp_path / "ingest")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    old = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "an entirely different standing document about engines")],
        "doc_id long, text string")
    dedup.build_minhash_index(old, idx)

    spark.createDataFrame(
        [(11, "the quick brown fox jumps over the lazy dog"),   # dup of 1
         (12, "completely novel ingest text nothing like the corpus")],
        "doc_id long, text string").write.mode("append").parquet(in_dir)
    VS.run_ingest_dedup(spark, in_dir, idx, out, ckpt, threshold=0.9)

    flagged = spark.read.parquet(f"{out}/flagged")
    assert {(r["id_new"], r["id_indexed"])
            for r in flagged.collect()} == {(11, 1)}
    kept = spark.read.parquet(f"{out}/kept")
    assert {r["doc_id"] for r in kept.collect()} == {12}
    m = dedup._read_mh_manifest(idx)
    assert (m["n_docs"], m["n_appends"]) == (3, 1)  # survivor 12 folded in

    # second arrival: dup of drain-1 SURVIVOR 12 + one fresh doc
    spark.createDataFrame(
        [(21, "completely novel ingest text nothing like the corpus"),
         (22, "yet another genuinely fresh document body with words")],
        "doc_id long, text string").write.mode("append").parquet(in_dir)
    VS.run_ingest_dedup(spark, in_dir, idx, out, ckpt, threshold=0.9)

    flagged2 = {(r["id_new"], r["id_indexed"])
                for r in spark.read.parquet(f"{out}/flagged").collect()}
    assert flagged2 == {(11, 1), (21, 12)}
    kept2 = {r["doc_id"]
             for r in spark.read.parquet(f"{out}/kept").collect()}
    assert kept2 == {12, 22}  # drain-2 re-processed nothing from drain 1
    m2 = dedup._read_mh_manifest(idx)
    assert (m2["n_docs"], m2["n_appends"]) == (4, 2)


def test_ingest_dedup_exact_prefilter(spark, tmp_path):
    """Drain with the exact-digest pre-filter: byte-identical (modulo
    normalization) copies land in flagged_exact and are dropped BEFORE
    the MinHash probe — the near-dup flagged set must not contain them
    — while genuinely-near (not exact) dups still flow to the near
    stage. Survivors fold into BOTH indexes; a second drain catches an
    exact copy of a drain-1 survivor, proving the exact index grew."""
    from intent_classifier_service_spark.operators import dedup

    idx = str(tmp_path / "idx")
    ex_idx = str(tmp_path / "ex_idx")
    in_dir = str(tmp_path / "ingest")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    old = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "an entirely different standing document about engines")],
        "doc_id long, text string")
    dedup.build_minhash_index(old, idx)
    dedup.build_exact_index(old, ex_idx)

    spark.createDataFrame(
        [(11, "  The QUICK brown fox jumps over the  lazy dog"),  # exact
         (12, "an entirely different standing document about engines "
              "expanded"),                                       # near dup of 2
         (13, "completely novel ingest text nothing like the corpus")],
        "doc_id long, text string").write.mode("append").parquet(in_dir)
    VS.run_ingest_dedup(spark, in_dir, idx, out, ckpt, threshold=0.5,
                        exact_index_path=ex_idx)

    ex_flagged = {(r["id_new"], r["id_indexed"], r["n_indexed_copies"])
                  for r in spark.read.parquet(
                      f"{out}/flagged_exact").collect()}
    assert ex_flagged == {(11, 1, 1)}
    near_flagged = {(r["id_new"], r["id_indexed"])
                    for r in spark.read.parquet(f"{out}/flagged").collect()}
    # 12 reaches the near stage; 11 was cut before any signature
    assert near_flagged == {(12, 2)}
    kept = {r["doc_id"] for r in spark.read.parquet(f"{out}/kept").collect()}
    assert kept == {13}
    assert dedup._read_mh_manifest(idx)["n_docs"] == 3
    assert dedup._read_mh_manifest(ex_idx)["n_docs"] == 3

    # drain 2: exact copy of drain-1 SURVIVOR 13 → caught by the
    # exact index only because the survivor was folded in
    spark.createDataFrame(
        [(21, "Completely novel ingest TEXT nothing like the corpus")],
        "doc_id long, text string").write.mode("append").parquet(in_dir)
    VS.run_ingest_dedup(spark, in_dir, idx, out, ckpt, threshold=0.5,
                        exact_index_path=ex_idx)
    ex_flagged2 = {(r["id_new"], r["id_indexed"])
                   for r in spark.read.parquet(
                       f"{out}/flagged_exact").collect()}
    assert ex_flagged2 == {(11, 1), (21, 13)}
    # nothing new survived → kept and both manifests unchanged
    assert {r["doc_id"] for r in spark.read.parquet(f"{out}/kept").collect()
            } == {13}
    assert dedup._read_mh_manifest(ex_idx)["n_docs"] == 3


def test_ingest_embedding_dedup_stream(spark, tmp_path):
    """EMBEDDING-modality drain (run_ingest_embedding_dedup): drain 1
    flags the vector duplicating the standing index at cosine ~1 and
    folds survivors in; drain 2 processes only the newly arrived file
    and flags a copy of a drain-1 SURVIVOR — the index grew between
    runs. Orthogonal unit vectors can never clear the 0.95 bar, so the
    expected sets are exact."""
    from intent_classifier_service_spark.operators import dedup, similarity

    idx = str(tmp_path / "vidx")
    in_dir = str(tmp_path / "vingest")
    out = str(tmp_path / "vout")
    ckpt = str(tmp_path / "vckpt")

    def vec(axis):
        v = [0.0] * 8
        v[axis] = 1.0
        return v

    old = spark.createDataFrame(
        [(1, vec(0)), (2, vec(1))], "vec_id long, embedding array<float>")
    similarity.build_embedding_index(old, idx)

    spark.createDataFrame(
        [(11, vec(0)),   # dup of standing vector 1
         (12, vec(2))],  # genuinely new axis
        "vec_id long, embedding array<float>").write.mode("append") \
        .parquet(in_dir)
    VS.run_ingest_embedding_dedup(spark, in_dir, idx, out, ckpt,
                                  threshold=0.95)

    flagged = spark.read.parquet(f"{out}/flagged")
    got = {(r["id_new"], r["id_indexed"]): r["cosine"]
           for r in flagged.collect()}
    assert set(got) == {(11, 1)} and got[(11, 1)] > 0.999
    kept = {r["vec_id"] for r in spark.read.parquet(f"{out}/kept").collect()}
    assert kept == {12}
    m = dedup._read_mh_manifest(idx)
    assert (m["n_docs"], m["n_appends"]) == (3, 1)

    # second arrival: copy of drain-1 SURVIVOR 12 + a fresh axis
    spark.createDataFrame(
        [(21, vec(2)), (22, vec(3))],
        "vec_id long, embedding array<float>").write.mode("append") \
        .parquet(in_dir)
    VS.run_ingest_embedding_dedup(spark, in_dir, idx, out, ckpt,
                                  threshold=0.95)
    flagged2 = {(r["id_new"], r["id_indexed"])
                for r in spark.read.parquet(f"{out}/flagged").collect()}
    assert flagged2 == {(11, 1), (21, 12)}
    kept2 = {r["vec_id"]
             for r in spark.read.parquet(f"{out}/kept").collect()}
    assert kept2 == {12, 22}
    m2 = dedup._read_mh_manifest(idx)
    assert (m2["n_docs"], m2["n_appends"]) == (4, 2)
