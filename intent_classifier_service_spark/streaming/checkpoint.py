"""Resumable runs: a checkpoint table keyed by partition.

North rule: "resumable from an Iceberg checkpoint table keyed by
partition, carrying per-partition lineage (snapshot-id, files read,
rule versions) and metrics". The sandbox has no Iceberg runtime jar, so
the store is parquet-backed with identical semantics (append-only
status rows, latest-wins by completed_at); the write path is isolated
behind ``CheckpointStore`` so an Iceberg catalog drops in by replacing
two methods (`_read`, `_append` → `writeTo(...).append()`).

This promotes the reference's in-memory failure bookkeeping — the
`positions` lists of failed responses (gpt_intent_classifier.py:865,
875) — to durable, partition-keyed state: a restarted run anti-joins
pending partitions against completed ones and re-validates only those.

Schema:
  part_key int, status string, snapshot_id string, files_read int,
  rule_version string, n_docs long, n_violations long,
  run_id string, completed_at string

A sibling log at ``<path>_rules`` stores per-(part_key, rule_id)
n_checked/n_violations so a resumed run can reconstruct the global
verdict table exactly: completed partitions contribute their stored
per-rule stats, pending partitions contribute freshly computed ones,
and the rollup over the union equals a from-scratch run.
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = (
    "part_key int, status string, snapshot_id string, files_read int, "
    "rule_version string, n_docs long, n_violations long, "
    "run_id string, completed_at string"
)

RULE_STATS_SCHEMA = (
    "part_key int, rule_id string, n_checked long, n_violations long, "
    "rule_version string, run_id string, completed_at string"
)

# Incremental-resume state for the GLOBAL rules (round-3 verdict #4).
# Stored per partition so a resumed run can MERGE completed partitions'
# contributions instead of re-scanning the whole table:
#   _profiles: drift histogram COUNTS (dist ∈ {span_kind, offset_hist,
#              lang_freq, quality_hist}) — counts are additive, so the
#              merged distribution equals a full-scan one exactly.
#   _docids:   per-partition (h1, h2, n) occurrence counts keyed by a
#              128-bit id hash (round-4 verdict #6) — global duplicates
#              are sums over partitions. Fixed 28-byte rows: at 10^12
#              ids this is what every future resume SHUFFLES for the
#              merge, so hashing (vs raw string ids, often 40-80 bytes)
#              cuts the hot-path state several-fold. Collision math in
#              hash_doc_counts.
#   _docnames: (h1, h2, doc_id), hash-bucketed — the hash→name mapping
#              needed ONLY to print the duplicate set's real ids in
#              violation rows. Content-addressed (the hash determines
#              the name), so stale rows after a partition re-validation
#              are harmless; bucket partitioning lets the lookup read
#              just the buckets that contain duplicates.
PROFILE_SCHEMA = "part_key int, dist string, bucket string, n long"
DOCID_SCHEMA = "part_key int, h1 long, h2 long, n long"
N_NAME_BUCKETS = 64


def hash_doc_counts(counts: DataFrame) -> DataFrame:
    """(part_key, doc_id, n) → (part_key, h1, h2, n): the 128-bit id
    key is two CHAINED xxhash64 applications — h1 = xxhash64(id),
    h2 = xxhash64(id, 1) (an extra literal column reseeds the avalanche;
    Spark's xxhash64 has a fixed seed, and ANSI mode forbids the long
    multiply a manual second hash would use). Treating (h1, h2) as
    ~128 uniform bits, the expected number of colliding id pairs among
    N = 10^12 distinct ids is N²/2^129 ≈ 1.5·10⁻¹⁵ — zero in practice;
    a single 64-bit hash would collide with ~3 % probability at that
    scale, which is why both are stored."""
    return counts.select(
        F.col("part_key").cast("int"),
        F.xxhash64("doc_id").alias("h1"),
        F.xxhash64("doc_id", F.lit(1)).alias("h2"),
        F.col("n").cast("long"),
    )


def doc_name_rows(counts: DataFrame) -> DataFrame:
    """(h1, h2, doc_id) name rows for a pending-partition counts frame
    — the in-memory complement of the _docnames sidecar."""
    return counts.select(
        F.xxhash64("doc_id").alias("h1"),
        F.xxhash64("doc_id", F.lit(1)).alias("h2"),
        F.col("doc_id"),
    )


class CheckpointStore:
    def __init__(self, spark: SparkSession, path: str, rule_version: str = "v1"):
        self.spark = spark
        self.path = path
        self.rule_version = rule_version
        self.run_id = uuid.uuid4().hex[:12]
        self._seq = 0  # per-store monotonic append counter (see _stamp)

    def _stamp(self) -> str:
        """Fixed-width, lexicographically ordered append stamp:
        tz-aware UTC wall clock (strftime forces 6-digit micros —
        isoformat would drop them at .000000 and break width) plus a
        per-store sequence so two appends in the same microsecond never
        tie-break on the struct's *stat* fields (latest-wins would pick
        an arbitrary winner between a re-run's old and new stats)."""
        self._seq += 1
        now = _dt.datetime.now(_dt.timezone.utc)
        return now.strftime("%Y-%m-%dT%H:%M:%S.%f+00:00") + f"#{self._seq:08d}"

    # -- storage primitives (swap for Iceberg writeTo in production) ----
    def _read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)

    def _append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)

    # -- semantics -------------------------------------------------------
    def completed_partitions(self) -> DataFrame:
        """Latest status per part_key == 'done' for this rule version.
        Append-only log → latest-wins via max(completed_at)."""
        log = self._read().filter(F.col("rule_version") == self.rule_version)
        latest = log.groupBy("part_key").agg(
            F.max(F.struct("completed_at", "status")).alias("s")
        )
        return latest.filter(F.col("s.status") == "done").select("part_key")

    def pending_partitions(self, all_parts: DataFrame,
                           require_rule_stats: bool = False) -> DataFrame:
        """all_parts (part_key) anti-join completed → what to validate.

        ``require_rule_stats=True`` additionally treats a 'done'
        partition with NO rows in the _rules log as pending: such a
        partition can neither be skipped (its stats can't be
        reconstructed into the rollup) nor trusted (it indicates a
        crash between stat append and mark-done, or a pre-rules-log
        checkpoint). The validate job opts in; raw status semantics
        stay available for callers that don't carry rule stats."""
        completed = self.completed_partitions()
        if require_rule_stats:
            completed = completed.join(
                self.completed_rule_stats().select("part_key").distinct(),
                "part_key", "left_semi",
            )
        return all_parts.join(completed, "part_key", "left_anti")

    def mark_done(self, part_key: int, snapshot_id: str, files_read: int,
                  n_docs: int, n_violations: int) -> None:
        row = self.spark.createDataFrame(
            [(
                part_key, "done", snapshot_id, files_read, self.rule_version,
                n_docs, n_violations, self.run_id,
                # driver-side wall clock is fine for ordering within a store
                self._stamp(),
            )],
            CHECKPOINT_SCHEMA,
        )
        self._append(row)

    def append_rule_stats(self, vd_part: DataFrame) -> None:
        """Persist per-(part_key, rule_id) n_checked/n_violations for
        the partitions validated by this run — the lineage needed to
        rebuild global verdicts without re-validating."""
        now = self._stamp()
        rows = vd_part.select(
            F.col("part_key").cast("int"),
            F.col("rule_id"),
            F.col("n_checked").cast("long"),
            F.col("n_violations").cast("long"),
            F.lit(self.rule_version).alias("rule_version"),
            F.lit(self.run_id).alias("run_id"),
            F.lit(now).alias("completed_at"),
        )
        rows.write.mode("append").parquet(self.path + "_rules")

    def completed_rule_stats(self) -> DataFrame:
        """(part_key, rule_id, n_checked, n_violations) for partitions
        whose latest status is 'done' — latest-wins per (part_key,
        rule_id) by completed_at, current rule version only."""
        if not os.path.exists(self.path + "_rules"):
            return self.spark.createDataFrame(
                [], "part_key int, rule_id string, n_checked long, n_violations long"
            )
        log = (
            self.spark.read.schema(RULE_STATS_SCHEMA)
            .parquet(self.path + "_rules")
            .filter(F.col("rule_version") == self.rule_version)
        )
        latest = log.groupBy("part_key", "rule_id").agg(
            F.max(F.struct("completed_at", "n_checked", "n_violations")).alias("s")
        )
        return latest.join(self.completed_partitions(), "part_key", "left_semi").select(
            "part_key", "rule_id",
            F.col("s.n_checked").alias("n_checked"),
            F.col("s.n_violations").alias("n_violations"),
        )

    # -- incremental-resume state for the global rules -------------------
    def _write_partitioned(self, df: DataFrame, suffix: str) -> None:
        """Dynamic partition overwrite by part_key: a re-validated
        partition REPLACES its stored state (an append would double-
        count its rows in later merges)."""
        (df.write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy("part_key")
           .parquet(self.path + suffix))

    def _covered_keys(self, suffix: str) -> set[int]:
        p = self.path + suffix
        if not os.path.exists(p):
            return set()
        return {
            r["part_key"]
            for r in self.spark.read.parquet(p)
            .select("part_key").distinct().collect()
        }

    def write_profiles(self, counts: DataFrame) -> None:
        """counts: (part_key, dist, bucket, n) — per-partition drift
        histogram counts for the partitions this run validated."""
        self._write_partitioned(
            counts.select(
                F.col("part_key").cast("int"), "dist", "bucket",
                F.col("n").cast("long"),
            ),
            "_profiles",
        )

    def stored_profiles(self, part_keys: list[int]) -> DataFrame:
        schema_df = self.spark.createDataFrame([], PROFILE_SCHEMA)
        if not part_keys or not os.path.exists(self.path + "_profiles"):
            return schema_df
        return (
            self.spark.read.parquet(self.path + "_profiles")
            .filter(F.col("part_key").isin([int(k) for k in part_keys]))
            .select("part_key", "dist", "bucket", F.col("n").cast("long"))
        )

    def write_doc_counts(self, counts: DataFrame) -> None:
        """counts: (part_key, doc_id, n) — per-partition doc_id
        occurrence counts for the partitions this run validated,
        persisted as TWO artifacts (round-4 verdict #6):

          _docids   — hashed fixed-width (part_key, h1, h2, n) rows,
                      the state every future resume reads and merges;
          _docnames — (h1, h2, doc_id), partitioned by (part_key,
                      hb = pmod(h1, 64)) so the duplicate-set name
                      lookup prunes to the buckets that contain
                      duplicates instead of reading the O(corpus)
                      mapping. Content-addressed, so rows left behind
                      by a re-validated partition can never map a hash
                      to a wrong name.
        """
        self._write_partitioned(hash_doc_counts(counts), "_docids")
        names = counts.select(
            F.col("part_key").cast("int"),
            F.xxhash64("doc_id").alias("h1"),
            F.xxhash64("doc_id", F.lit(1)).alias("h2"),
            F.col("doc_id"),
        ).withColumn(
            "hb", F.pmod(F.col("h1"), F.lit(N_NAME_BUCKETS)).cast("int")
        )
        (names.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("part_key", "hb")
              .parquet(self.path + "_docnames"))

    def stored_doc_counts(self, part_keys: list[int]) -> DataFrame:
        schema_df = self.spark.createDataFrame([], DOCID_SCHEMA)
        if not part_keys or not os.path.exists(self.path + "_docids"):
            return schema_df
        return (
            self.spark.read.parquet(self.path + "_docids")
            .filter(F.col("part_key").isin([int(k) for k in part_keys]))
            .select("part_key", "h1", "h2", F.col("n").cast("long"))
        )

    def lookup_doc_names(self, dup_hashes: DataFrame) -> DataFrame:
        """(h1, h2, doc_id) for the given (h1, h2, ...) duplicate set.
        Collects only the ≤ N_NAME_BUCKETS distinct bucket ids of the
        duplicates (bounded driver traffic regardless of how many
        duplicates exist), prunes the _docnames read to those
        directories, then semi-joins the hash set."""
        empty = self.spark.createDataFrame([], "h1 long, h2 long, doc_id string")
        p = self.path + "_docnames"
        if not os.path.exists(p):
            return empty
        buckets = [
            r["hb"]
            for r in dup_hashes.select(
                F.pmod(F.col("h1"), F.lit(N_NAME_BUCKETS)).cast("int").alias("hb")
            ).distinct().collect()
        ]
        if not buckets:
            return empty
        return (
            self.spark.read.parquet(p)
            .filter(F.col("hb").isin(buckets))
            .join(dup_hashes.select("h1", "h2"), ["h1", "h2"], "left_semi")
            .select("h1", "h2", "doc_id")
            .distinct()
        )

    def global_state_covers(self, part_keys: list[int]) -> bool:
        """True iff every incremental store holds rows for every given
        partition — the precondition for merge-based resume. Partitions
        completed by pre-incremental checkpoints (or simulated test
        checkpoints, or pre-hashed-state _docids layouts missing the
        _docnames sidecar) fail this, and callers fall back to the
        full-table-scan path."""
        keys = set(int(k) for k in part_keys)
        return (keys <= self._covered_keys("_profiles")
                and keys <= self._covered_keys("_docids")
                and keys <= self._covered_keys("_docnames"))

    def mark_done_bulk(self, stats: DataFrame, snapshot_id: str) -> None:
        """stats: (part_key, n_docs, n_violations) — one append for all
        partitions of a run (the per-partition loop is for selective
        resume; the happy path checkpoints once)."""
        now = self._stamp()
        rows = stats.select(
            F.col("part_key").cast("int"),
            F.lit("done").alias("status"),
            F.lit(snapshot_id).alias("snapshot_id"),
            F.lit(1).alias("files_read"),
            F.lit(self.rule_version).alias("rule_version"),
            F.col("n_docs").cast("long"),
            F.col("n_violations").cast("long"),
            F.lit(self.run_id).alias("run_id"),
            F.lit(now).alias("completed_at"),
        )
        self._append(rows)
