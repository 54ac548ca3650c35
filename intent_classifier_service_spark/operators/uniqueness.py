"""doc_id uniqueness via salted two-phase hash aggregation.

North rule: "doc_id uniqueness via salted hash-aggregation to defeat
skew". A single ``groupBy(doc_id).count()`` shuffles every row on
doc_id; with a hot duplicate key (the datagen injects one holding ~20 %
of dupes) one reducer drowns. Two-phase:

  phase 1: groupBy(doc_id, salt) partial counts — salt =
           spark_partition_id() % n_salts spreads identical keys across
           reducers, so no reducer sees more than input_partitions/n_salts
           of any key's rows;
  phase 2: groupBy(doc_id) sum of partial counts — at most n_salts rows
           per key enter the second shuffle.

AQE skew handling stays on as a backstop (session.py), but the salt
makes worst-case reducer load bounded by construction, which AQE's
post-hoc split cannot guarantee for aggregations (skewJoin only covers
joins).

Reference analog: the uniqueness/dedup semantics of
drop_duplicates(subset=...) (gpt_intent_classifier.py:782) and the
"known classes" set-building (set(...) uniqueness, :826-827).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_doc_ids(docs: DataFrame, key: str = "doc_id", n_salts: int = 32) -> DataFrame:
    """(doc_id, n_occurrences) for every key appearing more than once."""
    partial = (
        docs.select(key)
        .withColumn("_salt", F.spark_partition_id() % n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("_c").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )


def _emit_rows(dups: DataFrame, key: str = "doc_id") -> DataFrame:
    return dups.select(
        F.col(key).alias("doc_id"),
        F.lit("R-DOC-UNIQUE").alias("rule_id"),
        F.lit(None).cast("int").alias("span_index"),
        F.format_string("n_occurrences=%d", F.col("n_occurrences")).alias("observed"),
        F.lit("doc_id unique").alias("expected"),
    )


def uniqueness_violations(docs: DataFrame, key: str = "doc_id", n_salts: int = 32) -> DataFrame:
    """Violation rows in the standard north-rule shape."""
    return _emit_rows(duplicate_doc_ids(docs, key, n_salts), key)


def violations_from_counts(counts: DataFrame, key: str = "doc_id") -> DataFrame:
    """Violation rows from pre-aggregated per-partition (doc_id, n)
    occurrence counts — the raw-id variant: counts for completed
    partitions come from a checkpoint, counts for pending partitions
    from this run's scan, and their sum over partitions equals a
    full-table count exactly. Output is row-identical to
    uniqueness_violations on the full table."""
    dups = (
        counts.groupBy(key)
        .agg(F.sum("n").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )
    return _emit_rows(dups, key)


def duplicate_hashes(hashed_counts: DataFrame) -> DataFrame:
    """(h1, h2, n_occurrences > 1) from per-partition hashed counts
    (streaming.checkpoint.hash_doc_counts rows) — the incremental-
    resume merge runs entirely on fixed-width 128-bit keys; names are
    resolved afterwards for the (tiny) duplicate set only."""
    return (
        hashed_counts.groupBy("h1", "h2")
        .agg(F.sum("n").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )


def violations_from_hashed_counts(dups: DataFrame, names: DataFrame) -> DataFrame:
    """Standard R-DOC-UNIQUE rows for an already-aggregated duplicate
    hash set, with real doc_ids resolved from ``names`` (h1, h2,
    doc_id — the union of the checkpoint's bucket-pruned _docnames
    lookup and the pending partitions' in-memory name rows; duplicates
    between the two sources are dropped here). Every duplicate hash
    has a name by construction: each id occurrence lies in either a
    completed partition (its names are checkpointed — required by
    global_state_covers) or a pending one. Output is row-identical to
    uniqueness_violations on the full table, modulo 128-bit hash
    collisions (≈10⁻¹⁵ expected at 10^12 ids — see hash_doc_counts).

    Shuffle shape: JOIN FIRST, distinct after — ``names`` carries one
    row per pending-partition doc, so distincting it up front would
    shuffle O(pending) rows; joining the tiny ``dups`` set first (AQE
    broadcasts it) restricts to the duplicate hashes map-side, and the
    source-dedup distinct then runs on duplicate-sized data."""
    resolved = (
        dups.join(names, ["h1", "h2"])
        .select("doc_id", "n_occurrences")
        .distinct()
    )
    return _emit_rows(resolved)
