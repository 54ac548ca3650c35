"""Readers/writers.

Parquet today; the interfaces are Iceberg-shaped (snapshot pinning,
writeTo-style appends) so a real catalog drops in. Fixed declared
schemas everywhere — the reference never infers (positional TSV names,
gpt_intent_classifier.py:368-369), and neither do we.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

DOCUMENTS_SPANS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField(
        "spans",
        T.ArrayType(
            T.StructType([
                T.StructField("kind", T.StringType(), True),
                T.StructField("text", T.StringType(), True),
                T.StructField("media_ref", T.StringType(), True),
                T.StructField("offset", T.IntegerType(), True),
            ])
        ),
        True,
    ),
    T.StructField("part_key", T.IntegerType(), True),
])

ATIS_TSV_TRAIN_SCHEMA = T.StructType([
    T.StructField("user_prompt", T.StringType(), True),
    T.StructField("intents", T.StringType(), True),
])
ATIS_TSV_TEST_SCHEMA = T.StructType([
    T.StructField("user_prompt", T.StringType(), True),
    T.StructField("actual_intents", T.StringType(), True),
])


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One testdata parquet table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_tsv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Headerless TSV with positional schema — the reference's source
    format (S1/S2, gpt_intent_classifier.py:368-369)."""
    return spark.read.schema(schema).option("sep", "\t").option("header", "false").csv(path)


def write_violations(df: DataFrame, path: str, mode: str = "overwrite",
                     partition_by: tuple[str, ...] = (),
                     dynamic: bool = False) -> None:
    """Violation/verdict sink — parquet partitioned by rule_id so
    downstream triage prunes by rule. (Iceberg: df.writeTo(t).append().)

    ``dynamic=True`` switches overwrite to dynamic-partition mode: only
    the partitions PRESENT in ``df`` are replaced, everything else on
    disk survives. Resumed runs use this so a pending-only pass never
    clobbers the completed partitions' artifacts (an Iceberg catalog
    gives the same semantics via overwritePartitions())."""
    w = df.write.mode(mode)
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_documents_spans(spark: SparkSession, path: str,
                         snapshot_id: str | None = None) -> DataFrame:
    """Declared-schema parquet read; with ``snapshot_id`` the read is
    PINNED to the files a manifest snapshot froze (sources/iceberg.py
    fallback semantics) — later appends to the directory don't leak in,
    matching Iceberg's VERSION AS OF."""
    if snapshot_id is not None:
        from . import iceberg as IB
        files = IB.manifest_files(path, snapshot_id)
        if files is None:
            # never silently degrade an explicit pin to the live
            # mutable directory (matches iceberg.read_snapshot)
            raise ValueError(
                f"unknown snapshot {snapshot_id!r} for {path}: no manifest "
                "under _snapshots/ — refusing the unpinned fallback"
            )
        return spark.read.schema(DOCUMENTS_SPANS_SCHEMA).parquet(*files)
    return spark.read.schema(DOCUMENTS_SPANS_SCHEMA).parquet(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL documents (one JSON object per line) with the north-rule
    schema — the canonical LLM training-data interchange format. The
    schema is DECLARED, never inferred (inference would scan the corpus
    once just to guess types, and a malformed leading file would
    corrupt the schema for everything); malformed lines yield null
    fields and surface through the doc rules as violation rows instead
    of failing the job."""
    return spark.read.schema(DOCUMENTS_SPANS_SCHEMA).json(path)


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink (one doc per line, spark-parallel files)."""
    df.write.mode("overwrite").json(path)


def tiny_table(spark: SparkSession, rows, schema) -> DataFrame:
    """createDataFrame for driver-local metadata rows as ONE partition.

    The default ``createDataFrame(list)`` parallelizes the rows across
    defaultParallelism mostly-empty PYTHON partitions; a downstream
    ``coalesce(1)`` (the natural move for a tiny artifact write) then
    evaluates all of them SERIALLY inside one task — ~130 ms of
    Python-worker round-trip per partition, ~4 s per 12-row parquet
    write on local[32] (measured r9). One slice = one round-trip; use
    this for every metadata-sized artifact (budget tables, centroids,
    tokenizer merge tables, drift baselines)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def save_as_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Single-file CSV export — reference S4 (save_as_csv,
    gpt_intent_classifier.py:590-603, one golden CSV per metric table).
    coalesce(1) is correct here because metric/verdict tables are tiny;
    never use this for violation rows at scale (use write_violations)."""
    df.coalesce(1).write.mode("overwrite").option("header", str(header).lower()).csv(path)
