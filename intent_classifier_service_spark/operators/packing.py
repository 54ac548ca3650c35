"""Document packing: assemble variable-length documents into
fixed-token-budget training sequences — the step between a cleaned
corpus and a pretraining dataloader (reference analog: none; this is
one of the beyond-reference LLM-pipeline operators, like dedup/ANN).

Distributed shape: true optimal packing is a global sequential bin-pack
— inherently serial — so this implements the standard scalable
approximation: deterministic hash-bucketed partitions, each packed
independently with an in-partition greedy first-fit-decreasing pass
(one Arrow batch per partition, pure numpy/python over metadata-sized
rows: id + token count, never the text). Packing quality loses only
the cross-partition tail (≤ one underfull sequence per partition,
amortized away as partitions grow toward 100 TB); wall-clock is one
shuffle + one mapInPandas.

Determinism: partition = pmod(xxhash64(id), n_buckets) and rows are
sorted (tokens desc, id) inside each bucket before the greedy pass, so
the same corpus always packs into the same sequences — no sampling, no
arrival order, no partition-count dependence (n_buckets is an explicit
parameter, not spark.sql.shuffle.partitions).

Invariants (pytest-pinned; conservation is also driver-oracled via
driver_queries.pack_assignments):
  - every doc with tokens <= max_tokens appears in EXACTLY one sequence
  - every sequence's token total <= max_tokens
  - docs with tokens > max_tokens are NOT packed; they surface in the
    overflow frame for the caller to truncate/split/reject explicitly
    (silent truncation is a training-data bug, not a default)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = ("seq_id string, doc_ids array<long>, n_docs int, "
                 "total_tokens long, fill_ratio double")


def pack_greedy(docs: DataFrame, max_tokens: int, id_col: str = "doc_id",
                tokens_col: str = "n_tokens",
                n_buckets: int = 64) -> tuple[DataFrame, DataFrame]:
    """(packed, overflow): packed has one row per output sequence —
    (seq_id, doc_ids, n_docs, total_tokens, fill_ratio) — overflow is
    the (id, tokens) rows that exceed ``max_tokens`` alone. seq_id is
    'b<bucket>-s<index>' (bucket-local index in deterministic greedy
    order), unique and stable across runs."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    meta = docs.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("tokens"),
    ).filter(F.col("tokens").isNotNull())
    overflow = meta.filter(F.col("tokens") > max_tokens).select(
        F.col("id").alias(id_col), F.col("tokens").alias(tokens_col)
    )
    eligible = (
        meta.filter(F.col("tokens") <= max_tokens)
        .withColumn("_bucket", F.pmod(F.xxhash64("id"), F.lit(n_buckets)))
        # explicit numPartitions: determinism must not depend on
        # spark.sql.shuffle.partitions; one partition per bucket
        .repartition(n_buckets, "_bucket")
        .sortWithinPartitions("_bucket", F.desc("tokens"), F.asc("id"))
    )

    def pack(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out_rows = []
            # a partition holds exactly one bucket (hash-partitioned on
            # _bucket with n_buckets partitions) — but stay correct if
            # two buckets collide into one partition: pack per bucket.
            for bucket, grp in pdf.groupby("_bucket", sort=True):
                # first-fit-decreasing over (tokens desc, id) order:
                # bins scanned first-fit; rows already sorted by the
                # Spark-side sortWithinPartitions.
                bins: list[tuple[int, list[int]]] = []  # (remaining, ids)
                for did, tok in zip(grp["id"].to_numpy(),
                                    grp["tokens"].to_numpy()):
                    for i, (rem, ids) in enumerate(bins):
                        if tok <= rem:
                            bins[i] = (rem - int(tok), ids + [int(did)])
                            break
                    else:
                        bins.append((max_tokens - int(tok), [int(did)]))
                for i, (rem, ids) in enumerate(bins):
                    total = max_tokens - rem
                    out_rows.append((
                        f"b{int(bucket)}-s{i}", ids, len(ids), total,
                        total / max_tokens,
                    ))
            yield pd.DataFrame(
                out_rows,
                columns=["seq_id", "doc_ids", "n_docs", "total_tokens",
                         "fill_ratio"],
            )

    packed = eligible.mapInPandas(pack, schema=PACKED_SCHEMA)
    return packed, overflow


def pack_assignments(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, seq_id): the per-document view of a packing — the doc-
    conservation projection the driver oracle checks (every eligible
    doc exactly once)."""
    return packed.select(
        F.col("seq_id"), F.explode("doc_ids").alias(id_col)
    ).select(id_col, "seq_id")
