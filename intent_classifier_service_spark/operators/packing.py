"""Document packing: assemble variable-length documents into
fixed-token-budget training sequences — the step between a cleaned
corpus and a pretraining dataloader (reference analog: none; this is
one of the beyond-reference LLM-pipeline operators, like dedup/ANN).

Distributed shape: true optimal packing is a global sequential bin-pack
— inherently serial — so this implements the standard scalable
approximation: deterministic hash-bucketed partitions, each packed
independently with an in-partition greedy best-fit-decreasing pass
(pure numpy/python over metadata-sized rows: id + token count, never
the text). Packing quality loses only the cross-partition tail (≤ one
underfull sequence per partition, amortized away as partitions grow
toward 100 TB); wall-clock is one shuffle + one mapInPandas.

The kernel consumes the partition's FULL Arrow-batch iterator before
packing (mapInPandas splits partitions into ~10k-row batches per
spark.sql.execution.arrow.maxRecordsPerBatch): packing each batch
independently would restart the greedy pass and the sequence counter
mid-bucket — duplicate seq_ids and a silent quality cliff at exactly
the scale the module targets. The per-bucket frame is metadata-only
(id + count), so memory is ~16 bytes/doc.

Bucket sizing rule: keep ≤ ~1M docs per bucket (n_buckets ≥
n_docs / 1e6) — the per-bucket pandas frame stays tens of MB and the
O(n log max_tokens) kernel stays in seconds; buckets pack in parallel
across executors.

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

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACKED_COLS = ["seq_id", "doc_ids", "n_docs", "total_tokens", "fill_ratio"]


class _CapacityIndex:
    """Fenwick tree over the integer remaining-capacity domain
    [0, max_tokens]: add/remove a bin at capacity r in O(log C), and
    successor(t) — the smallest capacity ≥ t with an open bin — via a
    single Fenwick walk in O(log C). This is what makes best-fit
    O(n log C) instead of the O(n · open_bins) per-doc scan a naive
    first-fit loop costs (quadratic when buckets hold many small docs)."""

    def __init__(self, cap: int):
        self.n = cap + 1  # capacities 0..cap → tree indices 1..cap+1
        self.tree = [0] * (self.n + 1)
        self.total = 0

    def add(self, r: int, delta: int) -> None:
        self.total += delta
        i = r + 1
        while i <= self.n:
            self.tree[i] += delta
            i += i & (-i)

    def _prefix(self, r: int) -> int:
        i, s = r + 1, 0
        while i > 0:
            s += self.tree[i]
            i -= i & (-i)
        return s

    def successor(self, t: int) -> int:
        """Smallest capacity r >= t with count > 0, else -1."""
        below = self._prefix(t - 1) if t > 0 else 0
        if self.total == below:
            return -1
        target = below + 1  # find the target-th bin in capacity order
        pos, bit = 0, 1 << self.n.bit_length()
        while bit:
            nxt = pos + bit
            if nxt <= self.n and self.tree[nxt] < target:
                target -= self.tree[nxt]
                pos = nxt
            bit >>= 1
        return pos  # tree index pos+1 → capacity pos


def _pack_bucket(ids, toks, max_tokens: int) -> list[tuple]:
    """Best-fit-decreasing over one bucket's (tokens desc, id)-sorted
    rows: each doc goes to the open bin with the SMALLEST remaining
    capacity that still fits (ties broken FIFO — deterministic). Input
    order is already pinned by the Spark-side sortWithinPartitions."""
    cap_idx = _CapacityIndex(max_tokens)
    bin_ids: list[list] = []
    bin_rem: list[int] = []
    avail: dict[int, deque[int]] = {}
    for did, tok in zip(ids, toks):
        tok = int(tok)
        r = cap_idx.successor(tok)
        if r < 0:
            b = len(bin_ids)
            bin_ids.append([did])
            rem = max_tokens - tok
            bin_rem.append(rem)
        else:
            b = avail[r].popleft()
            cap_idx.add(r, -1)
            bin_ids[b].append(did)
            rem = r - tok
            bin_rem[b] = rem
        avail.setdefault(rem, deque()).append(b)
        cap_idx.add(rem, 1)
    return [
        (ids_, max_tokens - rem) for ids_, rem in zip(bin_ids, bin_rem)
    ]


def pack_greedy(docs: DataFrame, max_tokens: int, id_col: str = "doc_id",
                tokens_col: str = "n_tokens",
                n_buckets: int = 64) -> tuple[DataFrame, DataFrame]:
    """(packed, overflow): packed has one row per output sequence —
    (seq_id, doc_ids, n_docs, total_tokens, fill_ratio) — overflow is
    the (id, tokens) rows that exceed ``max_tokens`` alone. seq_id is
    'b<bucket>-s<index>' (bucket-local index in deterministic greedy
    order), unique and stable across runs. Doc ids may be any integral
    or string type; ``doc_ids`` carries the input id type through."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    id_ddl = docs.schema[id_col].dataType.simpleString()
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
        # Consume the WHOLE partition before packing: Arrow hands the
        # partition over as ~10k-row batches; per-batch packing would
        # reset the greedy state and seq counter mid-bucket (duplicate
        # seq_ids, broken FFD quality). Rows are metadata-sized.
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        out_rows = []
        # a partition holds exactly one bucket (hash-partitioned on
        # _bucket with n_buckets partitions) — but stay correct if
        # two buckets collide into one partition: pack per bucket.
        for bucket, grp in pdf.groupby("_bucket", sort=True):
            bins = _pack_bucket(grp["id"].tolist(),
                                grp["tokens"].to_numpy(), max_tokens)
            for i, (ids, total) in enumerate(bins):
                out_rows.append((
                    f"b{int(bucket)}-s{i}", ids, len(ids), total,
                    total / max_tokens,
                ))
        yield pd.DataFrame(out_rows, columns=_PACKED_COLS)

    packed = eligible.mapInPandas(
        pack,
        schema=(f"seq_id string, doc_ids array<{id_ddl}>, n_docs int, "
                f"total_tokens long, fill_ratio double"),
    )
    return packed, overflow


def split_overflow(overflow: DataFrame, max_tokens: int,
                   id_col: str = "doc_id",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """Turn pack_greedy's overflow frame (docs longer than the budget)
    into packable chunks: doc of n tokens → ceil(n / max_tokens)
    chunks of max_tokens each, the last carrying the remainder —
    (id, chunk_index, chunk_tokens). The EXPLICIT version of what a
    dataloader's truncation does silently; chunk rows feed back into
    pack_greedy keyed by (id, chunk_index).

    Scale shape: a pure stateless projection — F.sequence + explode,
    zero shuffle, zero Python; a doc's chunk list is a function of its
    own token count alone."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    n = F.col(tokens_col).cast("long")
    n_chunks = F.ceil(n / F.lit(max_tokens)).cast("int")
    return (
        overflow.filter(n.isNotNull() & (n > 0))
        .select(
            F.col(id_col), n.alias("_n"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
        )
        .select(
            id_col, "chunk_index",
            F.least(F.lit(max_tokens),
                    F.col("_n") - F.col("chunk_index") * F.lit(max_tokens))
            .cast("long").alias("chunk_tokens"),
        )
    )


def pack_assignments(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, seq_id): the per-document view of a packing — the doc-
    conservation projection the driver oracle checks (every eligible
    doc exactly once)."""
    return packed.select(
        F.col("seq_id"), F.explode("doc_ids").alias(id_col)
    ).select(id_col, "seq_id")
