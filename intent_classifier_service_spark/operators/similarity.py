"""Similarity search over an embedding column (array<float>).

  brute_force_topk — exact cosine top-k: each partition scores its rows
                     against a small broadcast query matrix in one numpy
                     matmul (Arrow batch), keeps a local top-k, and a
                     window/limit merges per-query global top-k. The
                     shuffle carries only n_queries × k × partitions
                     candidate rows, never the corpus.
  lsh_topk         — random-hyperplane LSH: 64-bit sign signature per
                     vector (JVM-expressible dot signs via aggregate, but
                     done in the same numpy batch for speed), bucket on
                     prefix bands, score only within buckets — the
                     100 TB path (probes ≪ corpus).
  cosine_pairs     — exact cosine between candidate id pairs (verifier
                     for embedding near-dup dedup).

Design: embeddings never leave the JVM except as Arrow batches into
numpy; no per-row Python. Queries are driver-side literals (a handful
of vectors), broadcast via closure capture.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _topk_scorer_schema():
    return "query_id long, vec_id long, score double"


def brute_force_topk(embeddings: DataFrame, queries: list[tuple[int, list[float]]],
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query. queries: [(query_id, vector)]."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)

    def score_partition(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = (mat / norms) @ qmat.T  # (rows, n_queries)
            out = []
            for qi in range(len(qids)):
                col = sims[:, qi]
                top = np.argsort(-col)[:k]  # local top-k only
                out.append(
                    pd.DataFrame(
                        {"query_id": qids[qi], "vec_id": ids[top], "score": col[top]}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    local = embeddings.select(id_col, vec_col).mapInPandas(
        score_partition, schema=_topk_scorer_schema()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def hyperplane_signatures(embeddings: DataFrame, n_bits: int = 32,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 42, dim: int | None = None) -> DataFrame:
    """(vec_id, sig: long) — sign-of-dot-product signature against
    n_bits random hyperplanes; one numpy matmul per Arrow batch."""
    first = embeddings.select(F.size(vec_col).alias("d")).first() if dim is None else None
    d = dim if dim is not None else int(first["d"])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(d, n_bits))

    def sign_partition(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ planes) > 0  # (rows, n_bits)
            sig = np.zeros(len(pdf), dtype=np.int64)
            for b in range(n_bits):
                sig |= bits[:, b].astype(np.int64) << b
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "sig": sig})

    return embeddings.select(id_col, vec_col).mapInPandas(
        sign_partition, schema=f"{id_col} long, sig long"
    )


def lsh_topk(embeddings: DataFrame, queries: list[tuple[int, list[float]]],
             k: int = 10, n_bits: int = 32, bands: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """Approximate top-k: restrict scoring to rows sharing ≥1 LSH band
    with the query, then exact cosine within candidates. Recall rises
    with bands; cost is candidates/corpus fraction.

    Guarantees k results per query (when the corpus holds ≥ k rows): a
    query landing in sparse buckets can gather < k candidates, so after
    one metadata-sized per-query count of the candidate table,
    shortfall queries fall back to exact brute-force top-k — their LSH
    rows are dropped entirely, so each query's result comes from
    exactly one scorer (mixing the JVM and numpy scores of the same
    pair would leave rank order to ~1e-16 float noise). The fallback
    touches only the shortfall queries. The count is a separate action
    that re-runs the signature scan (2 scans become 3): deliberate —
    persisting the candidate table instead would pin corpus-fraction-
    sized blocks in executor storage for the session's lifetime (cache
    leak per call), which is the worse trade at 100 TB."""
    dim = len(queries[0][1])
    sigs = hyperplane_signatures(embeddings, n_bits, id_col, vec_col, seed, dim=dim)
    r = n_bits // bands
    mask = (1 << r) - 1

    def band_cols(sig_col):
        return [
            ((sig_col >> (b * r)) & mask) if isinstance(sig_col, int)
            else F.shiftright(sig_col, b * r).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_bits))
    q_rows = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        bits = (v @ planes) > 0
        sig = 0
        for b in range(n_bits):
            sig |= int(bits[b]) << b
        for b in range(bands):
            q_rows.append((qid, b, (sig >> (b * r)) & mask))
    qdf = embeddings.sparkSession.createDataFrame(
        q_rows, "query_id long, band int, bucket long"
    )
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.shiftright("sig", b * r).bitwiseAND(F.lit(mask)).alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand_ids = (
        banded.join(F.broadcast(qdf), ["band", "bucket"])
        .select("query_id", id_col)
        .dropDuplicates(["query_id", id_col])
    )
    cand_counts = {
        r["query_id"]: r["n"]
        for r in cand_ids.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    short_queries = [q for q in queries if cand_counts.get(q[0], 0) < k]
    cand_vecs = cand_ids.join(embeddings.select(id_col, vec_col), id_col)
    # Exact cosine on candidates only (JVM-side arithmetic via aggregate).
    qmap = {qid: np.asarray(v, dtype=np.float64) for qid, v in queries}
    qnorm = {qid: v / max(np.linalg.norm(v), 1e-12) for qid, v in qmap.items()}
    qlit = F.map_from_arrays(
        F.array(*[F.lit(int(qid)) for qid in qnorm]),
        F.array(*[
            F.array(*[F.lit(float(x)) for x in vec]) for vec in qnorm.values()
        ]),
    )
    qvec = F.element_at(qlit, F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qvec, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(F.transform(F.col(vec_col), lambda a: a * a), F.lit(0.0),
                    lambda acc, x: acc + x)
    )
    scored = cand_vecs.select(
        "query_id", id_col, (dot / F.greatest(norm, F.lit(1e-12))).alias("score")
    )
    if short_queries:
        short_ids = [int(q[0]) for q in short_queries]
        scored = scored.filter(~F.col("query_id").isin(short_ids)).unionByName(
            brute_force_topk(embeddings, short_queries, k, id_col, vec_col)
            .select("query_id", id_col, "score")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def _kmeans_sample(embeddings: DataFrame, id_col: str, vec_col: str,
                   n: int) -> np.ndarray:
    """Deterministic pseudo-random training sample: top-n by xxhash64
    of the id. `.limit(n)` alone would take the FIRST rows, which are
    often write-order-correlated (one class/time region) and would bias
    every centroid into that region; ordering by a hash decorrelates.
    Plans as TakeOrderedAndProject (per-partition top-n heaps + driver
    merge of n), not a full sort."""
    pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(id_col))
        .limit(n)
        .toPandas()
    )
    return np.array(pdf[vec_col].tolist(), dtype=np.float64)


def _spherical_kmeans(sample: np.ndarray, n_centroids: int, iters: int,
                      seed: int) -> np.ndarray:
    """Driver-side Lloyd iterations with cosine assignment on a small
    sample — cheap (numpy, O(sample × centroids × iters)) and much
    better cell balance than random hyperplane centroids."""
    rng = np.random.RandomState(seed)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    centroids = sample[rng.choice(len(sample), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    return centroids


def ivf_topk(embeddings: DataFrame, queries: list[tuple[int, list[float]]],
             k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 7, kmeans_sample: int = 4096,
             kmeans_iters: int = 8) -> DataFrame:
    """IVF-style ANN: spherical-k-means centroids trained driver-side
    on a sampled subset (seeded → deterministic), every vector assigned
    to its nearest centroid in one numpy matmul per Arrow batch, then
    queries score only against their n_probe nearest cells.

    Scale shape: the centroid training touches only `kmeans_sample`
    rows; the corpus is scanned once to build cell assignments (in
    production: written bucketed-by-cell so probes prune at the file
    level); each query touches ~n_probe/n_centroids of the data.
    """
    dim = len(queries[0][1])
    sample = _kmeans_sample(embeddings, id_col, vec_col,
                            max(kmeans_sample, n_centroids))
    centroids = _spherical_kmeans(sample, min(n_centroids, len(sample)),
                                  kmeans_iters, seed)
    n_centroids = len(centroids)

    def assign(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = np.argmax((mat / norms) @ centroids.T, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "cell": cells.astype(np.int32)})

    cells = embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, cell int"
    )
    q_rows = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        probes = np.argsort(-(centroids @ v))[:n_probe]
        q_rows.extend((int(qid), int(c)) for c in probes)
    qdf = embeddings.sparkSession.createDataFrame(q_rows, "query_id long, cell int")
    cand = (
        cells.join(F.broadcast(qdf), "cell")
        .select("query_id", id_col)
        .dropDuplicates(["query_id", id_col])
        .join(embeddings.select(id_col, vec_col), id_col)
    )
    qmap = {int(qid): (np.asarray(v, dtype=np.float64)
                       / max(np.linalg.norm(v), 1e-12)).tolist()
            for qid, v in queries}
    qlit = F.map_from_arrays(
        F.array(*[F.lit(qid) for qid in qmap]),
        F.array(*[F.array(*[F.lit(float(x)) for x in vec]) for vec in qmap.values()]),
    )
    qvec = F.element_at(qlit, F.col("query_id"))
    dot = F.aggregate(F.zip_with(F.col(vec_col), qvec, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda a: a * a),
                              F.lit(0.0), lambda acc, x: acc + x))
    scored = cand.select("query_id", id_col,
                         (dot / F.greatest(norm, F.lit(1e-12))).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def _assign_cells(embeddings: DataFrame, centroids: np.ndarray,
                  id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cell): nearest-centroid assignment via one whole-batch
    matmul per Arrow batch — shared by index build and append."""

    def assign(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = np.argmax((mat / norms) @ centroids.T, axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out["cell"] = cells.astype(np.int32)
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, cell int"
    )


def _quantize_cells(assigned: DataFrame, id_col: str,
                    vec_col: str) -> DataFrame:
    """(id, q8, cell): symmetric per-vector int8 quantization of an
    assigned (id, vec, cell) frame — q = round(v / (max|v|/127)),
    clipped to [-127, 127]. Cosine over q8 needs NO stored scale
    (per-vector scale cancels in dot/||q||), so the sidecar carries
    only the codes: 4x less index I/O per probed cell than float32.
    Zero vectors quantize to zeros (scored 0 like the full path)."""

    def quant(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            s = np.maximum(np.abs(mat).max(axis=1, keepdims=True), 1e-12) / 127.0
            q = np.clip(np.rint(mat / s), -127, 127).astype(np.int8)
            out = pd.DataFrame({
                id_col: pdf[id_col].values,
                "q8": [row.tolist() for row in q],
                "cell": pdf["cell"].values,
            })
            yield out

    return assigned.mapInPandas(
        quant, schema=f"{id_col} long, q8 array<tinyint>, cell int"
    )


def _q8_dir(path: str) -> str:
    return os.path.join(path, "cells_q8")


# Rebalance criterion recorded in the index manifest: when the largest
# cell exceeds this multiple of the mean cell size, probing that cell
# costs ~skew× the average scan and the index should be REBUILT
# (re-trained centroids), not appended to further. Appends never
# retrain, so drifted new data degrades gradually and visibly here.
IVF_REBALANCE_SKEW = 4.0


def _write_ivf_manifest(path: str, cell_counts: dict[int, int],
                        n_appends: int, append_counts: list[int]) -> dict:
    """Index manifest (JSON next to cells/ + centroids/): total size,
    per-cell counts, per-append history, cell-size skew, and the
    rebalance verdict — the metadata a 100 TB deployment checks before
    yet another append. Persisting ``cell_counts`` is what lets appends
    merge incrementally instead of re-scanning the whole cells/ tree."""
    import json

    sizes = list(cell_counts.values())
    mean = (sum(sizes) / len(sizes)) if sizes else 0.0
    skew = (max(sizes) / mean) if mean > 0 else 0.0
    manifest = {
        "n_vectors": sum(sizes),
        "n_cells": len(sizes),
        "n_appends": n_appends,
        "append_counts": append_counts,
        "cell_counts": {str(c): int(n) for c, n in sorted(cell_counts.items())},
        "max_cell": max(sizes) if sizes else 0,
        "mean_cell": mean,
        "cell_skew": skew,
        "rebalance_skew_threshold": IVF_REBALANCE_SKEW,
        "rebalance_recommended": skew > IVF_REBALANCE_SKEW,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _read_ivf_manifest(path: str) -> dict | None:
    import json

    p = os.path.join(path, "manifest.json")
    if not os.path.exists(p):
        return None  # pre-manifest index (built before round 6)
    with open(p) as f:
        return json.load(f)


def build_ivf_index(embeddings: DataFrame, path: str, n_centroids: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 7, kmeans_sample: int = 4096,
                    kmeans_iters: int = 8,
                    quantize: bool = False) -> np.ndarray:
    """Persist an IVF index: vectors written as parquet PARTITIONED BY
    their cell id, centroids alongside. At query time only the probed
    cells' directories are read — partition pruning at the file level,
    the 100 TB ANN pattern (an in-memory cell column can't prune I/O).
    Returns the trained centroids.

    ``quantize=True`` additionally writes an int8 sidecar
    (cells_q8/, same cell partitioning): ivf_topk_quantized scans the
    4x-smaller codes for candidate ranking and refetches full vectors
    only for the rescore set. The sidecar's presence on disk IS the
    flag — append and rebalance keep it in sync when it exists."""
    sample = _kmeans_sample(embeddings, id_col, vec_col,
                            max(kmeans_sample, n_centroids))
    centroids = _spherical_kmeans(sample, min(n_centroids, len(sample)),
                                  kmeans_iters, seed)

    assigned = _assign_cells(embeddings, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "cells")
    )
    if quantize:
        _quantize_cells(assigned, id_col, vec_col).write.mode(
            "overwrite").partitionBy("cell").parquet(_q8_dir(path))
    spark = embeddings.sparkSession
    from ..sources.tables import tiny_table
    cdf = tiny_table(
        spark,
        [(i, centroids[i].tolist()) for i in range(len(centroids))],
        "cell int, centroid array<double>",
    )
    cdf.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    counts = {
        r["cell"]: r["n"]
        for r in spark.read.parquet(os.path.join(path, "cells"))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }  # n_centroids rows — metadata-sized collect
    _write_ivf_manifest(path, counts, n_appends=0,
                        append_counts=[sum(counts.values())])
    return centroids


def append_to_ivf_index(spark, path: str, new_embeddings: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> dict:
    """Incrementally append vectors to a persisted IVF index: assign to
    the EXISTING centroids (no retrain — query-time probe order stays
    stable and old cells are never rewritten) and APPEND parquet files
    into the matching cell partitions. Returns the updated manifest.

    Scale shape: the append touches only the new vectors (one matmul
    pass + one partitioned write, plus one metadata-sized count of the
    SAME new batch — never a scan of the existing cells/ tree: the
    prior per-cell counts come from the manifest and the new
    assignments' counts merge in). The cost of never retraining is
    drift — new data far from any trained centroid piles into its
    nearest cell, so the manifest recomputes cell-size skew on every
    append and flips ``rebalance_recommended`` once max/mean exceeds
    ``IVF_REBALANCE_SKEW`` (at that point a probe of the hot cell scans
    ~skew× the average: split it with rebalance_ivf_cells)."""
    crows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    centroids = np.zeros((len(crows), len(crows[0]["centroid"])))
    for r in crows:
        centroids[r["cell"]] = r["centroid"]

    assigned = _assign_cells(new_embeddings, centroids, id_col, vec_col)
    assigned.write.mode("append").partitionBy("cell").parquet(
        os.path.join(path, "cells")
    )
    if os.path.isdir(_q8_dir(path)):  # keep the int8 sidecar in sync
        _quantize_cells(assigned, id_col, vec_col).write.mode(
            "append").partitionBy("cell").parquet(_q8_dir(path))
    # counts of THIS batch only (re-runs the assign matmul on the new
    # vectors — the append's own size, not the index's)
    new_counts = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    prior = _read_ivf_manifest(path)
    if prior and "cell_counts" in prior:
        counts = {int(c): n for c, n in prior["cell_counts"].items()}
    else:  # pre-manifest/pre-counts index: one legacy full count, then
        # the manifest carries counts forward incrementally
        counts = {
            r["cell"]: r["n"] - new_counts.get(r["cell"], 0)
            for r in spark.read.parquet(os.path.join(path, "cells"))
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    for c, n in new_counts.items():
        counts[c] = counts.get(c, 0) + n
    prior_appends = prior["n_appends"] if prior else 0
    prior_counts = prior["append_counts"] if prior else []
    return _write_ivf_manifest(
        path, counts, n_appends=prior_appends + 1,
        append_counts=prior_counts + [sum(new_counts.values())],
    )


def rebalance_ivf_cells(spark, path: str,
                        max_cell_ratio: float = IVF_REBALANCE_SKEW,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 7, kmeans_iters: int = 8,
                        sample_per_cell: int = 4096) -> dict:
    """Act on the manifest's rebalance criterion: every cell whose size
    exceeds ``max_cell_ratio`` × the mean cell size is SPLIT by a local
    2-means trained on that cell alone — one subcluster keeps the old
    cell id (its centroid updated in place), the other gets a fresh id.
    Returns the updated manifest. ONE split round per call,
    deliberately: if the manifest still recommends rebalancing
    afterwards, the data genuinely concentrates (a pile of
    near-duplicate vectors is one true cluster no clustering can
    split) — the right response is near-dup dedup or a full retrain,
    not more splitting churn.

    Scale shape: only the hot cells are read (directory-level pruning —
    each is read from its own cell=<id> path) and only their partitions
    are rewritten (dynamic partition overwrite: cell=<old> replaced,
    cell=<new> created; every other cell's files are untouched,
    byte-identical — pytest pins paths+mtimes). Query-time probe order
    over unsplit cells is unchanged; probes near a split cell now see
    two tighter centroids instead of one hot one. The 2-means trains on
    ≤ ``sample_per_cell`` vectors driver-side; assignment of the cell's
    full membership is one numpy matmul pass."""
    manifest = _read_ivf_manifest(path)
    if manifest is None or "cell_counts" not in manifest:
        raise ValueError("no manifest with cell_counts — rebuild the index")
    counts = {int(c): n for c, n in manifest["cell_counts"].items()}
    mean = sum(counts.values()) / max(len(counts), 1)
    hot = sorted(c for c, n in counts.items()
                 if mean > 0 and n > max_cell_ratio * mean and n >= 2)
    if not hot:
        return manifest

    cpath = os.path.join(path, "centroids")
    crows = spark.read.parquet(cpath).collect()
    cent_map = {r["cell"]: list(r["centroid"]) for r in crows}
    next_id = max(cent_map) + 1
    cells_root = os.path.join(path, "cells")

    for c in hot:
        # read ONLY this cell's directory; materialize before the
        # overwrite below (read-your-writes hazard otherwise)
        cell_df = spark.read.parquet(
            os.path.join(cells_root, f"cell={c}")
        ).localCheckpoint(eager=True)
        sample_pdf = (
            cell_df.select(vec_col).orderBy(F.xxhash64(id_col))
            .limit(sample_per_cell).toPandas()
        )
        sample = np.array(sample_pdf[vec_col].tolist(), dtype=np.float64)
        sub_centroids = _spherical_kmeans(sample, 2, kmeans_iters, seed)
        new_id = next_id
        next_id += 1
        pair = np.vstack([sub_centroids[0], sub_centroids[1]])

        def split_assign(batches, _pair=pair, _c=c, _new=new_id):
            for pdf in batches:
                mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                norms = np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                sub = np.argmax((mat / norms) @ _pair.T, axis=1)
                out = pdf[[id_col, vec_col]].copy()
                out["cell"] = np.where(sub == 0, _c, _new).astype(np.int32)
                yield out

        split = cell_df.mapInPandas(
            split_assign, schema=f"{id_col} long, {vec_col} array<float>, cell int"
        ).localCheckpoint(eager=True)  # pin assignment before the write
        sub_counts = {r["cell"]: r["n"] for r in
                      split.groupBy("cell").agg(
                          F.count(F.lit(1)).alias("n")).collect()}
        (split.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("cell").parquet(cells_root))
        if os.path.isdir(_q8_dir(path)):
            # re-quantize ONLY the split cell's vectors; the dynamic
            # overwrite replaces exactly the (old, new) q8 partitions
            (_quantize_cells(split, id_col, vec_col)
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("cell").parquet(_q8_dir(path)))
        cent_map[c] = sub_centroids[0].tolist()
        cent_map[new_id] = sub_centroids[1].tolist()
        counts[c] = sub_counts.get(c, 0)
        counts[new_id] = sub_counts.get(new_id, 0)

    from ..sources.tables import tiny_table
    cdf = tiny_table(
        spark, sorted(cent_map.items()), "cell int, centroid array<double>")
    cdf.write.mode("overwrite").parquet(cpath)
    return _write_ivf_manifest(
        path, counts, n_appends=manifest["n_appends"],
        append_counts=manifest["append_counts"],
    )


def ivf_topk_indexed(spark, path: str, queries: list[tuple[int, list[float]]],
                     k: int = 10, n_probe: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Query a persisted IVF index: load the tiny centroid table, pick
    each query's n_probe nearest cells, and scan ONLY those cell
    partitions (`cell IN (...)` prunes directories before any I/O —
    asserted in tests/test_physical_plans). Exact cosine within."""
    crows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    centroids = np.zeros((len(crows), len(crows[0]["centroid"])))
    for r in crows:
        centroids[r["cell"]] = r["centroid"]

    probe_cells: set[int] = set()
    q_rows = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        probes = np.argsort(-(centroids @ v))[:n_probe]
        probe_cells.update(int(c) for c in probes)
        q_rows.extend((int(qid), int(c)) for c in probes)
    qdf = spark.createDataFrame(q_rows, "query_id long, cell int")

    cells = spark.read.parquet(os.path.join(path, "cells")).filter(
        F.col("cell").isin(*sorted(probe_cells))  # partition pruning
    )
    cand = (
        cells.join(F.broadcast(qdf), "cell")
        .select("query_id", id_col, vec_col)
        .dropDuplicates(["query_id", id_col])
    )
    qmap = {int(qid): (np.asarray(v, dtype=np.float64)
                       / max(np.linalg.norm(v), 1e-12)).tolist()
            for qid, v in queries}
    qlit = F.map_from_arrays(
        F.array(*[F.lit(qid) for qid in qmap]),
        F.array(*[F.array(*[F.lit(float(x)) for x in vec]) for vec in qmap.values()]),
    )
    qvec = F.element_at(qlit, F.col("query_id"))
    dot = F.aggregate(F.zip_with(F.col(vec_col), qvec, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda a: a * a),
                              F.lit(0.0), lambda acc, x: acc + x))
    scored = cand.select("query_id", id_col,
                         (dot / F.greatest(norm, F.lit(1e-12))).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def ivf_topk_quantized(spark, path: str, queries: list[tuple[int, list[float]]],
                       k: int = 10, n_probe: int = 4,
                       rescore_factor: int = 4,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Query the int8 sidecar of a quantized IVF index: candidate
    ranking scans cells_q8/ (4x less I/O per probed cell — symmetric
    per-vector quantization whose scale cancels in cosine), the top
    ``rescore_factor * k`` candidates per query are re-scored EXACTLY
    against the full-precision cells (fetched by equi-join over the
    same pruned cell set), and the final top-k is exact over that
    candidate set. Quantization error can only change WHICH candidates
    reach the rescore, never their final scores — with
    rescore_factor >= 2 recall matches the full-precision path on the
    test table (pinned in tests/test_ann_recall)."""
    q8_root = _q8_dir(path)
    if not os.path.isdir(q8_root):
        raise ValueError(f"{path}: no cells_q8/ sidecar — "
                         "build_ivf_index(quantize=True) first")
    crows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    centroids = np.zeros((len(crows), len(crows[0]["centroid"])))
    for r in crows:
        centroids[r["cell"]] = r["centroid"]

    probe_cells: set[int] = set()
    q_rows = []
    qmap = {}
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        qmap[int(qid)] = v.tolist()
        probes = np.argsort(-(centroids @ v))[:n_probe]
        probe_cells.update(int(c) for c in probes)
        q_rows.extend((int(qid), int(c)) for c in probes)
    qdf = spark.createDataFrame(q_rows, "query_id long, cell int")
    qlit = F.map_from_arrays(
        F.array(*[F.lit(qid) for qid in qmap]),
        F.array(*[F.array(*[F.lit(float(x)) for x in vec])
                  for vec in qmap.values()]),
    )
    qvec = F.element_at(qlit, F.col("query_id"))

    cand = (
        spark.read.parquet(q8_root)
        .filter(F.col("cell").isin(*sorted(probe_cells)))  # dir pruning
        .join(F.broadcast(qdf), "cell")
        .select("query_id", id_col, "q8")
        .dropDuplicates(["query_id", id_col])
    )
    # approx cosine over the codes: tinyint*double stays in double; the
    # norm squares cast FIRST (tinyint*tinyint would overflow-throw
    # under ANSI at 127*127)
    adot = F.aggregate(
        F.zip_with(F.col("q8"), qvec, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    anorm = F.sqrt(F.aggregate(
        F.transform(F.col("q8"),
                    lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_score"), F.asc(id_col))
    shortlist = (
        cand.select("query_id", id_col,
                    (adot / F.greatest(anorm, F.lit(1e-12)))
                    .alias("approx_score"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rescore_factor * k)
        .select("query_id", id_col)
    )
    full = (
        spark.read.parquet(os.path.join(path, "cells"))
        .filter(F.col("cell").isin(*sorted(probe_cells)))
        .select(id_col, vec_col)
    )
    rescore = full.join(F.broadcast(shortlist), id_col)
    dot = F.aggregate(F.zip_with(F.col(vec_col), qvec, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda a: a * a),
                              F.lit(0.0), lambda acc, x: acc + x))
    scored = rescore.select(
        "query_id", id_col,
        (dot / F.greatest(norm, F.lit(1e-12))).alias("score"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def _banded_hyperplane(embeddings: DataFrame, n_bits: int, bands: int,
                       id_col: str, vec_col: str, seed: int,
                       dim: int | None) -> DataFrame:
    """(id, band, bucket): hyperplane signatures exploded into LSH band
    buckets — shared by the self-join pair generator and the persisted
    cross-corpus embedding index."""
    r = n_bits // bands
    mask = (1 << r) - 1
    sigs = hyperplane_signatures(embeddings, n_bits, id_col, vec_col, seed, dim=dim)
    return sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.shiftright("sig", b * r).bitwiseAND(F.lit(mask)).alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                            n_bits: int = 24, bands: int = 6,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            seed: int = 42, dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate detection: hyperplane-LSH bands
    generate candidates (pairs sharing a band bucket), exact cosine
    verifies. Never all-pairs; candidates ∝ collisions.

    Pass ``dim`` when known to skip the one-row dimensionality probe
    (an extra Spark job per call)."""
    banded = _banded_hyperplane(
        embeddings, n_bits, bands, id_col, vec_col, seed, dim)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return cosine_pairs(embeddings, cand, id_col, vec_col).filter(
        F.col("cosine") >= threshold
    )


# ------------------------------- cross-corpus incremental embedding dedup
#
# The embedding-modality twin of dedup.build_minhash_index /
# pairs_against_index / append_to_minhash_index: persist the standing
# corpus' hyperplane-LSH band buckets WITH the vectors, probe each
# ingest batch with one (band, bucket) equi-join + exact cosine verify,
# append survivors. Same manifest discipline (hash-family parameters
# travel with the index, probes re-derive signatures from it), same
# scale shape (the standing corpus is read, never re-paired against
# itself; candidates are bounded by batch collisions).


def build_embedding_index(embeddings: DataFrame, path: str,
                          n_bits: int = 24, bands: int = 6,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          seed: int = 42, dim: int | None = None) -> dict:
    """Persist (id, embedding, bucket) partitioned by band under
    ``path``/bands + manifest.json. The vector rides in the index row
    so the probe's exact-cosine verify never joins back to the source
    table. Returns the manifest."""
    from .dedup import _write_mh_manifest

    if dim is None:
        dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    banded = _banded_hyperplane(
        embeddings, n_bits, bands, id_col, vec_col, seed, dim
    ).join(embeddings.select(id_col, vec_col), id_col)
    banded.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(path, "bands"))
    spark = embeddings.sparkSession
    n_vecs = (
        spark.read.parquet(os.path.join(path, "bands"))
        .select(id_col).distinct().count()
    )
    params = {"n_bits": n_bits, "bands": bands, "seed": seed, "dim": dim,
              "id_col": id_col, "vec_col": vec_col}
    return _write_mh_manifest(path, params, n_vecs, 0, [])


def embedding_pairs_against_index(spark, path: str,
                                  new_embeddings: DataFrame,
                                  threshold: float = 0.95) -> DataFrame:
    """Near-dup pairs between an ingest batch of vectors and the
    persisted index: (id_new, id_indexed, cosine ≥ threshold). Batch
    signatures re-derive from the manifest's plane family; candidates
    come from ONE (band, bucket) equi-join streamed from the batch
    side; the verify is exact cosine between the batch vector and the
    vector STORED in the index row. Within-index pairs are never
    re-emitted; a re-ingested id never pairs with itself."""
    from .dedup import _read_mh_manifest

    m = _read_mh_manifest(path)
    id_col, vec_col = m["id_col"], m["vec_col"]
    banded_new = _banded_hyperplane(
        new_embeddings, m["n_bits"], m["bands"], id_col, vec_col,
        m["seed"], m["dim"],
    ).join(new_embeddings.select(id_col, vec_col), id_col)
    idx = spark.read.parquet(os.path.join(path, "bands"))
    n = banded_new.alias("n")
    i = idx.alias("i")
    # exact-cosine verify + filter per collision BEFORE the pair dedup
    # (round-9, same transformation as pairs_against_index): the dedup
    # exchange then carries (id, id, cosine) instead of both stored
    # vectors (2×dim×8 B per row) and hash-aggregates instead of
    # sort-aggregating over array payloads; a pair's cosine is
    # identical in every band it collides in, so distinct() over the
    # triple equals the old dedup-then-verify rows exactly.
    va, vb = F.col(f"n.{vec_col}"), F.col(f"i.{vec_col}")
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(va, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(vb, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    cand = (
        n.join(
            i,
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bucket") == F.col("i.bucket"))
            & (F.col(f"n.{id_col}") != F.col(f"i.{id_col}")),
        )
        .select(
            F.col(f"n.{id_col}").alias("id_new"),
            F.col(f"i.{id_col}").alias("id_indexed"),
            (dot / F.greatest(na * nb, F.lit(1e-12))).alias("cosine"),
        )
    )
    return cand.filter(F.col("cosine") >= threshold).distinct()


def append_to_embedding_index(spark, path: str,
                              new_embeddings: DataFrame) -> dict:
    """Fold an ingest batch of vectors into the persisted embedding
    index (parquet append into the band partitions + manifest bump) —
    the embedding twin of dedup.append_to_minhash_index."""
    from .dedup import _read_mh_manifest, _write_mh_manifest

    m = _read_mh_manifest(path)
    id_col, vec_col = m["id_col"], m["vec_col"]
    banded = _banded_hyperplane(
        new_embeddings, m["n_bits"], m["bands"], id_col, vec_col,
        m["seed"], m["dim"],
    ).join(new_embeddings.select(id_col, vec_col), id_col).persist()
    n_new = banded.select(id_col).distinct().count()
    banded.write.mode("append").partitionBy("band").parquet(
        os.path.join(path, "bands"))
    banded.unpersist()
    params = {k: m[k] for k in (
        "n_bits", "bands", "seed", "dim", "id_col", "vec_col")}
    return _write_mh_manifest(
        path, params, m["n_docs"] + n_new, m["n_appends"] + 1,
        m["append_counts"] + [n_new])


def cosine_pairs(embeddings: DataFrame, pairs: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine for explicit (id_a, id_b) pairs — the embedding
    near-dup verifier. Joins stream the pair list against the corpus."""
    e = embeddings.select(F.col(id_col), F.col(vec_col))
    a = e.withColumnRenamed(id_col, "id_a").withColumnRenamed(vec_col, "_va")
    b = e.withColumnRenamed(id_col, "id_b").withColumnRenamed(vec_col, "_vb")
    j = pairs.join(a, "id_a").join(b, "id_b")
    dot = F.aggregate(F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("_va", lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("_vb", lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    return j.select(
        "id_a", "id_b",
        (dot / F.greatest(na * nb, F.lit(1e-12))).alias("cosine"),
    )
