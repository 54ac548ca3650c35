import numpy as np

from intent_classifier_service_spark.operators import similarity
from intent_classifier_service_spark.sources.tables import save_as_csv


def _embeddings(spark, n=80, d=8, seed=3):
    rng = np.random.RandomState(seed)
    mat = rng.normal(size=(n, d))
    # inject two near-duplicate pairs
    mat[50] = mat[10] + rng.normal(scale=1e-3, size=d)
    mat[60] = mat[20] + rng.normal(scale=1e-3, size=d)
    rows = [(i, mat[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), mat


def test_ivf_topk_finds_self_and_overlaps_exact(spark):
    df, mat = _embeddings(spark)
    q = mat[10]
    got = similarity.ivf_topk(df, [(10, q.tolist())], k=5, n_centroids=8, n_probe=4)
    rows = sorted(got.collect(), key=lambda r: r["rank"])
    assert rows[0]["vec_id"] == 10 and rows[0]["score"] > 0.999
    # the injected near-dup must be found too (same cell or probed cell)
    assert any(r["vec_id"] == 50 for r in rows)


def test_embedding_neardup_pairs(spark):
    df, _ = _embeddings(spark)
    got = {(r["id_a"], r["id_b"]) for r in
           similarity.embedding_neardup_pairs(df, threshold=0.99).collect()}
    assert (10, 50) in got
    assert (20, 60) in got
    # no false positives among random gaussian vectors at tau=0.99
    assert got == {(10, 50), (20, 60)}


def test_save_as_csv_single_file(spark, tmp_path):
    df = spark.createDataFrame([("macro", 0.5)], "average string, f1 double")
    out = str(tmp_path / "metrics_csv")
    save_as_csv(df, out)
    import glob

    files = glob.glob(out + "/part-*.csv")
    assert len(files) == 1
    content = open(files[0]).read()
    assert content.startswith("average,f1")


def test_ivf_index_build_query_and_pruning(spark, tmp_path):
    """Persisted IVF index: cell-partitioned parquet; the probe query
    prunes partitions at scan time (PartitionFilters in the plan) and
    its recall@10 vs brute force holds the same 0.8 bar as the
    in-memory path."""
    import re

    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in emb.filter(F.col("vec_id") < 3).collect()]
    path = str(tmp_path / "ivf")
    centroids = similarity.build_ivf_index(emb, path, n_centroids=16)
    assert centroids.shape == (16, 64)

    out = similarity.ivf_topk_indexed(spark, path, queries, k=10, n_probe=12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "cell" in m.group(1), plan[:2000]

    def topk_ids(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return got

    exact = topk_ids(similarity.brute_force_topk(emb, queries, k=10))
    approx = topk_ids(out)
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_index_incremental_append(spark, tmp_path):
    """Round-5 verdict #8: an index built from HALF the corpus then
    grown with append_to_ivf_index (assign-to-existing-centroids, no
    retrain, parquet partition append) serves ivf_topk_indexed with
    the SAME recall bar as a one-shot build, and the manifest tracks
    append history + the cell-skew rebalance criterion."""
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")

    similarity.build_ivf_index(first, path, n_centroids=16)
    m0 = similarity._read_ivf_manifest(path)
    assert m0["n_appends"] == 0 and m0["n_vectors"] == first.count()

    m1 = similarity.append_to_ivf_index(spark, path, second)
    assert m1["n_appends"] == 1
    assert m1["n_vectors"] == emb.count()
    assert m1["append_counts"] == [first.count(), second.count()]
    assert isinstance(m1["rebalance_recommended"], bool)
    assert m1["cell_skew"] <= similarity.IVF_REBALANCE_SKEW  # uniform data

    # two-append index answers queries at the unchanged recall bar,
    # including queries whose true neighbors arrived via the append
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in emb.filter(F.col("vec_id") < 4).collect()]
    out = similarity.ivf_topk_indexed(spark, path, queries, k=10, n_probe=12)

    def topk_ids(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return got

    exact = topk_ids(similarity.brute_force_topk(emb, queries, k=10))
    approx = topk_ids(out)
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls

    # appended vectors really landed in cell partitions (not a rewrite:
    # the second write only appended files)
    cells = spark.read.parquet(path + "/cells")
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()


def test_ivf_append_counts_come_from_manifest_not_full_scan(spark, tmp_path):
    """Appends must merge the manifest's persisted cell_counts with the
    new batch's counts — deleting the cells/ tree's READABILITY isn't
    testable cheaply, but count correctness across two appends is: the
    merged counts must equal a ground-truth full count."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    c = emb.filter(F.col("vec_id") % 3 == 2)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(a, path, n_centroids=8)
    similarity.append_to_ivf_index(spark, path, b)
    m = similarity.append_to_ivf_index(spark, path, c)
    truth = {r["cell"]: r["n"] for r in
             spark.read.parquet(path + "/cells").groupBy("cell")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {int(k): v for k, v in m["cell_counts"].items()} == truth
    assert m["n_vectors"] == emb.count()


def test_ivf_rebalance_splits_hot_cell_only(spark, tmp_path):
    """rebalance_ivf_cells executes the manifest's criterion: a drifted
    append (a pile of near-duplicates of one corpus vector) blows one
    cell past the skew threshold; the rebalance must split ONLY that
    cell (every other cell's parquet files byte-identical by
    path+size+mtime), update the centroid table in place, and keep
    ivf_topk_indexed at the recall bar over the grown corpus."""
    import glob
    import os

    import numpy as np
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, n_centroids=8)

    # drifted append: 3n vectors in TWO tight sub-clusters around one
    # corpus vector (±0.35·|base| along a fixed direction) — both land
    # in the same nearest-centroid cell (hot), but are 2-means-separable
    # (a pile of literal near-copies is one true cluster and cannot be
    # split by any clustering)
    base = np.array(emb.filter(F.col("vec_id") == 0)
                    .collect()[0]["embedding"], dtype=np.float64)
    rng = np.random.RandomState(11)
    u = rng.normal(size=base.shape)
    u /= np.linalg.norm(u)
    bn = np.linalg.norm(base)
    drift_rows = [
        (int(1_000_000 + i),
         (base + (0.35 if i % 2 == 0 else -0.35) * u * bn
          + rng.normal(scale=1e-3 * bn, size=base.shape)).tolist())
        for i in range(3 * n)
    ]
    drift = spark.createDataFrame(drift_rows, "vec_id long, embedding array<double>")
    m = similarity.append_to_ivf_index(spark, path, drift)
    assert m["rebalance_recommended"] is True

    counts = {int(k): v for k, v in m["cell_counts"].items()}
    mean = sum(counts.values()) / len(counts)
    hot = {c for c, x in counts.items()
           if x > similarity.IVF_REBALANCE_SKEW * mean}
    assert hot
    untouched = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for c in counts if c not in hot
        for f in glob.glob(f"{path}/cells/cell={c}/*.parquet")
    }
    assert untouched

    m2 = similarity.rebalance_ivf_cells(spark, path)
    # split executed: one new cell per hot cell, vectors conserved
    assert m2["n_cells"] == len(counts) + len(hot)
    assert m2["n_vectors"] == n + 3 * n
    assert m2["cell_skew"] < m["cell_skew"]
    # untouched cells byte-identical
    after = {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for c in counts if c not in hot
        for f in glob.glob(f"{path}/cells/cell={c}/*.parquet")
    }
    assert after == untouched
    # manifest counts still truth
    truth = {r["cell"]: r["n"] for r in
             spark.read.parquet(path + "/cells").groupBy("cell")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {int(k): v for k, v in m2["cell_counts"].items()} == truth
    # recall bar unchanged on the grown corpus
    allv = emb.select("vec_id", "embedding").unionByName(drift)
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in emb.filter(F.col("vec_id") < 3).collect()]
    out = similarity.ivf_topk_indexed(spark, path, queries, k=10, n_probe=6)

    def topk_ids(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return got

    exact = topk_ids(similarity.brute_force_topk(allv, queries, k=10))
    approx = topk_ids(out)
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_quantized_sidecar_and_query(spark, tmp_path):
    """int8-quantized IVF: build(quantize=True) writes a cells_q8/
    sidecar in lockstep with cells/; ivf_topk_quantized ranks on the
    codes and rescores EXACTLY — final scores for shared rows equal the
    full-precision path's, and recall@10 vs brute force holds the same
    0.8 bar. Append and rebalance keep the sidecar in sync."""
    import os
    import numpy as np
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfq")
    similarity.build_ivf_index(first, path, n_centroids=16, quantize=True)
    assert os.path.isdir(path + "/cells_q8")

    # sidecar mirrors cells/: same (vec_id, cell) membership, int8 range
    cells = spark.read.parquet(path + "/cells").select("vec_id", "cell")
    q8 = spark.read.parquet(path + "/cells_q8")
    assert q8.count() == cells.count()
    assert (q8.select("vec_id", "cell").exceptAll(cells).count() == 0)
    mn, mx = q8.select(
        F.min(F.array_min("q8")), F.max(F.array_max("q8"))).first()
    assert -127 <= mn and mx <= 127

    # append keeps the sidecar in sync
    similarity.append_to_ivf_index(spark, path, second)
    assert (spark.read.parquet(path + "/cells_q8").count()
            == spark.read.parquet(path + "/cells").count() == emb.count())

    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in emb.filter(F.col("vec_id") < 3).collect()]
    outq = similarity.ivf_topk_quantized(spark, path, queries, k=10,
                                         n_probe=12)
    outf = similarity.ivf_topk_indexed(spark, path, queries, k=10,
                                       n_probe=12)

    def topk(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], {})[r["vec_id"]] = r["score"]
        return got

    tq, tf = topk(outq), topk(outf)
    # exact rescore: any candidate both paths ranked carries the SAME score
    for qid in tf:
        for vid, s in tf[qid].items():
            if vid in tq.get(qid, {}):
                assert abs(tq[qid][vid] - s) < 1e-9
    exact = {}
    for r in similarity.brute_force_topk(emb, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & set(tq.get(q, {}))) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls

    # the quantized shortlist really reads the sidecar (the plan-string
    # check would truncate past maxPlanStringLength; inputFiles is exact)
    files = similarity.ivf_topk_quantized(
        spark, path, queries, k=5).inputFiles()
    assert any("cells_q8" in f for f in files), files[:5]


def test_ivf_quantized_rebalance_keeps_sidecar_synced(spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F
    from intent_classifier_service_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    path = str(tmp_path / "ivfq2")
    similarity.build_ivf_index(emb, path, n_centroids=8, quantize=True)
    # force a hot cell: 3n drifted vectors in TWO separable sub-clusters
    # around one corpus vector (same recipe as the rebalance test above)
    n = emb.count()
    base = np.array(emb.filter(F.col("vec_id") == 0).first()["embedding"],
                    dtype=np.float64)
    rng = np.random.RandomState(11)
    u = rng.normal(size=base.shape)
    u /= np.linalg.norm(u)
    bn = np.linalg.norm(base)
    clones = spark.createDataFrame(
        [(int(10_000 + i),
          [float(x) for x in
           base + (0.35 if i % 2 else -0.35) * bn * u
           + rng.normal(scale=0.01 * bn, size=base.shape)])
         for i in range(3 * n)],
        "vec_id long, embedding array<float>")
    m = similarity.append_to_ivf_index(spark, path, clones)
    assert m["rebalance_recommended"] is True
    m2 = similarity.rebalance_ivf_cells(spark, path)
    assert len(m2["cell_counts"]) > len(m["cell_counts"])
    # sidecar membership still mirrors cells/ exactly after the split
    cells = spark.read.parquet(path + "/cells").select("vec_id", "cell")
    q8 = spark.read.parquet(path + "/cells_q8").select("vec_id", "cell")
    assert q8.exceptAll(cells).count() == 0
    assert cells.exceptAll(q8).count() == 0
