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
