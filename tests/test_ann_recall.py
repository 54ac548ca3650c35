"""ANN quality: LSH and IVF top-k recall vs brute force on the real
embeddings table — the approximate paths must actually approximate."""

import pytest
from pyspark.sql import functions as F

from intent_classifier_service_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]


def _topk_ids(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_lsh_recall_vs_brute_force(spark, emb, queries):
    exact = _topk_ids(similarity.brute_force_topk(emb, queries, k=10))
    # 16 bands of 4 bits: measured recall@10 = 0.967 on this table
    # (32/16 and 16/8 reach 1.0 but with near-full candidate sets;
    # 4-bit bands keep the candidate fraction meaningful)
    approx = _topk_ids(similarity.lsh_topk(emb, queries, k=10, n_bits=64, bands=16))
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_lsh_topk_guarantees_k_rows(spark, emb):
    """The top-k CONTRACT: exactly n_queries × k rows even when a
    query's band buckets hold < k candidates (the driver contract's
    default params returned 19/20 rows in round 2) — shortfall queries
    fall back to exact brute-force top-k."""
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 2).collect()
    ]
    # default n_bits=32/bands=4 — the sparse-bucket configuration that
    # exhibited the shortfall
    out = similarity.lsh_topk(emb, qs, k=10)
    per_q = {r["query_id"]: 0 for r in out.collect()}
    for r in out.collect():
        per_q[r["query_id"]] += 1
    assert sum(per_q.values()) == len(qs) * 10, per_q
    assert all(v == 10 for v in per_q.values()), per_q


def test_ivf_recall_vs_brute_force(spark, emb, queries):
    exact = _topk_ids(similarity.brute_force_topk(emb, queries, k=10))
    # even with spherical-k-means centroids, near-isotropic synthetic
    # vectors have no cluster structure — neighbors scatter across
    # cells, so wide probing is required; measured 0.9 at 16/12
    approx = _topk_ids(similarity.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=12))
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
