"""Product quantization: train/encode/ADC-search."""

import numpy as np
from pyspark.sql import functions as F

from anndb_spark.operators.pq import pq_encode, pq_search, train_pq


def _clustered(spark, n=800, dim=32, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (10, dim)).astype(np.float32)
    mat = centers[np.arange(n) % 10] + rng.normal(0, 0.1, (n, dim)).astype(
        np.float32
    )
    rows = [(f"v{i}", mat[i].astype(float).tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id string, vector array<float>"),
        mat,
    )


def test_pq_encode_shape_and_determinism(spark):
    df, mat = _clustered(spark)
    books = train_pq(df, m=4, n_centroids=16, sample_n=800)
    assert books.shape == (4, 16, 8)
    enc1 = {r["id"]: r["codes"] for r in pq_encode(df, books).collect()}
    enc2 = {r["id"]: r["codes"] for r in pq_encode(df, books).collect()}
    assert enc1 == enc2
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c) for c in enc1.values())


def test_pq_adc_recall_vs_exact(spark):
    df, mat = _clustered(spark, n=1000)
    books = train_pq(df, m=8, n_centroids=64, sample_n=1000)
    codes = pq_encode(df, books).cache()
    rng = np.random.default_rng(9)
    hits = hits_rr = 0
    for t in range(5):
        q = mat[rng.integers(1000)] + rng.normal(0, 0.05, 32).astype(np.float32)
        got = [r["id"] for r in pq_search(codes, q, books, k=10).collect()]
        got_rr = [
            r["id"]
            for r in pq_search(
                codes, q, books, k=10, rerank_with=df, shortlist=60
            ).collect()
        ]
        d = np.linalg.norm(mat - q, axis=1)
        truth = {f"v{i}" for i in np.argsort(d)[:10]}
        hits += len(truth & set(got))
        hits_rr += len(truth & set(got_rr))
    # raw ADC blurs intra-cluster ranks (expected); coarse retrieval only
    assert hits / 50 >= 0.25, hits / 50
    # shortlist + exact rerank restores fine ranking
    assert hits_rr / 50 >= 0.9, hits_rr / 50


def test_pq_compression_ratio():
    # 32-d float32 -> 8 bytes of codes: 16x
    assert (32 * 4) / 8 == 16.0
