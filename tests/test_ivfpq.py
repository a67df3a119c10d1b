"""IVFPQ (coarse routing × residual product codes) — build artifacts,
new-session reload, recall vs exact, full-probe behavior, cache reuse."""

import numpy as np
import pytest

from anndb_spark.operators.ivfpq import (
    build_ivfpq,
    load_ivfpq_meta,
    search_ivfpq,
)


def _clustered(spark, n=1200, dim=32, n_centers=8, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_centers, dim)).astype(np.float32)
    mat = centers[np.arange(n) % n_centers] + rng.normal(
        0, 0.08, (n, dim)
    ).astype(np.float32)
    rows = [(f"v{i}", mat[i].astype(float).tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id string, vector array<float>"),
        mat,
    )


@pytest.fixture(scope="module")
def ivfpq_built(spark, tmp_path_factory):
    df, mat = _clustered(spark)
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    cent, books = build_ivfpq(
        df, path, n_cells=8, m=4, n_centroids=32, sample_n=1200
    )
    return df, mat, path, cent, books


def test_ivfpq_artifacts_reload(spark, ivfpq_built):
    _, _, path, cent, books = ivfpq_built
    cent2, books2 = load_ivfpq_meta(spark, path)
    assert np.array_equal(cent, cent2)
    assert np.array_equal(books, books2)


def test_ivfpq_recall_with_rerank(spark, ivfpq_built):
    df, mat, path, cent, books = ivfpq_built
    rng = np.random.default_rng(9)
    qs = [
        (
            f"q{t}",
            (mat[rng.integers(len(mat))] + rng.normal(0, 0.03, 32).astype(np.float32))
            .astype(float)
            .tolist(),
        )
        for t in range(6)
    ]
    rows = search_ivfpq(
        spark, path, qs, k=10, nprobe=3, rerank_with=df, shortlist=60
    ).collect()
    hits = 0
    for qid, vec in qs:
        got = {r["id"] for r in rows if r["query_id"] == qid}
        assert len(got) == 10
        d = np.linalg.norm(mat - np.asarray(vec, dtype=np.float32), axis=1)
        truth = {f"v{i}" for i in np.argsort(d)[:10]}
        hits += len(truth & got)
    assert hits / 60 >= 0.9, hits / 60


def test_ivfpq_full_probe_contains_adc_truth(spark, ivfpq_built):
    """nprobe = n_cells visits every cell: the ADC top-k (no rerank)
    must then equal a brute ADC scan computed in NumPy."""
    df, mat, path, cent, books = ivfpq_built
    rng = np.random.default_rng(3)
    q = mat[17] + rng.normal(0, 0.02, 32).astype(np.float32)
    got = [
        (r["id"], r["score"])
        for r in search_ivfpq(
            spark, path, [("q0", q.astype(float).tolist())], k=5, nprobe=8
        ).collect()
    ]
    # NumPy oracle: assign + residual-encode every row, ADC with q
    m, kc, sub = books.shape
    d2 = (
        np.einsum("ij,ij->i", mat, mat)[:, None]
        - 2.0 * mat @ cent.T
        + np.einsum("ij,ij->i", cent, cent)[None, :]
    )
    a = d2.argmin(axis=1)
    R = mat - cent[a]
    codes = np.empty((len(mat), m), dtype=np.int64)
    for j in range(m):
        Rs = R[:, j * sub : (j + 1) * sub]
        codes[:, j] = (
            np.einsum("kd,kd->k", books[j], books[j])[None, :]
            - 2.0 * Rs @ books[j].T
        ).argmin(axis=1)
    s = np.zeros(len(mat), dtype=np.float32)
    for j in range(m):
        Rq = (q - cent[a])[:, j * sub : (j + 1) * sub]
        diff = Rq - books[j][codes[:, j]]
        s += np.einsum("ij,ij->i", diff, diff, dtype=np.float32)
    s = np.sqrt(np.maximum(s, 0.0))
    order = np.lexsort((np.arange(len(mat)), s))[:5]
    want = [f"v{i}" for i in order]
    assert [i for i, _ in got] == want, (got, want)


def test_ivfpq_cache_token_reuse(spark, ivfpq_built):
    """Warm searches with a cache token return identical results (the
    worker-resident codes cache serves the cell matrices)."""
    df, mat, path, cent, books = ivfpq_built
    q = [("q0", mat[3].astype(float).tolist())]
    a = search_ivfpq(spark, path, q, k=5, nprobe=3, cache_token="t").collect()
    b = search_ivfpq(spark, path, q, k=5, nprobe=3, cache_token="t").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
