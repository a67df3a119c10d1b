"""Product quantization: trained vector compression + ADC search.

At 100 TB, float32 embeddings dominate storage and scan cost.  Product
quantization splits each vector into ``m`` subspaces and replaces every
subvector with the id of its nearest trained centroid: a 768-d float32
vector (3 KB) becomes ``m`` bytes (e.g. 16) at ~10-30× less scan I/O
than even SQ8, and search runs over the CODES with one lookup-table add
per subspace (ADC — asymmetric distance computation), never touching
the original floats.

Spark shape:
- ``train_pq``      — bounded driver-side sample, per-subspace k-means
                      (seeded, deterministic); codebooks are a small
                      ndarray that BROADCASTS to every task.
- ``pq_encode``     — one Arrow-batched ``mapInPandas`` pass; each task
                      encodes its rows with GEMM argmin against the
                      broadcast codebooks.  No shuffle.
- ``pq_search``     — per-partition ADC scan (LUT build is q·m·k_c
                      flops ONCE per task, scoring is one ``np.take``
                      sum per subspace), map-side partial top-k, global
                      top-k merge — the same partial/final shape as the
                      exact kNN operator.

The reference stores raw float32 vectors only (its snapshot format,
index/hnsw_persistence.go:71-95) — PQ is a north-star extension; the
row-wise SQ8 codec (functions/quantize.py) and the serving-side
per-dimension SQ (operators/hnsw.HnswGraph.quantize) are its cheaper
untrained cousins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kmeans(mat: np.ndarray, k: int, seed: int, iters: int = 15) -> np.ndarray:
    """Seeded k-means++ over a (n, d) float32 sample (driver-side).
    Seeding keeps a running nearest-centroid distance array (one einsum
    per added centroid — O(nk) total)."""
    rng = np.random.default_rng(seed)
    n = mat.shape[0]
    cents = [mat[int(rng.integers(n))]]
    diff = mat - cents[0]
    d2 = np.einsum("ij,ij->i", diff, diff)
    for _ in range(k - 1):
        s = d2.sum()
        p = d2 / s if s > 0 else None
        cents.append(mat[int(rng.choice(n, p=p))])
        diff = mat - cents[-1]
        d2 = np.minimum(d2, np.einsum("ij,ij->i", diff, diff))
    C = np.stack(cents).astype(np.float32)
    for _ in range(iters):
        dots = mat @ C.T
        n2c = np.einsum("ij,ij->i", C, C, dtype=np.float32)
        assign = (n2c[None, :] - 2.0 * dots).argmin(axis=1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                C[j] = mat[sel].mean(axis=0)
    return C


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    n_centroids: int = 256,
    vec_col: str = "vector",
    sample_n: int = 50_000,
    seed: int = 42,
) -> np.ndarray:
    """(m, n_centroids, dim/m) float32 codebooks from a bounded sample."""
    total = vectors.count()
    frac = min(1.0, (sample_n * 1.2) / max(total, 1))
    pdf = vectors.select(vec_col).sample(frac, seed=seed).limit(sample_n).toPandas()
    mat = np.array(pdf[vec_col].tolist(), dtype=np.float32)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    k = min(n_centroids, mat.shape[0])
    books = np.stack(
        [
            _kmeans(
                np.ascontiguousarray(mat[:, j * sub : (j + 1) * sub]),
                k,
                seed + j,
            )
            for j in range(m)
        ]
    )
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """→ (id, codes array<int>): nearest-centroid id per subspace.
    One Arrow pass, GEMM argmin per subspace, no shuffle."""
    m, k, sub = codebooks.shape
    books = np.ascontiguousarray(codebooks, dtype=np.float32)
    bn2 = np.einsum("mkd,mkd->mk", books, books, dtype=np.float32)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            X = np.array(b[vec_col].tolist(), dtype=np.float32)
            codes = np.empty((X.shape[0], m), dtype=np.int32)
            for j in range(m):
                Xs = X[:, j * sub : (j + 1) * sub]
                dots = Xs @ books[j].T
                codes[:, j] = (bn2[j][None, :] - 2.0 * dots).argmin(axis=1)
            yield pd.DataFrame(
                {"id": b[id_col].astype(str), "codes": list(codes.tolist())}
            )

    return vectors.mapInPandas(enc, "id STRING, codes ARRAY<INT>")


def pq_search(
    codes: DataFrame,
    query: list[float] | np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "id",
    codes_col: str = "codes",
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """ADC top-k over a codes table: per-task LUT + np.take scoring +
    partial top-k, then a global top-k merge (one tiny shuffle).

    PQ distances are coarse (subspace centroids blur intra-cluster
    ranks — the standard PQ contract); pass ``rerank_with`` (the
    original vectors table) to re-score an ADC shortlist
    (default 5·k) with exact distances — the classic
    shortlist-then-rerank shape: the 3 KB/row float column is read for
    only ``shortlist`` rows per query instead of the whole table."""
    m, kc, sub = codebooks.shape
    books = np.ascontiguousarray(codebooks, dtype=np.float32)
    q = np.asarray(query, dtype=np.float32)
    # LUT[j, c] = ||q_j - book[j][c]||² — built once, shipped in closure
    lut = np.stack(
        [
            np.einsum(
                "kd,kd->k",
                books[j] - q[j * sub : (j + 1) * sub],
                books[j] - q[j * sub : (j + 1) * sub],
                dtype=np.float32,
            )
            for j in range(m)
        ]
    )

    top_n = k if rerank_with is None else max(shortlist or 5 * k, k)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # drain-then-yield: interleaved yield kills the python worker
        # (see hnsw.search_index_path)
        pdfs = [b for b in batches if len(b)]
        for b in pdfs:
            C = np.array(b[codes_col].tolist(), dtype=np.int64)  # (n, m)
            s = np.zeros(C.shape[0], dtype=np.float32)
            for j in range(m):
                s += lut[j][C[:, j]]
            top = np.argsort(s, kind="stable")[:top_n]
            yield pd.DataFrame(
                {
                    "id": b[id_col].iloc[top].astype(str),
                    "score": np.sqrt(np.maximum(s[top], 0.0)),
                }
            )

    partial = codes.mapInPandas(score, "id STRING, score FLOAT")
    cand = partial.orderBy(F.col("score").asc(), F.col("id").asc()).limit(top_n)
    if rerank_with is None:
        return cand.limit(k)
    # exact rerank of the shortlist: broadcast-join the (tiny) candidate
    # id set against the vectors table, score with the exact distance
    # column expression, final top-k
    from anndb_spark.functions.spaces import distance_col

    qlit = F.array(*[F.lit(float(x)) for x in np.asarray(query, dtype=np.float32)])
    exact = (
        rerank_with.withColumn("id", F.col("id").cast("string"))
        .join(F.broadcast(cand.select("id")), "id")
        .select(
            "id",
            distance_col(F.col("vector"), qlit).cast("float").alias("score"),
        )
    )
    return exact.orderBy(F.col("score").asc(), F.col("id").asc()).limit(k)
