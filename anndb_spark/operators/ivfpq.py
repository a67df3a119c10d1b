"""IVFPQ: coarse IVF routing × residual product quantization.

The canonical billion-scale ANN layout (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — the IVFADC
system; popularized by Faiss): vectors are routed to a coarse k-means
cell and only the RESIDUAL (vector − cell centroid) is product-coded.
Per query, only ``nprobe`` cells are visited and scoring touches the
m-byte codes, never the floats — at 100 TB that composes the two big
levers this engine already has separately: partition pruning (IVF) and
scan-byte compression (PQ).

Spark shape (all pieces reused from `operators/ivf.py` / `pq.py`):

- ``build_ivfpq``   — train coarse centroids + residual codebooks from
                      bounded samples; one pass assigns cells, computes
                      residuals and encodes them; artifacts land under
                      ONE directory: ``centroids/`` (parquet),
                      ``books/`` (`pq.save_pq`, config header),
                      ``codes/cluster_id=*/`` (hive-partitioned codes).
- ``search_ivfpq``  — serving shape: queries route on the driver
                      against the tiny centroid matrix; the plan holds
                      one row per (probed cell, query chunk); each task
                      reads ONLY its cell's codes (worker-cached, keyed
                      by content fingerprint), builds the per-cell
                      residual LUTs (q − c), ADC-scores, and emits a
                      partial top-k; a Window merge finalizes ranks.
                      Unprobed cell directories never enter the plan.
                      Optional exact rerank against the float table via
                      broadcast join (the standard IVFADC+R shape).

Euclidean only (residual coding under cosine/IP requires a different
normalization contract); the flat `pq_search_batch` covers cosine/ip.

The reference has no PQ at all (float32 snapshots,
`/root/reference/index/hnsw_persistence.go:71-95`); this is a
north-star extension built on public algorithms.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anndb_spark.operators.pq import save_pq, load_pq, _kmeans


def build_ivfpq(
    vectors: DataFrame,
    path: str,
    n_cells: int = 32,
    m: int = 8,
    n_centroids: int = 256,
    id_col: str = "id",
    vec_col: str = "vector",
    sample_n: int = 50_000,
    seed: int = 42,
    mode: str = "overwrite",
) -> tuple[np.ndarray, np.ndarray]:
    """Train + encode + persist; returns (centroids, codebooks).

    One distributed pass over the table: assign cell (GEMM argmin
    against the broadcast centroid matrix), subtract the centroid,
    encode the residual — codes written hive-partitioned by cell so a
    search lists only probed directories."""
    from anndb_spark.operators.ivf import train_centroids

    spark = vectors.sparkSession
    cent = train_centroids(
        vectors, n_cells, vec_col=vec_col, sample_n=sample_n, seed=seed
    ).astype(np.float32)
    # residual codebooks: k-means per subspace over SAMPLED residuals
    total = vectors.count()
    frac = min(1.0, (sample_n * 1.2) / max(total, 1))
    pdf = (
        vectors.select(vec_col).sample(frac, seed=seed).limit(sample_n).toPandas()
    )
    smat = np.array(pdf[vec_col].tolist(), dtype=np.float32)
    dim = smat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    d2 = (
        np.einsum("ij,ij->i", smat, smat)[:, None]
        - 2.0 * smat @ cent.T
        + np.einsum("ij,ij->i", cent, cent)[None, :]
    )
    res = smat - cent[d2.argmin(axis=1)]
    k = min(n_centroids, res.shape[0])
    books = np.stack(
        [
            _kmeans(np.ascontiguousarray(res[:, j * sub : (j + 1) * sub]), k, seed + j)
            for j in range(m)
        ]
    )
    # persist the two small artifacts
    save_pq(spark, books, f"{path}/books", mode=mode)
    spark.createDataFrame(
        [(int(i), [float(x) for x in cent[i]]) for i in range(cent.shape[0])],
        "cluster_id INT, centroid ARRAY<FLOAT>",
    ).coalesce(1).write.mode(mode).parquet(f"{path}/centroids")
    # one pass: assign + residual-encode (no shuffle before the
    # partitioned write)
    (
        ivfpq_encode(vectors, cent, books, id_col=id_col, vec_col=vec_col)
        .write.mode(mode)
        .partitionBy("cluster_id")
        .parquet(f"{path}/codes")
    )
    return cent, books


def ivfpq_encode(
    vectors: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """→ (id, cluster_id, codes): assign the coarse cell and
    residual-encode, one Arrow pass, no shuffle.  Deterministic given
    (centroids, codebooks) — the streaming maintainer re-encodes
    micro-batches with the SAME artifacts, so appended codes are
    indistinguishable from build-time codes."""
    cent = np.ascontiguousarray(centroids, dtype=np.float32)
    books = np.ascontiguousarray(codebooks, dtype=np.float32)
    m, kc, sub = books.shape
    bn2 = np.einsum("mkd,mkd->mk", books, books, dtype=np.float32)
    cn2 = np.einsum("ij,ij->i", cent, cent, dtype=np.float32)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            X = np.array(b[vec_col].tolist(), dtype=np.float32)
            a = (cn2[None, :] - 2.0 * (X @ cent.T)).argmin(axis=1)
            R = X - cent[a]
            codes = np.empty((X.shape[0], m), dtype=np.int32)
            for j in range(m):
                Rs = R[:, j * sub : (j + 1) * sub]
                codes[:, j] = (
                    bn2[j][None, :] - 2.0 * (Rs @ books[j].T)
                ).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": b[id_col].astype(str),
                    "cluster_id": a.astype(np.int32),
                    "codes": list(codes.tolist()),
                }
            )

    return vectors.mapInPandas(
        enc, "id STRING, cluster_id INT, codes ARRAY<INT>"
    )


def load_ivfpq_meta(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) from a `build_ivfpq` directory — the
    serving-job reconstruction contract (small artifacts; the codes
    stay on storage until probed)."""
    books = load_pq(spark, f"{path}/books")
    pdf = spark.read.parquet(f"{path}/centroids").toPandas()
    pdf = pdf.sort_values("cluster_id")
    cent = np.array(pdf["centroid"].tolist(), dtype=np.float32)
    return cent, books


# worker-resident cell-codes cache (ids, codes matrix), byte-capped LRU
_CODES_CACHE: dict = {}
_CODES_CACHE_MAX = 64


def _codes_get(key):
    v = _CODES_CACHE.pop(key, None)
    if v is not None:
        _CODES_CACHE[key] = v
    return v


def _codes_put(key, ids, C):
    if key is None:
        return
    _CODES_CACHE[key] = (ids, C)
    while len(_CODES_CACHE) > _CODES_CACHE_MAX:
        _CODES_CACHE.pop(next(iter(_CODES_CACHE)))


def search_ivfpq(
    spark,
    path: str,
    queries: list[tuple[object, list[float]]] | tuple,
    k: int = 10,
    nprobe: int = 8,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
    cache_token: str | None = None,
    queries_per_task: int | None = None,
) -> DataFrame:
    """Serving-shape IVFADC top-k → (query_id, rank, id, score).

    Driver routes every query to its nprobe nearest cells; the plan is
    (cell, query-chunk) rows via shuffle-free ``parallelize``; each task
    reads only its cell's codes directory through ``pyarrow.fs``
    (worker-cached, content-fingerprint keyed) and scores its chunk
    with per-cell residual LUTs.  Scores are ADC approximations of the
    euclidean distance; with ``rerank_with`` the per-query shortlist
    (default 5·k) is re-scored exactly (IVFADC+R)."""
    from pyspark.sql import Window

    from anndb_spark.sources import fsutil

    if centroids is None or codebooks is None:
        centroids, codebooks = load_ivfpq_meta(spark, path)
    cent = np.ascontiguousarray(centroids, dtype=np.float32)
    books = np.ascontiguousarray(codebooks, dtype=np.float32)
    m, kc, sub = books.shape
    if isinstance(queries, tuple) and not isinstance(queries[0], str):
        qids_in, qmat = queries
        qid_arr = np.array([str(q) for q in qids_in], dtype=object)
        Q = np.ascontiguousarray(qmat, dtype=np.float32)
    else:
        qid_arr = np.array([str(qid) for qid, _ in queries], dtype=object)
        Q = np.array([v for _, v in queries], dtype=np.float32)
    npb = min(nprobe, cent.shape[0])
    d2 = (
        np.einsum("ij,ij->i", Q, Q)[:, None]
        - 2.0 * Q @ cent.T
        + np.einsum("ij,ij->i", cent, cent)[None, :]
    )
    probes = np.argpartition(d2, min(npb - 1, d2.shape[1] - 1), axis=1)[:, :npb]
    by_cid: dict[int, list[int]] = {}
    for qi, ps in enumerate(probes):
        for p in ps:
            by_cid.setdefault(int(p), []).append(qi)
    codes_root = f"{path}/codes"
    avail = set(fsutil.list_partition_values(codes_root, "cluster_id="))
    cids = sorted(set(by_cid) & avail)
    index_ver = (
        fsutil.index_fingerprint(codes_root) if cache_token is not None else None
    )
    top_n = k if rerank_with is None else max(shortlist or 5 * k, k)
    if queries_per_task is None:
        total = sum(len(by_cid[c]) for c in cids)
        par = spark.sparkContext.defaultParallelism
        target_tasks = max(len(cids), par // 2, 1)
        queries_per_task = max(64, -(-total // target_tasks))
    qpt = queries_per_task
    plan_rows = []
    for c in cids:
        n_chunks = max(1, -(-len(by_cid[c]) // qpt))
        plan_rows.extend((c, i) for i in range(n_chunks))
    plan = spark.createDataFrame(
        spark.sparkContext.parallelize(
            plan_rows or [(-1, 0)], max(len(plan_rows), 1)
        ),
        "cid INT, chunk INT",
    )
    bq = spark.sparkContext.broadcast((qid_arr, Q, by_cid))
    bn2 = np.einsum("mkd,mkd->mk", books, books, dtype=np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from anndb_spark.sources import fsutil as _fsu

        qid_arr, Qv, by_cid = bq.value
        work = [
            (cid, chunk)
            for b in batches
            for cid, chunk in zip(b["cid"].tolist(), b["chunk"].tolist())
        ]
        for cid, chunk in work:
            if cid < 0:
                continue
            qsel = by_cid.get(int(cid), [])[chunk * qpt : (chunk + 1) * qpt]
            if not qsel:
                continue
            key = (
                (cache_token, index_ver, int(cid))
                if cache_token is not None
                else None
            )
            hit = _codes_get(key)
            if hit is not None:
                ids, C = hit
            else:
                tbl = _fsu.read_parquet_dir(
                    _fsu.join(codes_root, f"cluster_id={cid}"),
                    columns=["id", "codes"],
                ).to_pandas()
                ids = tbl["id"].to_numpy()
                C = np.array(tbl["codes"].tolist(), dtype=np.int64)
                _codes_put(key, ids, C)
            if not len(ids):
                continue
            # per-cell residual LUTs for this chunk's queries:
            # LUT[q, j, c] = ||(Q[q]−cell)_j − book_j[c]||²
            Rq = Qv[qsel] - cent[cid][None, :]
            nq = Rq.shape[0]
            lut = np.empty((nq, m, kc), dtype=np.float32)
            for j in range(m):
                Rs = Rq[:, j * sub : (j + 1) * sub]
                qn2 = np.einsum("ij,ij->i", Rs, Rs, dtype=np.float32)
                lut[:, j, :] = (
                    bn2[j][None, :] - 2.0 * (Rs @ books[j].T) + qn2[:, None]
                )
            S = np.zeros((nq, C.shape[0]), dtype=np.float32)
            for j in range(m):
                S += lut[:, j, :][:, C[:, j]]
            S = np.sqrt(np.maximum(S, 0.0))
            t = min(top_n, C.shape[0])
            part = (
                np.argpartition(S, t - 1, axis=1)[:, :t]
                if C.shape[0] > t
                else np.tile(np.arange(C.shape[0]), (nq, 1))
            )
            rows_q = np.repeat(np.arange(nq), part.shape[1])
            cols = part.reshape(-1)
            yield pd.DataFrame(
                {
                    "query_id": qid_arr[np.asarray(qsel)][rows_q],
                    "id": ids[cols],
                    "score": S[rows_q, cols],
                }
            )

    partial = plan.mapInPandas(run, "query_id STRING, id STRING, score FLOAT")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("id").asc()
    )
    cand = partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    if rerank_with is None:
        return cand.filter(F.col("rank") <= k).select(
            "query_id", "rank", "id", "score"
        )
    from anndb_spark.functions.spaces import distance_col

    qdf = spark.createDataFrame(
        [(str(q), [float(x) for x in v]) for q, v in zip(qid_arr, Q)],
        "query_id STRING, qvec ARRAY<FLOAT>",
    )
    exact = (
        rerank_with.withColumn("id", F.col("id").cast("string"))
        .join(F.broadcast(cand.select("query_id", "id")), "id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "id",
            distance_col(F.col("vector"), F.col("qvec")).cast("float").alias(
                "score"
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "score")
    )
