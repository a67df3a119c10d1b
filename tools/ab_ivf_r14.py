"""Same-boot interleaved A/B for the r14 search_ivf restructure
(route-once checkpoint + driver IN-list prune vs the r13 form that
re-derived route_queries under two consumers and pruned with a
broadcast semi-join).  Reproduces the bench knn_join_ivf_2k leg shape
exactly and asserts both forms return identical rows."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from anndb_spark.session import get_spark


def search_ivf_old(vectors, queries, k, centroids, nprobe=8,
                   space="euclidean"):
    """The pre-r14 search_ivf body (route re-derived under both
    consumers, broadcast semi-join prune) — copied verbatim minus the
    assign-on-the-fly branch (the bench leg passes assigned vectors)."""
    from anndb_spark.operators.ivf import route_queries

    import pandas as pd
    from anndb_spark.operators.ivf import _argpart_rows, _as_matrix, _pairwise

    cluster_col, id_col, vec_col = "cluster_id", "id", "vector"
    query_id_col, query_vec_col = "query_id", "query_vector"
    if cluster_col not in vectors.columns:
        from anndb_spark.operators.ivf import assign_clusters

        vectors = assign_clusters(vectors, centroids, space, vec_col,
                                  cluster_col)
    routed = route_queries(queries, centroids, nprobe, space, query_vec_col)
    probed = routed.select(cluster_col).distinct()
    vsrc = vectors.join(
        F.broadcast(probed), on=cluster_col, how="left_semi"
    ).select(
        F.col(cluster_col),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vector"),
    )
    qsrc = routed.select(
        F.col(cluster_col),
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("query_vector"),
    )

    def score_cluster(vec_pdf, q_pdf):
        out_cols = ["query_id", "id", "score"]
        if not len(vec_pdf) or not len(q_pdf):
            return pd.DataFrame(columns=out_cols)
        vmat = _as_matrix(vec_pdf["vector"])
        qmat = _as_matrix(q_pdf["query_vector"])
        d = _pairwise(qmat, vmat, space)
        kk = min(k, vmat.shape[0])
        part = _argpart_rows(d, kk)
        sel = part.reshape(-1)
        ids = vec_pdf["id"].to_numpy()
        qids = q_pdf["query_id"].to_numpy()
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk),
                "id": ids[sel],
                "score": np.take_along_axis(d, part, axis=1).reshape(-1),
            },
            columns=out_cols,
        )

    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = vectors.schema[id_col].dataType.simpleString()
    partial = (
        vsrc.groupBy(cluster_col)
        .cogroup(qsrc.groupBy(cluster_col))
        .applyInPandas(
            score_cluster,
            schema=f"query_id {qid_type}, id {id_type}, score double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "score")
    )


def knn_join_ivf_old(left, right, k, centroids, nprobe):
    inner_k = k + 1
    res = search_ivf_old(
        right.select(F.col("id"), F.col("vector")),
        left.select(
            F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
        ),
        inner_k, centroids, nprobe=nprobe,
    ).select(
        F.col("query_id").alias("left_id"),
        F.col("id").alias("right_id"),
        F.col("score"),
    )
    res = res.filter(F.col("left_id") != F.col("right_id"))
    w = Window.partitionBy("left_id").orderBy(
        F.col("score").asc(), F.col("right_id").asc()
    )
    return (
        res.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("left_id", "rank", "right_id", "score")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark("ab-ivf-r14", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from anndb_spark.operators.ivf import assign_clusters, train_centroids
    from anndb_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).cache()
    emb.count()
    cent = train_centroids(emb, 32, sample_n=50_000)
    assigned = assign_clusters(emb, cent).cache()
    assigned.count()
    join_left = emb.limit(2000)

    def new():
        return knn_join(
            join_left, assigned, 5, mode="ivf", centroids=cent, nprobe=4,
            exclude_self=True,
        ).collect()

    def old():
        return knn_join_ivf_old(join_left, assigned, 5, cent, 4).collect()

    # parity first
    a = sorted(map(tuple, old()))
    b = sorted(map(tuple, new()))
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows"
    print(f"parity OK: {len(a)} identical rows")

    t_old, t_new = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"old rep {i}")
        t0 = time.perf_counter(); old(); t_old.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"new rep {i}")
        t0 = time.perf_counter(); new(); t_new.append(time.perf_counter() - t0)
    print("old:", [round(t, 3) for t in t_old], "median",
          round(float(np.median(t_old)), 3))
    print("new:", [round(t, 3) for t in t_new], "median",
          round(float(np.median(t_new)), 3))
    spark.stop()


if __name__ == "__main__":
    main()
