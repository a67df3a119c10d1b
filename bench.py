"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...rates...}}

Comparable baseline numbers (BASELINE.md): single-node HNSW build
inserts/s and search q/s at M=16; we report the analogous rates in
"extra" alongside wall-clock seconds per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from anndb_spark.session import get_spark

    spark = get_spark("anndb-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from anndb_spark.operators.hnsw import HnswConfig, build_index, search_index
    from anndb_spark.operators.knn import knn_exact, knn_search
    from anndb_spark.sources.tables import lineitem_vec

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # warm the JVM, parquet footers, codegen, and the Arrow/pandas-UDF
    # worker pool so the first timed query measures the kernel
    warm = lineitem_vec(spark, sf_dir).limit(1000).select("id", "vector")
    knn_exact(warm, entry._queries_df(spark, entry.LINEITEM_QUERIES[:1]), 5).collect()

    # repartition to core count: locally the small parquet yields ~3 scan
    # splits, but at target scale the scan itself provides this
    # parallelism — the bench should measure the kernels, not the
    # single-file artifact.
    vecs = lineitem_vec(spark, sf_dir).select("id", "vector").repartition(cpus).cache()
    n_vec = vecs.count()

    # q1: exact kNN, 3 broadcast queries over the full vector table
    qdf = entry._queries_df(spark, entry.LINEITEM_QUERIES)
    timed("knn_exact_multi", lambda: knn_exact(vecs, qdf, 10).collect())

    # q2: single-query TakeOrderedAndProject path
    timed("knn_single", lambda: knn_search(vecs, entry.LINEITEM_QUERIES[0][1], 10).collect())

    # q3: HNSW build over a 100k-row routed sample (per-partition graphs)
    sample = (
        vecs.limit(100_000)
        .dropDuplicates(["id"])  # index ids must be unique (UUID analogue)
        .withColumn("partition_id", F.pmod(F.xxhash64("id"), F.lit(cpus)).cast("int"))
        .cache()
    )
    sample_n = sample.count()
    cfg = HnswConfig(m=16, ef_construction=100)
    idx = build_index(sample, cfg).cache()
    n_edges = timed("hnsw_build_100k", lambda: idx.count())
    extra["hnsw_build_inserts_per_s"] = round(sample_n / timings["hnsw_build_100k"], 1)

    # q4: ANN search, 1000 queries over the materialized index (batch
    # size amortizes the fixed job/cogroup overhead so q/s reflects the
    # kernel). auto = strategy router (brute GEMM at this partition
    # size); beam = forced HNSW graph walk (the large-partition path).
    rng = np.random.default_rng(42)
    queries = [(str(i), rng.normal(0, 30, 8).tolist()) for i in range(1000)]
    timed(
        "hnsw_search_1kq",
        lambda: search_index(idx, sample, queries, 10, ef=50, config=cfg).collect(),
    )
    timed(
        "hnsw_search_1kq_beam",
        lambda: search_index(
            idx, sample, queries, 10, ef=50, config=cfg, strategy="beam"
        ).collect(),
    )
    extra["hnsw_search_q_per_s"] = round(1000 / timings["hnsw_search_1kq"], 1)
    extra["hnsw_search_q_per_s_beam"] = round(1000 / timings["hnsw_search_1kq_beam"], 1)
    extra["hnsw_index_rows"] = n_edges
    # the reference benchmark searches ONE graph per query
    # (cmd/benchmark/ann-benchmark); our scatter hits every graph
    # partition per query, so per-partition-search rate is the
    # apples-to-apples number
    extra["hnsw_partition_searches_per_s_beam"] = round(
        1000 * cpus / timings["hnsw_search_1kq_beam"], 1
    )
    extra["baseline_build_inserts_per_s_m16"] = 3382.0
    extra["baseline_search_q_per_s_m16"] = 26112.0

    # q4b: cluster-routed IVF×HNSW — the 100 TB search shape: the index
    # is partitioned by coarse k-means cell and each query walks only
    # nprobe=4 of 32 graphs (plus worker-cached reconstruction),
    # instead of the flat scatter's one-walk-per-partition
    from anndb_spark.operators.hnsw import search_index_routed
    from anndb_spark.operators.ivf import assign_clusters, train_centroids

    cent_r = train_centroids(sample, 32, sample_n=50_000)
    assigned_r = assign_clusters(sample.select("id", "vector"), cent_r)
    idx_r = build_index(assigned_r, cfg, partition_col="cluster_id").cache()
    idx_r.count()
    # warm pass primes the per-worker graph cache (serving shape)
    search_index_routed(
        idx_r, queries[:8], 10, cent_r, nprobe=4, ef=50, config=cfg,
        cache_token="bench", strategy="beam",
    ).collect()
    timed(
        "hnsw_search_1kq_routed",
        lambda: search_index_routed(
            idx_r, queries, 10, cent_r, nprobe=4, ef=50, config=cfg,
            cache_token="bench", strategy="beam",
        ).collect(),
    )
    extra["hnsw_search_q_per_s_routed"] = round(
        1000 / timings["hnsw_search_1kq_routed"], 1
    )

    # q5: CRUD changelog compaction (full sf changelog)
    from anndb_spark.operators.crud import apply_changes_sql, split_state

    timed(
        "crud_compaction",
        lambda: split_state(apply_changes_sql(None, entry._crud_changelog(spark, sf_dir))).count(),
    )

    # q6-8: relational set
    timed("tpch_q1ish", lambda: entry._tpch_q1ish(spark, sf_dir).collect())
    timed("top_orders_per_nation", lambda: entry._top_orders_per_nation(spark, sf_dir).collect())
    timed("events_hourly", lambda: entry._events_hourly(spark, sf_dir).collect())

    # q9: embeddings exact kNN (64-d)
    emb_q = entry._queries_df(spark, entry.EMBEDDING_QUERIES)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).cache()
    n_emb = emb.count()
    timed("knn_embeddings", lambda: knn_exact(emb, emb_q, 10).collect())

    # q10: IVF scale path over embeddings — train coarse quantizer,
    # assign clusters, then a 200-query batch probing 4 of 32 clusters
    # (scans ~1/8 of the table per query vs exact kNN's full scan)
    from anndb_spark.operators.ivf import assign_clusters, search_ivf, train_centroids

    def ivf_setup():
        cent = train_centroids(emb, 32, sample_n=50_000)
        assigned = assign_clusters(emb, cent).cache()
        assigned.count()
        return cent, assigned

    cent, assigned = timed("ivf_train_assign", ivf_setup)
    rng2 = np.random.default_rng(7)
    ivf_q = spark.createDataFrame(
        [(i, rng2.normal(0, 1, 64).tolist()) for i in range(200)],
        "query_id INT, query_vector ARRAY<DOUBLE>",
    )
    timed(
        "ivf_search_200q",
        lambda: search_ivf(assigned, ivf_q, 10, cent, nprobe=4).collect(),
    )
    extra["ivf_search_q_per_s"] = round(200 / timings["ivf_search_200q"], 1)
    extra["ivf_rows_indexed"] = n_emb

    # q11: top-k similarity join — every embedding finds its 5 nearest
    # others via IVF routing (the scale path; exact would be |N|² scores)
    from anndb_spark.operators.knn import knn_join

    join_left = emb.limit(2000)
    timed(
        "knn_join_ivf_2k",
        lambda: knn_join(
            join_left, assigned, 5, mode="ivf", centroids=cent, nprobe=4,
            exclude_self=True,
        ).collect(),
    )
    extra["knn_join_rows_per_s"] = round(2000 / timings["knn_join_ivf_2k"], 1)

    # q11b: the same join EXACT via the BLAS gemm kernel — all |L|·|R|
    # scores, one GEMM per Arrow batch (the HOF expression path is
    # interpreted; gemm measured 33× faster on this shape)
    timed(
        "knn_join_gemm_2k",
        lambda: knn_join(join_left, emb, 5, mode="gemm", exclude_self=True).collect(),
    )
    extra["knn_join_gemm_rows_per_s"] = round(2000 / timings["knn_join_gemm_2k"], 1)

    # q12: MinHash-LSH near-dup candidate pairs over documents
    timed(
        "dedup_minhash_pairs",
        lambda: entry._dedup_minhash_pairs(spark, sf_dir).collect(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "anndb_spark_headline_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
