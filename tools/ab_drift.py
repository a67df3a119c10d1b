"""Same-boot A/B harness for the r6->r7 drifted bench legs
(hnsw_search_1kq +52%, hnsw_search_1kq_beam +31%, fm_search_1kq_routed
+20% per VERDICT r7 #2).

Runs ONLY those legs with bench.py's exact setup against an arbitrary
code tree, so two trees can be timed back-to-back on one boot and
compared in ratio (the drift-audit method in PLANS.md — absolute
wall-clock on this VM drifts 2x run-to-run with zero code change).

Usage: python tools/ab_drift.py <code_tree> [label]
Prints one JSON line: {"label": ..., "legs": {name: [times...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

tree = os.path.abspath(sys.argv[1])
label = sys.argv[2] if len(sys.argv) > 2 else tree
sys.path.insert(0, tree)

import numpy as np  # noqa: E402

REPEATS = 5


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from anndb_spark.session import get_spark

    spark = get_spark("ab-drift", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="ab_drift_")
    legs: dict[str, list[float]] = {}
    only = set(
        x for x in os.environ.get("AB_LEGS", "").split(",") if x.strip()
    )

    def want(name: str) -> bool:
        return not only or name in only

    def timed(name, fn, repeats=REPEATS):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        legs[name] = ts

    # --- scatter legs: identical setup to bench.py q3/q4 ---
    if want("hnsw_search_1kq") or want("hnsw_search_1kq_beam"):
        _scatter_legs(spark, sf_dir, cpus, scratch, timed, want)
    if want("fm_search_1kq_routed"):
        _routed_leg(spark, cpus, scratch, timed)

    print(json.dumps({"label": label, "tree": tree, "legs": legs}))
    spark.stop()


def _scatter_legs(spark, sf_dir, cpus, scratch, timed, want):
    from pyspark.sql import functions as F
    from anndb_spark.operators.hnsw import (
        HnswConfig,
        build_index,
        save_index,
        search_index_path,
    )
    from anndb_spark.sources.tables import lineitem_vec

    vecs = lineitem_vec(spark, sf_dir).select("id", "vector").repartition(cpus).cache()
    vecs.count()
    sample = (
        vecs.limit(100_000)
        .dropDuplicates(["id"])
        .withColumn("partition_id", F.pmod(F.xxhash64("id"), F.lit(cpus)).cast("int"))
        .cache()
    )
    sample.count()
    cfg = HnswConfig(m=16, ef_construction=100)
    idx_path = os.path.join(scratch, "idx_100k")
    save_index(build_index(sample, cfg), idx_path)
    rng = np.random.default_rng(42)
    queries = [(str(i), rng.normal(0, 30, 8).tolist()) for i in range(1000)]
    search_index_path(  # warm
        spark, idx_path, queries, 10, ef=50, config=cfg, cache_token="bench-flat"
    ).collect()
    timed(
        "hnsw_search_1kq",
        lambda: search_index_path(
            spark, idx_path, queries, 10, ef=50, config=cfg, cache_token="bench-flat"
        ).collect(),
    )
    timed(
        "hnsw_search_1kq_beam",
        lambda: search_index_path(
            spark, idx_path, queries, 10, ef=50, config=cfg, strategy="beam",
            cache_token="bench-flat",
        ).collect(),
    )


def _routed_leg(spark, cpus, scratch, timed):
    import bench
    from anndb_spark.operators.hnsw import (
        HnswConfig,
        build_index,
        save_index,
        search_index_path,
    )
    from anndb_spark.operators.ivf import assign_clusters, train_centroids

    # --- fm routed leg: bench.py q13b at the r6/r7 headline nprobe=2 ---
    fm = bench.fm_table(spark, cpus).cache()
    fm.count()
    cfg_fm = HnswConfig(m=16, ef_construction=500, heuristic=True, heuristic_pool=64)
    qs_fm = bench.fm_queries()
    cent_fm = train_centroids(fm, 32, sample_n=30_000)
    fm_routed_path = os.path.join(scratch, "idx_fm_routed")
    save_index(
        build_index(
            assign_clusters(fm.select("id", "vector"), cent_fm),
            cfg_fm,
            partition_col="cluster_id",
        ),
        fm_routed_path,
    )
    search_index_path(  # warm
        spark, fm_routed_path, qs_fm, 10, centroids=cent_fm, nprobe=2,
        ef=20, config=cfg_fm, strategy="beam", cache_token="bench-fm-r",
    ).collect()
    timed(
        "fm_search_1kq_routed",
        lambda: search_index_path(
            spark, fm_routed_path, qs_fm, 10, centroids=cent_fm, nprobe=2,
            ef=20, config=cfg_fm, strategy="beam", cache_token="bench-fm-r",
        ).collect(),
    )


if __name__ == "__main__":
    main()
