"""Routed (IVF×HNSW) vs flat single-graph serving: crossover analysis
(VERDICT r7 task 7 — on this host the routed path's 1k-query leg reads
slower than the flat resident graph; quantify WHERE routing wins).

Sweeps query-batch size over both paths on the fm corpus (60k x 784):

* flat  — ONE resident graph, every query walks it
  (`search_index_path` on the single-partition artifact)
* routed — 32 cluster-partitioned graphs, each query walks only its
  nprobe=2 probed cells (`search_index_path` with centroids)

Routing's structural win is NOT single-node latency — it is that
per-query work and per-query bytes touched are O(nprobe · cell) and
independent of total index size, while the flat graph's working set IS
the index.  On one machine where both fit in RAM, the flat graph
amortizes better (no routing overhead, one cache-hot graph); the
crossover appears when the index exceeds one node's memory — which a
batch-size sweep can only indicate via the per-batch fixed-cost trend.
This records the numbers behind that statement.

Usage: python tools/crossover_routed.py
Prints one JSON line {"batches": {n: {"flat_s":..,"routed_s":..}}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (100, 1_000, 10_000)
REPEATS = 3


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from anndb_spark.session import get_spark

    spark = get_spark("crossover", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from pyspark.sql import functions as F
    from anndb_spark.operators.hnsw import (
        HnswConfig,
        build_index,
        save_index,
        search_index_path,
    )
    from anndb_spark.operators.ivf import assign_clusters, train_centroids

    scratch = tempfile.mkdtemp(prefix="crossover_")
    fm = bench.fm_table(spark, cpus).cache()
    fm_n = fm.count()
    cfg = HnswConfig(m=16, ef_construction=500, heuristic=True, heuristic_pool=64)

    # flat: one resident graph (partition_id constant)
    flat_path = os.path.join(scratch, "flat")
    save_index(
        build_index(
            fm.select("id", "vector").withColumn(
                "partition_id", F.lit(0).cast("int")
            ),
            cfg,
        ),
        flat_path,
    )
    # routed: 32 k-means cells
    cent = train_centroids(fm, 32, sample_n=30_000)
    routed_path = os.path.join(scratch, "routed")
    save_index(
        build_index(
            assign_clusters(fm.select("id", "vector"), cent),
            cfg,
            partition_col="cluster_id",
        ),
        routed_path,
    )

    qs_all = bench.fm_queries(max(BATCHES))
    out: dict[str, dict] = {}
    for nb in BATCHES:
        qs = qs_all[:nb]
        qpt = -(-nb // cpus)
        flat_kw = dict(
            ef=20, config=cfg, strategy="beam", cache_token="xover-flat",
            queries_per_task=qpt,
        )
        routed_kw = dict(
            centroids=cent, nprobe=2, ef=20, config=cfg, strategy="beam",
            cache_token="xover-routed",
        )
        search_index_path(spark, flat_path, qs, 10, **flat_kw).collect()  # warm
        search_index_path(spark, routed_path, qs, 10, **routed_kw).collect()
        flat_s = min(
            _t(lambda: search_index_path(spark, flat_path, qs, 10, **flat_kw).collect())
            for _ in range(REPEATS)
        )
        routed_s = min(
            _t(lambda: search_index_path(spark, routed_path, qs, 10, **routed_kw).collect())
            for _ in range(REPEATS)
        )
        out[str(nb)] = {
            "flat_s": round(flat_s, 3),
            "routed_s": round(routed_s, 3),
            "flat_q_per_s": round(nb / flat_s, 1),
            "routed_q_per_s": round(nb / routed_s, 1),
        }
    print(json.dumps({"fm_n": fm_n, "nprobe": 2, "batches": out}))
    spark.stop()


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
