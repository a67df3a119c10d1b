"""r11 beam-leg reconciliation (VERDICT r10 wrong #2 / task 2).

BENCH_r10's driver record for ``hnsw_search_1kq_beam`` read 1.747 s —
+54% over BENCH_r09's 1.137 s — while three committed local r10 runs
read 0.704/0.958/0.884 s on a byte-identical `hnsw.py`.  Per the
builder's own convention (PLANS r10: no variance claim without at
least two committed records or a paired A/B), this tool produces TWO
same-boot records, each a median of 5, of exactly the bench's beam
leg (same 100k index build, same 1000 queries, same warm pass, same
cache token discipline), and prints one JSON line for committal.

Usage: python tools/beam_ab_r11.py  [env: SPARK_GRAFT_SF_DIR, _CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from anndb_spark.session import get_spark

    spark = get_spark("anndb-beam-ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from anndb_spark.operators.hnsw import (
        HnswConfig,
        build_index,
        save_index,
        search_index_path,
    )
    from anndb_spark.sources.tables import lineitem_vec
    from pyspark.sql import functions as F

    vecs = (
        lineitem_vec(spark, sf_dir)
        .select("id", "vector")
        .repartition(cpus)
        .cache()
    )
    vecs.count()
    sample = (
        vecs.limit(100_000)
        .dropDuplicates(["id"])
        .withColumn(
            "partition_id", F.pmod(F.xxhash64("id"), F.lit(cpus)).cast("int")
        )
        .cache()
    )
    sample.count()
    cfg = HnswConfig(m=16, ef_construction=100)
    scratch = tempfile.mkdtemp(prefix="anndb_beam_ab_")
    idx_path = os.path.join(scratch, "idx_100k")
    save_index(build_index(sample, cfg), idx_path)

    rng = np.random.default_rng(42)
    queries = [(str(i), rng.normal(0, 30, 8).tolist()) for i in range(1000)]
    search_index_path(  # warm every worker's graph cache
        spark, idx_path, queries, 10, ef=50, config=cfg, cache_token="ab-flat"
    ).collect()

    def median5() -> tuple[float, list[float]]:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            search_index_path(
                spark,
                idx_path,
                queries,
                10,
                ef=50,
                config=cfg,
                strategy="beam",
                cache_token="ab-flat",
            ).collect()
            times.append(round(time.perf_counter() - t0, 3))
        return round(float(np.median(times)), 3), times

    rec_a, times_a = median5()
    rec_b, times_b = median5()
    print(
        json.dumps(
            {
                "leg": "hnsw_search_1kq_beam",
                "sf_dir": sf_dir,
                "cpus": cpus,
                "record_a_median5": rec_a,
                "record_b_median5": rec_b,
                "times_a": times_a,
                "times_b": times_b,
                "r9_driver": 1.137,
                "r10_driver": 1.747,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
