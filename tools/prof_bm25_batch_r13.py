"""Isolate bm25_search_indexed_batch (the largest bench leg) and break
its wall time into driver round-trips + the main job, per guide §1:
time sub-steps, count jobs, and dump the AQE-final executed plan.

Usage: python tools/prof_bm25_batch_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from anndb_spark.session import get_spark

    spark = get_spark("prof-bm25-batch", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from anndb_spark.operators.text import (
        bm25_search_indexed_batch,
        write_bm25_index,
    )

    import tempfile

    scratch = tempfile.mkdtemp(prefix="prof_bm25_")
    bm25_dir = os.path.join(scratch, "bm25idx")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    write_bm25_index(docs, bm25_dir, buckets=64)
    print(f"write_index: {time.perf_counter()-t0:.2f}s")

    rng = np.random.default_rng(25)
    vocab = sorted(
        r["term"]
        for r in spark.read.parquet(f"{bm25_dir}/postings")
        .select("term").distinct().collect()
    )
    probes = [
        (f"p{i}", [vocab[int(j)] for j in rng.integers(0, len(vocab), 3)])
        for i in range(100)
    ]

    # warm (same as bench: one full run first)
    df = bm25_search_indexed_batch(spark, bm25_dir, probes, k=20)
    df.collect()

    sc = spark.sparkContext
    for rep in range(3):
        t0 = time.perf_counter()
        df = bm25_search_indexed_batch(spark, bm25_dir, probes, k=20)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = df.collect()
        t_run = time.perf_counter() - t0
        print(f"rep{rep}: build(df)={t_build:.3f}s run={t_run:.3f}s rows={len(rows)}")

    # sub-step timings of the build phase (driver round-trips)
    t0 = time.perf_counter()
    st = spark.read.parquet(f"{bm25_dir}/stats")
    srow = st.collect()[0]
    print(f"stats collect: {time.perf_counter()-t0:.3f}s")
    rows_pt = []
    for pid, terms in probes:
        for t in sorted(set(terms)):
            rows_pt.append((str(pid), t))
    t0 = time.perf_counter()
    probe_terms = spark.createDataFrame(
        rows_pt, "probe_id STRING, term STRING"
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(64)).cast("int"))
    bucket_ids = sorted(
        r["bucket"] for r in probe_terms.select("bucket").distinct().collect()
    )
    print(f"bucket distinct collect: {time.perf_counter()-t0:.3f}s n={len(bucket_ids)}")

    # executed AQE-final plan
    df = bm25_search_indexed_batch(spark, bm25_dir, probes, k=20)
    df.collect()
    print("=== executed plan (AQE final) ===")
    print(df._jdf.queryExecution().executedPlan().toString()[:8000])
    spark.stop()


if __name__ == "__main__":
    main()
