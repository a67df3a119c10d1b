"""r12 scatter-leg reconciliation (VERDICT r11 wrong #1 / task 1).

BENCH_r11's driver record for ``hnsw_search_1kq`` read 7.263 s — 6.0x
over BENCH_r10's 1.216 s — and the local r11 record read 10.998 s
median (min 5.246) vs r10's 0.947 s, all on a byte-identical
`hnsw.py`, while the headline moved only ~2x.  The beam and routed
legs got paired same-boot reconciliations (tools/beam_ab_r11.py); this
leg got none.  Per the builder's own convention (PLANS r10/r11: no
variance claim without paired probe-bracketed records), this tool
produces TWO same-boot records, each a median of 5, of exactly the
bench's scatter leg (same 100k index build, same 1000 queries, same
warm pass, same cache-token discipline), each BRACKETED by
tools/host_probe.py runs so the wall numbers carry their own
calibration, and prints one JSON line for committal.

It also tests the verdict's suspected mechanism directly:

* ``worker_omp`` — the OMP/OPENBLAS/MKL thread-cap env actually seen
  INSIDE a pandas-UDF worker (session.py has pinned these to "1"
  since r4; if workers report "1", the "unpinned BLAS pools fight in
  32 concurrent workers" hypothesis is dead on arrival and the 6x is
  host-side);
* a third median-of-5 with the leg forced to ``strategy="brute"``
  (the auto router picks brute at this partition size anyway —
  proves the timed code path) and one with ``strategy="beam"`` (the
  leg that DID get reconciled in r11, as an in-run cross-reference).

Run it twice (two boots) for the full convention:
    python tools/scatter_ab_r12.py   [env: SPARK_GRAFT_SF_DIR, _CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.host_probe import probe  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    out: dict = {"leg": "hnsw_search_1kq", "sf_dir": sf_dir, "cpus": cpus}
    out["probe_pre"] = probe()

    from anndb_spark.session import get_spark

    spark = get_spark("anndb-scatter-ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from anndb_spark.operators.hnsw import (
        HnswConfig,
        build_index,
        save_index,
        search_index_path,
    )
    from anndb_spark.sources.tables import lineitem_vec

    # the thread-cap env a real pandas-UDF worker sees (mechanism check)
    import pandas as pd

    def env_probe(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "var": ["OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                            "MKL_NUM_THREADS"],
                    "val": [
                        os.environ.get(v, "<unset>")
                        for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                                  "MKL_NUM_THREADS")
                    ],
                }
            )
            return

    out["worker_omp"] = {
        r["var"]: r["val"]
        for r in spark.range(1).repartition(1)
        .mapInPandas(env_probe, "var STRING, val STRING").collect()
    }

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
    scratch = tempfile.mkdtemp(prefix="anndb_scatter_ab_")
    idx_path = os.path.join(scratch, "idx_100k")
    save_index(build_index(sample, cfg), idx_path)

    rng = np.random.default_rng(42)
    queries = [(str(i), rng.normal(0, 30, 8).tolist()) for i in range(1000)]
    search_index_path(  # warm every worker's graph cache (bench shape)
        spark, idx_path, queries, 10, ef=50, config=cfg, cache_token="ab-flat"
    ).collect()

    def median5(strategy: str) -> tuple[float, list[float]]:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            search_index_path(
                spark, idx_path, queries, 10, ef=50, config=cfg,
                strategy=strategy, cache_token="ab-flat",
            ).collect()
            times.append(round(time.perf_counter() - t0, 3))
        return round(float(np.median(times)), 3), times

    out["record_a_median5"], out["times_a"] = median5("auto")
    out["probe_mid"] = probe()
    out["record_b_median5"], out["times_b"] = median5("auto")
    out["probe_post"] = probe()
    # cross-reference legs on the same boot: the explicit-brute twin
    # (auto picks brute at this partition size — equal times prove the
    # timed path) and the beam leg that r11 already reconciled
    out["record_brute_median5"], out["times_brute"] = median5("brute")
    out["record_beam_median5"], out["times_beam"] = median5("beam")
    out["r10_driver"] = 1.216
    out["r11_driver"] = 7.263
    out["r11_local_median"] = 10.998
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
