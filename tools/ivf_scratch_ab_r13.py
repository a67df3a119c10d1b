"""r13 ivf scratch-discipline A/B (VERDICT r12 task 3).

PLANS r12 flagged ``ivf._pairwise`` as carrying the same
fresh-per-call allocation shape the scatter-leg fix eliminated, at
~4x smaller scale: per worker call it allocated a fresh (q, n) float64
dot, several (q, n) elementwise temporaries, and the HIDDEN (q, n)
int64 index matrix inside whole-matrix ``np.argpartition(axis=1)``.
Its bench legs were flat in every committed record (0.832/0.844 s), so
under the measure-first rule it shipped unchanged — but the r12
mechanism (concurrent first-touch of fresh pages: p90 5.6 s per 25 MB
under 32-way concurrency on a fault-slow host) says the shape is a
LATENT tail, not a present defect.  r13 applies the `_scratch_mat`
discipline (thread-local reused flat buffers + per-row introselect,
`ivf.py:_scratch_mat64/_argpart_rows`), bitwise-identical by
construction and by pytest (`test_pairwise_scratch_reuse_bitwise`).

This tool produces the evidence pair:

* **micro** — the concurrent-first-touch repro at the ivf shape:
  ``procs`` worker processes each score ``iters`` batches of
  (q=64, n=50k, d=64) euclidean distances, once with the OLD
  fresh-allocation formulas (inlined verbatim below) and once with the
  NEW scratch kernel; per-call wall times are pooled and p50/p90/max
  reported.  "Tail is gone" = scratch p90/max collapse to ~p50 while
  fresh keeps its first-touch spread (on a healthy host both are flat
  — the record carries its own probe brackets so the reading is
  host-calibrated either way).
* **legs** — median-of-5 of the two bench legs that ride this kernel
  (``ivf_search_200q``, ``knn_join_ivf_2k``), replicated at bench
  shape, for the flat-or-better check against the committed r12 driver
  record (0.844 / 1.775 s).

Run:  python tools/ivf_scratch_ab_r13.py   [env: SPARK_GRAFT_SF_DIR, _CPUS]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.host_probe import probe  # noqa: E402

MICRO_Q, MICRO_N, MICRO_D = 64, 50_000, 64
MICRO_ITERS = 8


def _micro_worker(args) -> list[float]:
    """One process: `iters` scoring calls in `mode`, per-call seconds."""
    mode, seed, iters = args
    rng = np.random.default_rng(seed)
    qs = rng.normal(0, 1, (MICRO_Q, MICRO_D))
    vs = rng.normal(0, 1, (MICRO_N, MICRO_D))
    if mode == "scratch":
        from anndb_spark.operators.ivf import _argpart_rows, _pairwise
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        if mode == "fresh":
            # the pre-r13 kernel, verbatim: fresh (q, n) dot + temps +
            # whole-matrix argpartition's hidden (q, n) int64 indices
            dot = qs @ vs.T
            qn2 = np.einsum("ij,ij->i", qs, qs)
            vn2 = np.einsum("ij,ij->i", vs, vs)
            d = np.sqrt(np.maximum(vn2[None, :] - 2.0 * dot + qn2[:, None], 0.0))
            part = np.argpartition(d, 9, axis=1)[:, :10]
        else:
            d = _pairwise(qs, vs, "euclidean")
            part = _argpart_rows(d, 10)
        part.sum()  # consume
        times.append(time.perf_counter() - t0)
    return times


def _pooled(times_lists: list[list[float]]) -> dict:
    allt = np.array([t for ts in times_lists for t in ts])
    return {
        "calls": int(allt.size),
        "p50_s": round(float(np.percentile(allt, 50)), 4),
        "p90_s": round(float(np.percentile(allt, 90)), 4),
        "max_s": round(float(allt.max()), 4),
        "sum_s": round(float(allt.sum()), 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict = {
        "what": "ivf scratch discipline A/B (r13 task 3)",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "micro_shape": f"q={MICRO_Q} n={MICRO_N} d={MICRO_D} x{MICRO_ITERS} iters x{cpus} procs",
    }
    out["probe_pre"] = probe()

    # --- micro: concurrent first-touch repro, old vs new kernel ------
    ctx = mp.get_context("spawn")
    for mode in ("fresh", "scratch"):
        with ctx.Pool(cpus) as pool:
            lists = pool.map(
                _micro_worker,
                [(mode, 1000 + i, MICRO_ITERS) for i in range(cpus)],
            )
        out[f"micro_{mode}"] = _pooled(lists)

    # --- spark legs at bench shape, median of 5 ----------------------
    from pyspark.sql import functions as F

    from anndb_spark.session import get_spark

    spark = get_spark("anndb-ivf-ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from anndb_spark.operators.ivf import (
        assign_clusters,
        save_assigned,
        search_ivf_path,
        train_centroids,
    )
    from anndb_spark.operators.knn import knn_join

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
        .cache()
    )
    emb.count()
    scratch = tempfile.mkdtemp(prefix="anndb_ivf_ab_")
    ivf_path = os.path.join(scratch, "ivf_assigned")
    cent = train_centroids(emb, 32, sample_n=50_000)
    assigned = assign_clusters(emb, cent).cache()
    assigned.count()
    save_assigned(assigned, ivf_path)
    rng2 = np.random.default_rng(7)
    ivf_queries = [(i, rng2.normal(0, 1, 64).tolist()) for i in range(200)]
    search_ivf_path(  # warm cluster matrices, bench discipline
        spark, ivf_path, ivf_queries[:8], 10, cent, nprobe=4,
        cache_token="ab-ivf",
    ).collect()

    def med5(fn) -> float:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)), 3)

    out["ivf_search_200q_med5_s"] = med5(
        lambda: search_ivf_path(
            spark, ivf_path, ivf_queries, 10, cent, nprobe=4,
            cache_token="ab-ivf",
        ).collect()
    )
    join_left = emb.limit(2000)
    out["knn_join_ivf_2k_med5_s"] = med5(
        lambda: knn_join(
            join_left, assigned, 5, mode="ivf", centroids=cent, nprobe=4,
            exclude_self=True,
        ).collect()
    )
    out["r12_driver_record"] = {"ivf_search_200q": 0.844, "knn_join_ivf_2k": 1.775}
    spark.stop()
    out["probe_post"] = probe()
    line = json.dumps(out, separators=(",", ":"))
    print(line)
    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts_r13"
    )
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "ivf_scratch_ab.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
