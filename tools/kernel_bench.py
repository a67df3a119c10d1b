"""Offline micro-benchmark for the HNSW search kernel (no Spark).

Builds (once, cached to /tmp) an fm-protocol graph and times the
batched beam search exactly as a serving task would run it: one core
(set OMP_NUM_THREADS=1 before numpy import to measure honestly),
queries in task-sized slices.

Usage:
  python tools/kernel_bench.py [n] [dim] [batch] [ef]
e.g.
  OMP_NUM_THREADS=1 python tools/kernel_bench.py 20000 784 312 20
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from anndb_spark.operators.hnsw import HnswConfig, HnswGraph

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 784
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 312
EF = int(sys.argv[4]) if len(sys.argv) > 4 else 20
N_QUERIES = 1_000
K = 10
SEED = 1234
CENTERS, INTRINSIC = 64, 32


def _centers_basis():
    # centers/basis ALWAYS from the base seed — queries must live in the
    # same clusters as the corpus (bench.py fm_table/fm_queries contract)
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0, 1.0, (CENTERS, DIM)).astype(np.float32)
    basis = (rng.normal(0, 1.0, (DIM, INTRINSIC)) / np.sqrt(INTRINSIC)).astype(
        np.float32
    )
    return centers, basis


def corpus(n, rng, pick_centers=False):
    centers, basis = _centers_basis()
    w = rng.normal(0, 1.0, (n, INTRINSIC)).astype(np.float32)
    eps = rng.normal(0, 0.1, (n, DIM)).astype(np.float32)
    cidx = (
        rng.integers(CENTERS, size=n) if pick_centers else np.arange(n) % CENTERS
    )
    return centers[cidx] + w @ basis.T + eps


def get_graph():
    cache = f"/tmp/kbench_graph_{N}_{DIM}.pkl"
    cfg = HnswConfig(m=16, ef_construction=500)
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            g = pickle.load(f)
        return g
    rng = np.random.default_rng(SEED)
    mat = corpus(N, rng)
    lr = np.random.default_rng(SEED + 7)
    ml = cfg.level_multiplier
    levels = np.floor(
        -np.log(np.clip(lr.random(N), 1e-12, 1 - 1e-12)) * ml
    ).astype(int).tolist()
    t0 = time.perf_counter()
    g = HnswGraph.build(mat, levels, cfg)
    bt = time.perf_counter() - t0
    print(f"build: {bt:.1f}s  ({N / bt:.0f} inserts/s single-core)")
    g.finalize()
    # drop python adjacency (search only needs pads) to slim the pickle
    g.adj = []
    with open(cache, "wb") as f:
        pickle.dump(g, f, protocol=4)
    return g


def main():
    g = get_graph()
    rng = np.random.default_rng(SEED + 99)
    Q = corpus(N_QUERIES, rng, pick_centers=True)

    # ground truth (blocked brute)
    truth = []
    for s in range(0, N_QUERIES, 200):
        truth.extend(g.search_brute(Q[s : s + 200], K))
    tset = [set(i for _, i in row) for row in truth]

    # warm
    g.search_fast_batch(Q[:BATCH], K, EF)
    t0 = time.perf_counter()
    res = []
    for s in range(0, N_QUERIES, BATCH):
        res.extend(g.search_fast_batch(Q[s : s + BATCH], K, EF))
    dt = time.perf_counter() - t0
    hits = sum(len(set(i for _, i in r) & t) for r, t in zip(res, tset))
    print(
        f"batched beam: {dt:.3f}s = {N_QUERIES / dt:.0f} q/s/core  "
        f"recall@{K}={hits / (K * N_QUERIES):.4f}  "
        f"(n={N} d={DIM} batch={BATCH} ef={EF})"
    )


if __name__ == "__main__":
    main()
