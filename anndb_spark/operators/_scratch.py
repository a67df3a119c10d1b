"""Thread-local reused scratch buffers for NumPy scoring kernels.

The allocation discipline established by the r12 scatter-leg fix
(`hnsw._scratch_mat`, PLANS r12) and extended to IVF in r13
(`ivf._scratch_mat64`): a fresh multi-MB allocation per call in a
32-way-concurrent Arrow worker path is a latent 100x first-touch tail
on fault-slow hosts (measured: p90 5.6 s per 25 MB of fresh pages
under 32-way concurrency; the r13 ivf micro A/B read p90 13.1 s fresh
vs 0.31 s reused at the (64, 50k) float64 shape), while reused pages
cost zero.  This module is the shared form for the PQ/IVFPQ ADC
scanners, whose per-chunk score matrices are the LARGEST per-call
allocations in the package ((nq, 65536) float32 per row chunk, plus
the hidden (nq, n) int64 index matrix inside whole-matrix
``np.argpartition(axis=1)``).

Contract (same as the hnsw/ivf locals):

* one flat capacity buffer per (thread, tag), grown monotonically;
* a buffer above ``ANNDB_SCRATCH_CAP_BYTES`` (default 256 MB) is
  released when the next request needs under a quarter of it, so one
  outlier batch cannot pin memory for process lifetime;
* thread-LOCAL so concurrent driver-side callers never share a
  matrix;
* the returned view is valid until the caller's next request for the
  same tag on the same thread — callers must consume (or copy out of)
  a scratch matrix before re-requesting its tag.
"""

from __future__ import annotations

import os
import threading

import numpy as np

_TLS = threading.local()
_CAP_BYTES = int(os.environ.get("ANNDB_SCRATCH_CAP_BYTES", str(256 << 20)))


def scratch_mat(
    tag: str, rows: int, cols: int, dtype=np.float32
) -> np.ndarray:
    bufs = getattr(_TLS, "bufs", None)
    if bufs is None:
        bufs = _TLS.bufs = {}
    need = rows * cols
    flat = bufs.get(tag)
    if (
        flat is None
        or flat.dtype != np.dtype(dtype)
        or flat.size < need
        or (flat.nbytes > _CAP_BYTES and need * 4 < flat.size)
    ):
        flat = np.empty(need, dtype=dtype)
        bufs[tag] = flat
    return flat[:need].reshape(rows, cols)


def argpart_rows(d: np.ndarray, kk: int) -> np.ndarray:
    """Row-wise top-kk argpartition: (|Q|, kk) int64 indices.

    Identical selection + tie behavior to
    ``np.argpartition(d, kk-1, axis=1)[:, :kk]`` (axis=1 runs the same
    introselect per row), but the per-row form's internal scratch is a
    KB-scale arena allocation instead of a hidden fresh (|Q|, n) int64
    index matrix."""
    part = np.empty((d.shape[0], kk), dtype=np.int64)
    for qi in range(d.shape[0]):
        part[qi] = np.argpartition(d[qi], kk - 1)[:kk]
    return part
