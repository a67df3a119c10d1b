"""Host-speed calibration embedded in every bench record.

This round's lesson (PLANS r11): identical code and identical inputs
read 1.5-2x apart across same-boot runs, and up to 3.5x across rounds
(dedup1m lsh 164.6 s -> 579.7 s -> 219.0 s on byte-identical plans).
Cross-round wall-clock comparisons are meaningless without knowing how
fast the HOST was at measurement time, so bench.py now runs this probe
first and embeds the numbers in the record:

* ``host_gflops_1t``  — single-thread f32 GEMM (512^2, BLAS pinned to
  one thread via env in a child process) — scalar/SIMD core speed;
* ``host_gflops_all`` — all-cores f32 GEMM (2048^2, BLAS unpinned) —
  aggregate FP throughput incl. SMT-sibling/co-tenant contention that
  steal% does not show;
* ``host_membw_gbps`` — single-thread sum over a 1 GiB float64 array —
  memory read bandwidth (shuffle-heavy legs track this more than
  GFLOP/s).

The probes are fixed workloads (same sizes every round), so the ratio
baseline_round/now is directly a wall-time normalizer.  GEMM probes run
in child processes because BLAS thread pools are frozen at first use —
the parent cannot pin and unpin in one process.

Standalone: ``python tools/host_probe.py`` prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _gemm_child(n: int, secs: float) -> None:
    import numpy as np

    a = np.random.rand(n, n).astype(np.float32)
    a @ a  # warm the pool (one iter: on sys-bound hosts warmup is not free)
    t0 = time.time()
    iters = 0
    while time.time() - t0 < secs:
        a @ a
        iters += 1
    dt = time.time() - t0
    print(json.dumps({"gflops": 2.0 * n**3 * iters / dt / 1e9}))


def _run_child(
    n: int, secs: float, pin_1t: bool, timeout: float = 60.0
) -> float | None:
    """GFLOP/s from a child process, or None if the child blows its
    budget — on a sys-bound host the unpinned BLAS pool can spend
    MINUTES in futex spin (observed r11: 3m37s sys for a 1.5s timed
    loop); calibration must never cost more than it informs."""
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        if pin_1t:
            env[var] = "1"
        else:
            env.pop(var, None)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--gemm", str(n),
             "--secs", str(secs)],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        return float(
            json.loads(out.stdout.strip().splitlines()[-1])["gflops"]
        )
    except (subprocess.TimeoutExpired, ValueError, IndexError, OSError):
        return None


def _membw(gib: float = 1.0, secs: float = 1.0) -> float:
    import numpy as np

    n = int(gib * (1 << 30) / 8)
    a = np.ones(n, dtype=np.float64)
    a.sum()  # fault the pages in
    t0 = time.time()
    passes = 0
    while time.time() - t0 < secs:
        a.sum()
        passes += 1
    dt = time.time() - t0
    return a.nbytes * passes / dt / 1e9


def probe() -> dict:
    out = {"host_membw_gbps": round(_membw(), 1)}
    for key, n, pin in (
        ("host_gflops_1t", 512, True),
        ("host_gflops_all", 2048, False),
    ):
        g = _run_child(n, 1.5, pin_1t=pin)
        if g is not None:
            out[key] = round(g, 1)
    return out


def main() -> None:
    if "--gemm" in sys.argv:
        i = sys.argv.index("--gemm")
        n = int(sys.argv[i + 1])
        secs = float(sys.argv[sys.argv.index("--secs") + 1])
        _gemm_child(n, secs)
        return
    print(json.dumps(probe()))


if __name__ == "__main__":
    main()
