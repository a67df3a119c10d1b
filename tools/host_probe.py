"""Host-speed calibration embedded in every bench record.

The r11 lesson (PLANS r11): identical code and identical inputs read
1.5-2x apart across same-boot runs, and up to 3.5x across rounds
(dedup1m lsh 164.6 s -> 579.7 s -> 219.0 s on byte-identical plans).
Cross-round wall-clock comparisons are meaningless without knowing how
fast the HOST was at measurement time, so bench.py runs this probe
first and embeds the numbers in the record:

* ``host_gflops_1t``  — single-thread f32 GEMM (BLAS pinned to one
  thread via env in a child process) — scalar/SIMD core speed;
* ``host_gflops_all`` — all-cores f32 GEMM (BLAS unpinned) — aggregate
  FP throughput incl. SMT-sibling/co-tenant contention that steal%
  does not show;
* ``host_membw_gbps`` — single-thread sum over a float64 array —
  memory read bandwidth (shuffle-heavy legs track this more than
  GFLOP/s).

The r12 lesson (VERDICT r11 caveat): the flagship BENCH_r11 record
shipped with NO host keys because the fixed 2048^2 unpinned GEMM blew
its 60 s child budget on the contended host — the one record that most
needed calibration lacked it.  The probe now DECAYS: each GEMM tries a
ladder of matrix sizes with shrinking per-child timeouts and keeps the
first size that completes; the size actually measured is reported
alongside (``host_gemm_1t_n`` / ``host_gemm_all_n``) so cross-round
normalization can tell a 2048-point from a 512-point.  GFLOP/s is a
rate, so values at different ladder sizes are comparable to first
order (BLAS efficiency drifts a few % across these sizes — far inside
the 1.7-3.5x swings being calibrated).  The membw probe sizes itself
the same way: one timed pass over a 1 GiB array, decaying to 256 MiB
if the first pass blows its budget.  Every stage is independently
guarded, so the probe ALWAYS returns whatever keys it could measure —
partial calibration beats none.

Thread-cap env semantics (ADVICE r11): the unpinned (all-cores) child
INTENTIONALLY strips OMP_NUM_THREADS / OPENBLAS_NUM_THREADS /
MKL_NUM_THREADS, including user-set values — it measures what the
HARDWARE can deliver across all cores, not what the session's
worker-side 1-thread pin allows (anndb_spark.session pins workers to
one BLAS thread, and a probe that inherited that pin would just
re-measure host_gflops_1t).  The oversubscription lasts one bounded
child process per bench run.

The probes are fixed workloads at each ladder size, so the ratio
baseline_round/now is directly a wall-time normalizer.  GEMM probes
run in child processes because BLAS thread pools are frozen at first
use — the parent cannot pin and unpin in one process.

Standalone: ``python tools/host_probe.py`` prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# (matrix n, child timeout s) ladders — first completing size wins.
# Timeouts decay with size so a pathologically contended host pays at
# most sum(timeouts) per probe, and the smallest rung is cheap enough
# (512^3 f32 = 0.27 GFLOP/iter) to complete on a host running at
# 1 GFLOP/s.
GEMM_LADDER_ALL = ((2048, 35.0), (1024, 15.0), (512, 8.0))
GEMM_LADDER_1T = ((512, 20.0), (256, 8.0))
MEMBW_GIB_LADDER = (1.0, 0.25)
MEMBW_PASS_BUDGET_S = 10.0


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
    n: int, secs: float, pin_1t: bool, timeout: float
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
            # intentional: measure hardware capability, not session
            # thread caps (see module docstring, ADVICE r11)
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


def _gemm_ladder(ladder, pin_1t: bool) -> tuple[float, int] | None:
    """First ladder rung that completes: (gflops, n)."""
    for n, timeout in ladder:
        g = _run_child(n, 1.5, pin_1t=pin_1t, timeout=timeout)
        if g is not None:
            return g, n
    return None


def _membw(
    ladder=MEMBW_GIB_LADDER, loop_secs: float = 1.0
) -> tuple[float, float] | None:
    """(GB/s, GiB measured).  One timed pass first: if even a single
    pass over the big array exceeds the budget, that pass is still a
    valid rate measurement — use it rather than discarding; only an
    allocation/fault failure decays to the smaller array."""
    import numpy as np

    for gib in ladder:
        try:
            n = int(gib * (1 << 30) / 8)
            a = np.ones(n, dtype=np.float64)
            a.sum()  # fault the pages in
            t0 = time.time()
            a.sum()
            first = time.time() - t0
            if first > MEMBW_PASS_BUDGET_S:
                return a.nbytes / first / 1e9, gib
            t0 = time.time()
            passes = 0
            while time.time() - t0 < loop_secs:
                a.sum()
                passes += 1
            dt = time.time() - t0
            return a.nbytes * passes / dt / 1e9, gib
        except MemoryError:
            continue
    return None


def probe() -> dict:
    """Best-effort host calibration: every stage independently guarded;
    whatever completed is returned (possibly {})."""
    out: dict = {}
    try:
        bw = _membw()
        if bw is not None:
            out["host_membw_gbps"] = round(bw[0], 1)
            if bw[1] != MEMBW_GIB_LADDER[0]:
                out["host_membw_gib"] = bw[1]
    except Exception:
        pass
    for key, ladder, pin in (
        ("host_gflops_1t", GEMM_LADDER_1T, True),
        ("host_gflops_all", GEMM_LADDER_ALL, False),
    ):
        try:
            got = _gemm_ladder(ladder, pin_1t=pin)
        except Exception:
            got = None
        if got is not None:
            out[key] = round(got[0], 1)
            if got[1] != ladder[0][0]:
                out[key.replace("gflops", "gemm") + "_n"] = got[1]
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
