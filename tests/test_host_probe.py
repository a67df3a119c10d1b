"""Host-calibration probe: cheap paths only — the real GEMM children
are budget-capped but can still take minutes on a sys-bound host, so
tests exercise the wiring, not the workload."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import host_probe


def test_membw_returns_positive_bandwidth():
    bw = host_probe._membw(gib=0.01, secs=0.2)
    assert bw > 0.1  # any real machine reads >0.1 GB/s


def test_run_child_timeout_yields_none_not_raise():
    # a timeout that cannot fit a python start: the probe must degrade
    # to an absent key, never take the bench down with it
    assert host_probe._run_child(64, 0.1, pin_1t=True, timeout=0.01) is None


def test_gemm_child_prints_json(capsys):
    host_probe._gemm_child(32, 0.05)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    assert json.loads(out)["gflops"] > 0
