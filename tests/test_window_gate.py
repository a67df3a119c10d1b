"""The window-debt gate (tools/window_gate.py) must pass on the tree
as committed — every oracle-backed registry entry either holds a
_DRIVER_WINDOW slot this round or was driver-green within the last two
recorded rounds — and must actually detect debt when it exists."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import __spark_entry__ as e  # noqa: E402
from window_gate import load_green_history, window_debt  # noqa: E402


def test_current_window_has_no_debt():
    bad = window_debt(
        list(e.all_queries()), list(e._DRIVER_WINDOW), set(e.oracle_sql())
    )
    assert not bad, "\n".join(bad)


def test_window_fits_driver_cap_and_registry():
    w = e._DRIVER_WINDOW
    assert len(w) <= 50 and len(set(w)) == len(w)
    assert set(w) <= set(e.all_queries())


def test_gate_detects_stale_and_unknown_entries():
    registry = list(e.all_queries())
    oracle_keys = set(e.oracle_sql())
    # drop a never-green oracle-backed entry from the window -> debt
    green, _, _ = load_green_history()
    never = next(
        n for n in e._DRIVER_WINDOW if n in oracle_keys and not green.get(n)
    )
    window = [n for n in e._DRIVER_WINDOW if n != never]
    bad = window_debt(registry, window, oracle_keys)
    assert any(never in b for b in bad), (never, bad)
    # a phantom window name is a violation too
    bad2 = window_debt(registry, ["not_a_query"], oracle_keys)
    assert any("not_a_query" in b for b in bad2)
    # oversized window is rejected regardless of content
    bad3 = window_debt(registry, registry[:51], oracle_keys)
    assert any("caps at 50" in b for b in bad3)
