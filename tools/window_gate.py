"""Window-debt gate: fail when any registry query lacks recent driver
evidence.

The driver's per-round CORRECTNESS harness evaluates only the first 50
``queries()`` entries, while ``all_queries()`` keeps growing — so a
fixed window silently starves entries of driver-recorded oracle rows
(the round-7 defect: 22 entries lost their rows for a round).  This
gate makes the rotation debt explicit and enforceable:

    every oracle-backed ``all_queries()`` entry must either
      (a) hold a ``_DRIVER_WINDOW`` slot this round, or
      (b) have a recorded driver-green row (rows+schema+hash all true
          in some committed CORRECTNESS_r*.json) within the last
          ``max_age`` (default 2) rounds.

No-oracle entries (recall metrics, ADC approximation legs) can never
produce a hash verdict, so spending window slots on them buys nothing;
they are exempt from freshness but still required to be *known* — the
gate fails on a no-oracle entry that has never had ANY driver row and
is not in the window, unless its name is in ``TWIN_EVIDENCE`` mapping
it to a hash-green exact twin.

Run standalone (``python tools/window_gate.py``) or via pytest
(tests/test_window_gate.py).  The "current round" is inferred as
1 + the newest committed CORRECTNESS_r{N}.json — i.e. the round whose
window is being shipped.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# no-oracle entries whose driver evidence is carried by a hash-green
# exact twin computing the same candidates/layout
TWIN_EVIDENCE = {
    "pq_adc_embeddings_top10": "pq_exact_rerank_top10",
    "ivfpq_embeddings_top10": "ivfpq_full_probe_top10",
}


def load_green_history(repo: str = REPO) -> tuple[dict, dict, int]:
    """(green, recorded, current_round): per-query sets of rounds with a
    hash-green row / with any recorded row, and the round being built
    (newest CORRECTNESS file + 1)."""
    green: dict[str, set[int]] = {}
    recorded: dict[str, set[int]] = {}
    newest = 0
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        try:
            rows = json.load(open(f))
        except (json.JSONDecodeError, OSError):
            continue
        for name, row in rows.items():
            recorded.setdefault(name, set()).add(rnd)
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.setdefault(name, set()).add(rnd)
    return green, recorded, newest + 1


def window_debt(
    registry: list[str],
    window: list[str],
    oracle_keys: set[str],
    max_age: int = 2,
    repo: str = REPO,
) -> list[str]:
    """Violation strings; empty = gate passes."""
    green, recorded, current = load_green_history(repo)
    win = set(window)
    bad: list[str] = []
    if len(window) > 50:
        bad.append(f"window has {len(window)} entries; driver caps at 50")
    if len(win) != len(window):
        bad.append("window contains duplicate names")
    for name in window:
        if name not in registry:
            bad.append(f"window entry {name!r} is not in all_queries()")
    for name in registry:
        if name in win:
            continue
        if name in oracle_keys:
            last = max(green.get(name, {0}))
            if last <= current - max_age - 1:
                bad.append(
                    f"{name}: last driver-green row is r{last or '-'} "
                    f"(stale at r{current}, max_age={max_age}) and no "
                    "window slot"
                )
        else:
            # no-oracle: exempt from freshness, but must be a KNOWN
            # quantity — some recorded row ever, or a designated twin
            twin = TWIN_EVIDENCE.get(name)
            if twin is not None:
                if not green.get(twin):
                    bad.append(
                        f"{name}: twin {twin!r} has no driver-green row"
                    )
            elif not recorded.get(name):
                bad.append(
                    f"{name}: no oracle, never recorded by the driver, "
                    "no window slot, and no TWIN_EVIDENCE entry"
                )
    return bad


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    registry = list(e.all_queries())
    window = list(e._DRIVER_WINDOW)
    oracle_keys = set(e.oracle_sql())
    bad = window_debt(registry, window, oracle_keys)
    green, _, current = load_green_history()
    n_never = sum(1 for n in registry if not green.get(n))
    n_oracle = sum(1 for n in registry if n in oracle_keys)
    # capacity: with max_age=2 every oracle-backed entry needs a slot
    # every other round, so steady-state demand is ceil(n_oracle/2);
    # the headroom is how many NEW queries future rounds can absorb
    steady = -(-n_oracle // 2)
    print(
        f"window_gate: round r{current}, registry {len(registry)}, "
        f"window {len(window)}, never-green {n_never}; steady-state "
        f"slot demand {steady}/50 (headroom ~{2 * (50 - steady)} more "
        "oracle-backed registry entries)"
    )
    for b in bad:
        print(f"  VIOLATION: {b}")
    print("window_gate:", "FAIL" if bad else "PASS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
