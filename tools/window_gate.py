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
          in some committed CORRECTNESS_r*.json) within its freshness
          horizon (``max_age`` rounds; see the retirement tier below).

No-oracle entries (recall metrics, ADC approximation legs) can never
produce a hash verdict, so spending window slots on them buys nothing;
they are exempt from freshness but still required to be *known* — the
gate fails on a no-oracle entry that has never had ANY driver row and
is not in the window, unless its name is in ``TWIN_EVIDENCE`` mapping
it to a hash-green exact twin.

Round-artifact safety (the r9 defect): every check is evaluated under
BOTH phase interpretations and passes if either holds —

  * build phase: all committed CORRECTNESS files are ship-time
    evidence; the window targets round ``newest + 1``.
  * judge phase: the newest CORRECTNESS file is the driver's
    evaluation OF the shipped window, so ship-time evidence was rounds
    ``<= newest - 1`` and the window targets round ``newest``.

Without this, the gates flip red the moment the driver writes the
current round's artifact (r9: ``corpus_cube_source_lang`` stayed red in
CORRECTNESS_r09, making it the sole never-green entry, which the shipped
window — ordered on r8 evidence — could not have put first).

Retirement tier (capacity policy): an oracle-backed entry with
``LONG_GREEN_THRESHOLD`` or more lifetime green rounds has proven its
plan and oracle stable; it rotates at half cadence
(``max_age = LONG_GREEN_MAX_AGE``) instead of the default 2.  This
keeps steady-state slot demand below the driver's 50-row cap as the
registry grows.  The gate FAILS outright when projected demand
(current steady-state + ``EXPECTED_NEW_PER_ROUND``) exceeds 50, forcing
retirement/merging BEFORE the contract breaks.

Run standalone (``python tools/window_gate.py``) or via pytest
(tests/test_window_gate.py).
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

DEFAULT_MAX_AGE = 2
# entries green in >= this many lifetime rounds are "long-green": their
# plan + oracle are proven stable, so they rotate at half cadence
LONG_GREEN_THRESHOLD = 4
LONG_GREEN_MAX_AGE = 4
# registry growth budget per round; capacity check reserves this much
EXPECTED_NEW_PER_ROUND = 6


def load_green_history(
    repo: str = REPO, max_round: int | None = None
) -> tuple[dict, dict, int]:
    """(green, recorded, current_round): per-query sets of rounds with a
    hash-green row / with any recorded row, and the round being built
    (newest considered CORRECTNESS file + 1).  ``max_round`` caps which
    artifacts count (judge-phase evaluation excludes the newest one)."""
    green: dict[str, set[int]] = {}
    recorded: dict[str, set[int]] = {}
    newest = 0
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
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


def entry_max_age(name: str, green: dict) -> int:
    """Freshness horizon for an entry: long-green entries rotate slower."""
    if len(green.get(name, ())) >= LONG_GREEN_THRESHOLD:
        return LONG_GREEN_MAX_AGE
    return DEFAULT_MAX_AGE


def steady_state_demand(registry, oracle_keys, green) -> int:
    """Window slots needed per round at steady state: one slot every
    max_age rounds per oracle-backed entry."""
    demand = 0.0
    for name in registry:
        if name in oracle_keys:
            demand += 1.0 / entry_max_age(name, green)
    return -int(-demand // 1)  # ceil


def window_debt(
    registry: list[str],
    window: list[str],
    oracle_keys: set[str],
    repo: str = REPO,
    max_round: int | None = None,
) -> list[str]:
    """Violation strings under ONE phase interpretation; empty = pass."""
    green, recorded, current = load_green_history(repo, max_round=max_round)
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
            max_age = entry_max_age(name, green)
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
    # capacity: fail BEFORE the rotation contract becomes unsatisfiable
    demand = steady_state_demand(registry, oracle_keys, green)
    if demand + EXPECTED_NEW_PER_ROUND > 50:
        bad.append(
            f"capacity: steady-state demand {demand} + "
            f"{EXPECTED_NEW_PER_ROUND} expected new > 50 — retire or "
            "merge long-green entries (see __spark_entry__ docstring)"
        )
    return bad


def window_debt_round_safe(
    registry: list[str],
    window: list[str],
    oracle_keys: set[str],
    repo: str = REPO,
) -> list[str]:
    """Debt under build-phase OR judge-phase interpretation; empty if
    either passes (the committed window is valid in whichever phase the
    tree is actually in)."""
    bad_build = window_debt(registry, window, oracle_keys, repo)
    if not bad_build:
        return []
    _, _, current = load_green_history(repo)
    newest = current - 1
    if newest >= 1:
        bad_judge = window_debt(
            registry, window, oracle_keys, repo, max_round=newest - 1
        )
        if not bad_judge:
            return []
    return bad_build


def _order_ok(
    window: list[str],
    oracle_keys: set[str],
    repo: str = REPO,
    max_round: int | None = None,
) -> bool:
    green, _, _ = load_green_history(repo, max_round=max_round)
    never = [n for n in window if n in oracle_keys and not green.get(n)]
    head = window[: len(never)]
    return set(never) <= set(head)


def never_green_order_ok(
    window: list[str], oracle_keys: set[str], repo: str = REPO
) -> bool:
    """Never-driver-green entries must lead the window — evaluated under
    either phase interpretation (the r9 test defect: the shipped order
    was judged against evidence that did not exist at ship time)."""
    if _order_ok(window, oracle_keys, repo):
        return True
    _, _, current = load_green_history(repo)
    newest = current - 1
    return newest >= 1 and _order_ok(
        window, oracle_keys, repo, max_round=newest - 1
    )


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    registry = list(e.all_queries())
    window = list(e._DRIVER_WINDOW)
    oracle_keys = set(e.oracle_sql())
    bad = window_debt_round_safe(registry, window, oracle_keys)
    green, _, current = load_green_history()
    n_never = sum(1 for n in registry if not green.get(n))
    n_oracle = sum(1 for n in registry if n in oracle_keys)
    n_long = sum(
        1
        for n in registry
        if n in oracle_keys and entry_max_age(n, green) == LONG_GREEN_MAX_AGE
    )
    demand = steady_state_demand(registry, oracle_keys, green)
    print(
        f"window_gate: round r{current}, registry {len(registry)}, "
        f"window {len(window)}, never-green {n_never}, long-green "
        f"{n_long}/{n_oracle} oracle-backed; steady-state slot demand "
        f"{demand}/50 (capacity fails above {50 - EXPECTED_NEW_PER_ROUND})"
    )
    if not never_green_order_ok(window, oracle_keys):
        bad = list(bad) + ["window order: never-green entries do not lead"]
    for b in bad:
        print(f"  VIOLATION: {b}")
    print("window_gate:", "FAIL" if bad else "PASS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
