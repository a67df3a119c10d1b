"""Differential property test: asof_join vs pandas merge_asof (the
canonical as-of implementation) on randomized inputs.

merge_asof requires unique right times per key for deterministic
output — same contract as our operator — so the strategy draws
distinct timestamps per side and key."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from anndb_spark.operators.temporal import asof_join

_BASE = dt.datetime(2024, 1, 1)


def _frames(keys_l, keys_r):
    """keys_*: list[(key, sorted unique second-offsets)]"""
    lrows = [
        (k, _BASE + dt.timedelta(seconds=s), float(i))
        for i, (k, s) in enumerate(keys_l)
    ]
    rrows = [
        (k, _BASE + dt.timedelta(seconds=s), float(100 + i))
        for i, (k, s) in enumerate(keys_r)
    ]
    return lrows, rrows


pair_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)),
    min_size=1,
    max_size=25,
    unique=True,  # unique (key, time) on each side
)


def _model_sessions(rows, gap_s):
    """Pure-python sessionize model: rows = [(key, ts, value)]."""
    from collections import defaultdict

    per_key = defaultdict(list)
    for k, ts, v in rows:
        per_key[k].append((ts, v))
    out = {}
    for k, evs in per_key.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, v in evs:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                seq += 1
                out[(k, seq)] = [ts, ts, 0, 0.0]
            s = out[(k, seq)]
            s[1] = ts
            s[2] += 1
            s[3] += v
            prev = ts
    return {
        k: (v[0], v[1], v[2], round(v[3], 2)) for k, v in out.items()
    }


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    events=pair_st,
    gap_s=st.sampled_from([30, 120, 600]),
)
def test_sessionize_matches_model(spark, events, gap_s):
    from anndb_spark.operators.temporal import sessionize

    rows = [
        (k, _BASE + dt.timedelta(seconds=s), round(float(i) * 0.25, 2))
        for i, (k, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k LONG, ts TIMESTAMP, value DOUBLE")
    got = {
        (r["k"], r["session_seq"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["sum_value"], 2),
        )
        for r in sessionize(
            df, gap_seconds=gap_s, key_col="k", value_col="value"
        ).collect()
    }
    assert got == _model_sessions(rows, gap_s)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    left=pair_st,
    right=pair_st,
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 60.0]),
)
def test_asof_join_matches_merge_asof(spark, left, right, direction, tol):
    lrows, rrows = _frames(left, right)
    ldf = spark.createDataFrame(lrows, "k LONG, ts TIMESTAMP, lv DOUBLE")
    rdf = spark.createDataFrame(rrows, "k LONG, ts TIMESTAMP, rv DOUBLE")
    got = {
        (r["k"], r["ts"]): (r["right_ts"], r["right_rv"])
        for r in asof_join(
            ldf, rdf, on="ts", by="k",
            direction=direction, tolerance_seconds=tol,
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "rv"]).sort_values("ts")
    exp_df = pd.merge_asof(
        lpd,
        rpd.rename(columns={"ts": "right_ts", "rv": "right_rv"}),
        left_on="ts",
        right_on="right_ts",
        by="k",
        direction=direction,
        tolerance=(pd.Timedelta(seconds=tol) if tol is not None else None),
    )
    exp = {
        (row.k, row.ts.to_pydatetime()): (
            None if pd.isna(row.right_ts) else row.right_ts.to_pydatetime(),
            None if pd.isna(row.right_rv) else row.right_rv,
        )
        for row in exp_df.itertuples()
    }
    assert got == exp
