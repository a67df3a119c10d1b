"""Property-based differential test: the relational CRUD automaton vs a
trivially-correct in-memory model, over random op sequences.

Mirrors the reference's single-source-of-truth state machine
(`storage/partition.go:435-474`): insert rejects when present, update/
delete reject when absent, update merges metadata keeping unwritten keys
(`storage/partition.go:349-367`), delete clears, level fixed by the
insert that created the current live segment.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from anndb_spark.operators.crud import (
    apply_changes_sql,
    split_rejects,
    split_state,
)

IDS = ["a", "b", "c"]
KEYS = ["k1", "k2"]

op_st = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.sampled_from(IDS),
    st.floats(min_value=-4, max_value=4, allow_nan=False).map(lambda x: round(x, 2)),
    st.dictionaries(st.sampled_from(KEYS), st.sampled_from(["u", "v", "w"]), max_size=2),
)


def model_apply(ops):
    """Reference semantics in plain Python."""
    state: dict[str, dict] = {}
    rejects = []
    for seq, (op, iid, val, md) in enumerate(ops):
        if op == "insert":
            if iid in state:
                rejects.append((seq, iid, op))
            else:
                state[iid] = {"vector": [val], "metadata": dict(md)}
        elif op == "update":
            if iid not in state:
                rejects.append((seq, iid, op))
            else:
                state[iid]["vector"] = [val]
                state[iid]["metadata"].update(md)  # merge, keep old keys
        else:  # delete
            if iid not in state:
                rejects.append((seq, iid, op))
            else:
                del state[iid]
    return state, rejects


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(op_st, min_size=1, max_size=24))
def test_crud_matches_model(spark, ops):
    rows = [
        (seq, iid, op, [val] if op != "delete" else None, md if op != "delete" else None)
        for seq, (op, iid, val, md) in enumerate(ops)
    ]
    changes = spark.createDataFrame(
        rows,
        "seq LONG, id STRING, op STRING, vector ARRAY<DOUBLE>, metadata MAP<STRING,STRING>",
    )
    applied = apply_changes_sql(None, changes)
    got_state = {
        r["id"]: {"vector": list(r["vector"]), "metadata": dict(r["metadata"] or {})}
        for r in split_state(applied).collect()
    }
    got_rejects = sorted(
        (r["seq"], r["id"], r["op"]) for r in split_rejects(applied).collect()
    )
    want_state, want_rejects = model_apply(ops)
    assert got_state == want_state
    assert got_rejects == sorted(want_rejects)
