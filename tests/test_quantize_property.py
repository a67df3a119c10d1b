"""Property-based parity for the 1-bit signature twins: the Python
packer (used for literal query vectors) and the DuckDB SQL packer (the
correctness oracle) must agree with each other bit-for-bit at ANY dim
and any float values — including zeros (sign(0) packs as 0), negative
zeros, denormals and non-word-aligned dims.  The Spark column twin is
pinned against these at fixed dims in test_quantize (Spark-per-example
is too slow for hypothesis)."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from anndb_spark.functions.quantize import (
    BQ_WORD_BITS,
    sign_bits_py,
    sign_bits_sql,
    sign_words_py,
    sign_words_sql,
)


# ONE process-wide connection: a connect() per hypothesis example (the
# original shape) allocates a fresh native instance each time, which
# under full-suite memory pressure (Spark JVM resident) can fail
# transiently — hypothesis then reports the passing replay as Flaky.
_CON = duckdb.connect()

floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=64
) | st.sampled_from([0.0, -0.0, 5e-324, -5e-324, 1e-300])


@settings(max_examples=40, deadline=None)
@given(st.lists(floats, min_size=1, max_size=200))
def test_sign_words_py_matches_duckdb(vec):
    con = _CON
    dim = len(vec)
    py = sign_words_py(vec, dim)
    duck = con.execute(
        f"SELECT {sign_words_sql('v', dim)} FROM (SELECT ? AS v)", [vec]
    ).fetchone()[0]
    assert list(duck) == py
    assert len(py) == -(-dim // BQ_WORD_BITS)
    assert all(0 <= w < 2**BQ_WORD_BITS for w in py)


@settings(max_examples=40, deadline=None)
@given(st.lists(floats, min_size=1, max_size=64))
def test_sign_bits_py_matches_duckdb(vec):
    con = _CON
    dim = len(vec)
    plo, phi = sign_bits_py(vec)
    lo_sql, hi_sql = sign_bits_sql("v", dim)
    dlo, dhi = con.execute(
        f"SELECT {lo_sql}, {hi_sql} FROM (SELECT ? AS v)", [vec]
    ).fetchone()
    assert (dlo, dhi) == (plo, phi)
