"""Distance kernels ("spaces") — Euclidean, Manhattan, Cosine.

Parity target: the reference's metric enum and kernels
(`index/space/space.go:15-17,34-74`, `index/space/native_impl.go:9-38`).
Note the reference's cosine distance is `abs(1 - a·b/(|a||b|))` — the
abs() wrapper (`index/space/space.go:68-70`) is replicated here.

Three implementations, fastest-appropriate picked per call-site:

1. ``distance_col`` — pure Catalyst column expressions built from
   higher-order array functions (``zip_with`` + ``aggregate``).  All
   arithmetic is cast to DOUBLE and folded strictly left-to-right, so
   the bit-exact same result is produced by the DuckDB SQL emitted by
   ``distance_sql`` (the correctness-oracle contract).  JVM-side,
   whole-stage-codegen'd, no Python in the loop.

2. ``distance_sql`` — emits the *same* computation as portable SQL text
   for either the ``spark`` or ``duckdb`` dialect (array indexing is the
   only divergence: ``element_at(v, i)`` vs ``v[i]``, both 1-based).
   Used by the oracle harness and by generated literal-query kNN SQL.

3. ``pairwise_distances_udf`` — Arrow-batched pandas UDF computing
   distances with NumPy in float32, the analogue of the reference's SIMD
   kernels (`simd/cpp/avx.cpp`): one BLAS-backed matrix operation per
   Arrow batch instead of per-element folds.  This is the 100 TB hot
   path; the column-expression form is the oracle-matched path.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

SPACES = ("euclidean", "manhattan", "cosine")


def _check_space(space: str) -> str:
    space = space.lower()
    if space not in SPACES:
        raise ValueError(f"unknown space {space!r}; expected one of {SPACES}")
    return space


# ---------------------------------------------------------------------------
# 1. Catalyst column expressions (oracle-exact: double, left fold)
# ---------------------------------------------------------------------------

def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    # strict left fold: ((0.0 + t1) + t2) + ... — same association as the
    # SQL emitted by distance_sql, so doubles are bit-identical.
    return F.aggregate(arr, F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def distance_col(a: Column, b: Column, space: str = "euclidean") -> Column:
    """Distance between two ARRAY<numeric> columns as a DOUBLE Column."""
    space = _check_space(space)
    da, db = _dbl(a), _dbl(b)
    if space == "euclidean":
        return F.sqrt(_fold_sum(F.zip_with(da, db, lambda x, y: (x - y) * (x - y))))
    if space == "manhattan":
        return _fold_sum(F.zip_with(da, db, lambda x, y: F.abs(x - y)))
    # cosine: abs(1 - dot/(|a|*|b|)) — abs per index/space/space.go:68-70
    dot = _fold_sum(F.zip_with(da, db, lambda x, y: x * y))
    na = F.sqrt(_fold_sum(F.zip_with(da, da, lambda x, y: x * y)))
    nb = F.sqrt(_fold_sum(F.zip_with(db, db, lambda x, y: x * y)))
    return F.abs(F.lit(1.0) - dot / (na * nb))


# ---------------------------------------------------------------------------
# 2. Dual-dialect SQL generation (oracle parity)
# ---------------------------------------------------------------------------

def _elem(vec_expr: str, i: int, dialect: str) -> str:
    """1-based element access, cast to double, per dialect."""
    if dialect == "spark":
        return f"CAST(element_at({vec_expr}, {i}) AS DOUBLE)"
    if dialect == "duckdb":
        return f"CAST({vec_expr}[{i}] AS DOUBLE)"
    raise ValueError(f"unknown dialect {dialect!r}")


# above this many terms the unrolled nested-binary fold exceeds
# DuckDB's binder recursion cap (128); switch to a flat list fold with
# the identical left-to-right association
_FOLD_UNROLL_MAX = 100


def _fold_sql(terms: Sequence[str], dialect: str = "duckdb") -> str:
    if len(terms) <= _FOLD_UNROLL_MAX:
        expr = "CAST(0.0 AS DOUBLE)"
        for t in terms:
            expr = f"({expr} + {t})"
        return expr
    # flat left fold: the list literal is one node with N children, and
    # list_reduce/aggregate applies (acc + x) first-to-last — the same
    # association as the unrolled form, so doubles stay bit-identical
    # (pinned by tests/test_spaces.py)
    lst = ", ".join(terms)
    if dialect == "duckdb":
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [{lst}]), "
            "(acc, x) -> acc + x)"
        )
    return (
        f"aggregate(array({lst}), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )


def _lit(v: float) -> str:
    # repr() round-trips doubles exactly; both parsers read nearest-double
    return f"CAST({float(v)!r} AS DOUBLE)"


def distance_sql(
    vec_expr: str,
    query: Sequence[float],
    space: str = "euclidean",
    dialect: str = "duckdb",
    components: Sequence[str] | None = None,
) -> str:
    """SQL text computing the distance between an array column (``vec_expr``,
    1-based indexable) — or explicit per-component SQL expressions
    (``components``, already-double) — and a literal query vector.

    The emitted arithmetic matches ``distance_col`` operation-for-operation
    (double casts, strict left fold) so Spark and DuckDB agree bitwise.
    """
    space = _check_space(space)
    if components is not None:
        elems = [f"CAST(({c}) AS DOUBLE)" for c in components]
    else:
        elems = [_elem(vec_expr, i + 1, dialect) for i in range(len(query))]
    qs = [_lit(q) for q in query]
    if len(elems) != len(qs):
        raise ValueError("component count != query dimension")

    if space == "euclidean":
        terms = [f"(({e} - {q}) * ({e} - {q}))" for e, q in zip(elems, qs)]
        return f"sqrt({_fold_sql(terms, dialect)})"
    if space == "manhattan":
        terms = [f"abs({e} - {q})" for e, q in zip(elems, qs)]
        return _fold_sql(terms, dialect)
    dot = _fold_sql([f"({e} * {q})" for e, q in zip(elems, qs)], dialect)
    na = f"sqrt({_fold_sql([f'({e} * {e})' for e in elems], dialect)})"
    nb = f"sqrt({_fold_sql([f'({q} * {q})' for q in qs], dialect)})"
    return f"abs(CAST(1.0 AS DOUBLE) - ({dot} / ({na} * {nb})))"


def pair_distance_sql(
    a_expr: str,
    b_expr: str,
    dim: int,
    space: str = "euclidean",
    dialect: str = "duckdb",
) -> str:
    """SQL text for the distance between two array columns of known
    dimension — unrolled with the same fold order as ``distance_col``."""
    space = _check_space(space)
    ea = [_elem(a_expr, i + 1, dialect) for i in range(dim)]
    eb = [_elem(b_expr, i + 1, dialect) for i in range(dim)]
    if space == "euclidean":
        terms = [f"(({a} - {b}) * ({a} - {b}))" for a, b in zip(ea, eb)]
        return f"sqrt({_fold_sql(terms, dialect)})"
    if space == "manhattan":
        return _fold_sql([f"abs({a} - {b})" for a, b in zip(ea, eb)], dialect)
    dot = _fold_sql([f"({a} * {b})" for a, b in zip(ea, eb)], dialect)
    na = f"sqrt({_fold_sql([f'({a} * {a})' for a in ea], dialect)})"
    nb = f"sqrt({_fold_sql([f'({b} * {b})' for b in eb], dialect)})"
    return f"abs(CAST(1.0 AS DOUBLE) - ({dot} / ({na} * {nb})))"


# ---------------------------------------------------------------------------
# 3. NumPy float32 kernels (perf path, reference-SIMD analogue)
# ---------------------------------------------------------------------------

def np_distances(mat: np.ndarray, query: np.ndarray, space: str) -> np.ndarray:
    """Vectorized float32 distances from every row of ``mat`` to ``query``.

    Float32 end-to-end like the reference kernels
    (`index/space/native_impl.go:9-38`).
    """
    space = _check_space(space)
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    query = np.asarray(query, dtype=np.float32)
    if space == "euclidean":
        diff = mat - query
        return np.sqrt(np.einsum("ij,ij->i", diff, diff, dtype=np.float32))
    if space == "manhattan":
        return np.abs(mat - query).sum(axis=1, dtype=np.float32)
    dot = mat @ query
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat, dtype=np.float32))
    qn = np.float32(np.sqrt(np.dot(query, query)))
    return np.abs(np.float32(1.0) - dot / (norms * qn))


def pairwise_distances_udf(space: str = "euclidean"):
    """Arrow-batched scalar pandas UDF: (vector, query) -> float distance.

    Use when both sides vary per-row; for a fixed query prefer
    ``np_distances`` inside mapInPandas which amortizes the query across
    the whole Arrow batch.
    """
    space = _check_space(space)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("float")
    def dist(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            am = np.array(a.tolist(), dtype=np.float32)
            bm = np.array(b.tolist(), dtype=np.float32)
            if space == "euclidean":
                d = np.sqrt(((am - bm) ** 2).sum(axis=1, dtype=np.float32))
            elif space == "manhattan":
                d = np.abs(am - bm).sum(axis=1, dtype=np.float32)
            else:
                dot = np.einsum("ij,ij->i", am, bm, dtype=np.float32)
                na = np.sqrt(np.einsum("ij,ij->i", am, am, dtype=np.float32))
                nb = np.sqrt(np.einsum("ij,ij->i", bm, bm, dtype=np.float32))
                d = np.abs(np.float32(1.0) - dot / (na * nb))
            yield pd.Series(d)

    return dist
