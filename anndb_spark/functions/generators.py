"""Deterministic random vector generators (test-data workloads).

Parity target: the reference's uniform / normal random-vector helpers
used to drive its tests and benchmarks
(`/root/reference/math/random.go:31-53`: `RandomUniformVector`,
`RandomStdNormalVector`, `RandomNormalVector(mu, sigma)`).

Spark-first twist: instead of stateful PRNG streams (which are not
reproducible across partitionings — `F.rand(seed)` changes values when
the partition layout changes), randomness is derived *per key*: a
counter-based generator `u = md5(key ':' salt)[0:8] / 2^32`.  That makes
generation

- a pure column expression (whole-stage codegen, no Python, no state),
- stable under repartitioning / retries / AQE re-plans, and
- bit-reproducible in any engine with md5 — the DuckDB oracle emits the
  same values, so generated data is itself oracle-checkable.

The normal variant is the Irwin–Hall CLT approximation
(sum of 12 uniforms − 6), chosen over Box–Muller deliberately: it needs
only +/−/* (IEEE-exact, order-fixed ⇒ bit-identical across engines),
whereas log/cos are not correctly-rounded and may differ in the last ulp
between libms.  Moments match N(0,1) exactly (mean 0, variance 1);
tails are truncated at ±6σ — fine for test-data generation, documented
as an intentional divergence from Go's `rand.NormFloat64`.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "uniform_sql",
    "normal_sql",
    "uniform_col",
    "normal_col",
    "random_vector_cols",
    "with_random_vector",
]

_TWO32 = "4294967296.0"


def _u32_sql(key_expr: str, salt: str, dialect: str) -> str:
    """Integer in [0, 2^32) from md5(key ':' salt), as exact-double SQL."""
    cast_t = "STRING" if dialect == "spark" else "VARCHAR"
    h = f"substr(md5(concat(CAST(({key_expr}) AS {cast_t}), ':{salt}')), 1, 8)"
    if dialect == "spark":
        return f"CAST(conv({h}, 16, 10) AS DOUBLE)"
    if dialect == "duckdb":
        # no conv(): horner-evaluate the 8 hex digits
        terms = []
        for p in range(1, 9):
            d = f"(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)"
            terms.append(f"({d} * {16 ** (8 - p)}.0)" if p < 8 else d)
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return f"CAST({out} AS DOUBLE)"
    raise ValueError(f"unknown dialect {dialect!r}")


def uniform_sql(
    key_expr: str,
    salt: str,
    lo: float = 0.0,
    hi: float = 1.0,
    dialect: str = "spark",
) -> str:
    """SQL for a deterministic uniform double in [lo, hi) keyed on
    (key, salt) — bit-identical between the spark and duckdb dialects."""
    u = f"({_u32_sql(key_expr, salt, dialect)} / {_TWO32})"
    if (lo, hi) == (0.0, 1.0):
        return u
    return (
        f"(CAST({_lit(lo)} AS DOUBLE) + "
        f"(CAST({_lit(hi)} AS DOUBLE) - CAST({_lit(lo)} AS DOUBLE)) * {u})"
    )


def normal_sql(
    key_expr: str,
    salt: str,
    mu: float = 0.0,
    sigma: float = 1.0,
    dialect: str = "spark",
) -> str:
    """SQL for a deterministic ~N(mu, sigma) double (Irwin–Hall of 12
    uniforms, strict left-fold addition for cross-engine bit-equality)."""
    acc = uniform_sql(key_expr, f"{salt}.0", dialect=dialect)
    for j in range(1, 12):
        acc = f"({acc} + {uniform_sql(key_expr, f'{salt}.{j}', dialect=dialect)})"
    z = f"({acc} - 6.0)"
    if (mu, sigma) == (0.0, 1.0):
        return z
    return f"(CAST({_lit(mu)} AS DOUBLE) + CAST({_lit(sigma)} AS DOUBLE) * {z})"


def _lit(x: float) -> str:
    return repr(float(x))


def uniform_col(key: str, salt: str, lo: float = 0.0, hi: float = 1.0) -> Column:
    return F.expr(uniform_sql(key, salt, lo, hi, dialect="spark"))


def normal_col(key: str, salt: str, mu: float = 0.0, sigma: float = 1.0) -> Column:
    return F.expr(normal_sql(key, salt, mu, sigma, dialect="spark"))


def random_vector_cols(
    key_expr: str,
    dim: int,
    dist: str = "uniform",
    seed: int = 0,
    dialect: str = "spark",
    **params,
) -> list[str]:
    """Per-component SQL expressions for a dim-d random vector keyed on
    ``key_expr``.  dist: 'uniform' (lo/hi) or 'normal' (mu/sigma)."""
    if dist == "uniform":
        return [
            uniform_sql(
                key_expr,
                f"{seed}:{i}",
                params.get("lo", 0.0),
                params.get("hi", 1.0),
                dialect,
            )
            for i in range(dim)
        ]
    if dist == "normal":
        return [
            normal_sql(
                key_expr,
                f"{seed}:{i}",
                params.get("mu", 0.0),
                params.get("sigma", 1.0),
                dialect,
            )
            for i in range(dim)
        ]
    raise ValueError(f"unknown dist {dist!r}")


def with_random_vector(
    df: DataFrame,
    key_col: str,
    dim: int,
    dist: str = "uniform",
    seed: int = 0,
    out_col: str = "vector",
    **params,
) -> DataFrame:
    """Append ``out_col ARRAY<DOUBLE>``: a deterministic per-key random
    vector.  Stable under repartitioning; rebuildable bit-exactly."""
    comps = random_vector_cols(key_col, dim, dist, seed, "spark", **params)
    return df.withColumn(out_col, F.array(*[F.expr(c) for c in comps]))
