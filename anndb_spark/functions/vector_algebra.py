"""Elementwise vector algebra as Catalyst column expressions.

Parity with the reference's vector library (`/root/reference/math/
vector.go:63-157`: add/sub/mul/div + scalar variants, dot, length,
zeros/ones) and its random test-vector generators (`math/random.go:31-53`
uniform / normal).  Everything stays JVM-side (higher-order array
functions → whole-stage codegen); no Python in the row loop, so these
compose freely with scans and filters at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "vec_add", "vec_sub", "vec_mul", "vec_div",
    "vec_scalar_add", "vec_scalar_sub", "vec_scalar_mul", "vec_scalar_div",
    "vec_dot", "vec_length", "vec_normalize",
    "vec_zeros", "vec_ones", "vec_fill",
    "vec_random_uniform", "vec_random_normal",
]


def vec_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def vec_sub(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x - y)


def vec_mul(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x * y)


def vec_div(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x / y)


def vec_scalar_add(a: Column, s) -> Column:
    return F.transform(a, lambda x: x + F.lit(s))


def vec_scalar_sub(a: Column, s) -> Column:
    return F.transform(a, lambda x: x - F.lit(s))


def vec_scalar_mul(a: Column, s) -> Column:
    return F.transform(a, lambda x: x * F.lit(s))


def vec_scalar_div(a: Column, s) -> Column:
    return F.transform(a, lambda x: x / F.lit(s))


def vec_dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential left fold, same order as the reference's
    scalar loop (`math/vector.go:118-127`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def vec_length(a: Column) -> Column:
    """L2 norm (`math/vector.go:129-137`)."""
    return F.sqrt(vec_dot(a, a))


def vec_normalize(a: Column) -> Column:
    n = vec_length(a)
    return F.transform(a, lambda x: x / n)


def vec_fill(dim: int, value) -> Column:
    return F.array_repeat(F.lit(value).cast("double"), dim)


def vec_zeros(dim: int) -> Column:
    return vec_fill(dim, 0.0)


def vec_ones(dim: int) -> Column:
    return vec_fill(dim, 1.0)


def vec_random_uniform(dim: int, lo: float = 0.0, hi: float = 1.0, seed: int | None = None) -> Column:
    """Per-row random uniform vector (`math/random.go:31-41`)."""
    rand = (lambda i: F.rand(seed + i)) if seed is not None else (lambda i: F.rand())
    return F.array(*[rand(i) * F.lit(hi - lo) + F.lit(lo) for i in range(dim)])


def vec_random_normal(dim: int, mean: float = 0.0, std: float = 1.0, seed: int | None = None) -> Column:
    """Per-row random normal vector (`math/random.go:43-53`)."""
    randn = (lambda i: F.randn(seed + i)) if seed is not None else (lambda i: F.randn())
    return F.array(*[randn(i) * F.lit(std) + F.lit(mean) for i in range(dim)])
