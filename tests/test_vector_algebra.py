"""Vector algebra column expressions vs NumPy recomputation
(the reference's math/vector_test.go pattern)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anndb_spark.functions import vector_algebra as va


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        ([-1.5, 0.0, 2.5], [2.0, -3.0, 0.5]),
    ]
    return spark.createDataFrame(rows, "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>").cache()


def _one(df, col):
    return [r[0] for r in df.select(col.alias("x")).collect()]


def test_elementwise_ops(df):
    rows = df.select("a", "b").collect()
    for op, npop in [
        (va.vec_add, np.add), (va.vec_sub, np.subtract),
        (va.vec_mul, np.multiply), (va.vec_div, np.divide),
    ]:
        got = _one(df, op(F.col("a"), F.col("b")))
        for g, r in zip(got, rows):
            assert np.allclose(g, npop(np.array(r.a), np.array(r.b)))


def test_scalar_ops(df):
    rows = df.select("a").collect()
    got = _one(df, va.vec_scalar_mul(F.col("a"), 2.5))
    for g, r in zip(got, rows):
        assert np.allclose(g, np.array(r.a) * 2.5)
    got = _one(df, va.vec_scalar_add(F.col("a"), -1.0))
    for g, r in zip(got, rows):
        assert np.allclose(g, np.array(r.a) - 1.0)


def test_dot_length_normalize(df):
    rows = df.select("a", "b").collect()
    dots = _one(df, va.vec_dot(F.col("a"), F.col("b")))
    for g, r in zip(dots, rows):
        assert abs(g - float(np.dot(r.a, r.b))) < 1e-12
    lens = _one(df, va.vec_length(F.col("a")))
    for g, r in zip(lens, rows):
        assert abs(g - float(np.linalg.norm(r.a))) < 1e-12
    norm = _one(df, va.vec_length(va.vec_normalize(F.col("a"))))
    assert all(abs(x - 1.0) < 1e-12 for x in norm)


def test_fill_and_random(df, spark):
    z = _one(df.limit(1), va.vec_zeros(5))
    assert z == [[0.0] * 5]
    o = _one(df.limit(1), va.vec_ones(3))
    assert o == [[1.0] * 3]
    base = spark.range(100)
    u = [r[0] for r in base.select(va.vec_random_uniform(4, 2.0, 5.0, seed=1).alias("v")).collect()]
    flat = [x for v in u for x in v]
    assert all(2.0 <= x < 5.0 for x in flat)
    n = [r[0] for r in base.select(va.vec_random_normal(8, 0.0, 1.0, seed=2).alias("v")).collect()]
    arr = np.array(n)
    assert arr.shape == (100, 8)
    assert abs(arr.mean()) < 0.2  # seeded, loose sanity
