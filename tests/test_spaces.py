"""Kernel exactness tests, mirroring the reference's
`index/space/native_impl_test.go` / `avx_impl_test.go` — including the
hand-computed cases and odd ("unaligned") dimensions."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from anndb_spark.functions.spaces import distance_col, distance_sql, np_distances


def _dist(spark, a, b, space):
    df = spark.createDataFrame([(a, b)], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    return df.select(distance_col(F.col("a"), F.col("b"), space).alias("d")).collect()[0]["d"]


def test_euclidean_handcomputed(spark):
    # avx_impl_test.go:11-24: d({1,1,1,1,1,0,0,2}, 0) = 3
    a = [1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 2.0]
    assert _dist(spark, a, [0.0] * 8, "euclidean") == 3.0


def test_manhattan_handcomputed(spark):
    # d({1..8}, 0) = 36
    a = [float(i) for i in range(1, 9)]
    assert _dist(spark, a, [0.0] * 8, "manhattan") == 36.0


def test_cosine_orthogonal_and_abs(spark):
    assert _dist(spark, [1.0, 0.0], [0.0, 1.0], "cosine") == 1.0
    # abs() wrapper (space.go:68-70): anti-parallel gives |1-(-1)| = 2
    assert _dist(spark, [1.0, 0.0], [-1.0, 0.0], "cosine") == 2.0
    assert _dist(spark, [1.0, 2.0], [2.0, 4.0], "cosine") == pytest.approx(0.0, abs=1e-12)


@pytest.mark.parametrize("dim", [3, 5, 8, 25])  # odd dims = "unaligned" tail path
@pytest.mark.parametrize("space", ["euclidean", "manhattan", "cosine"])
def test_matches_numpy_all_dims(spark, dim, space):
    rng = np.random.default_rng(42 + dim)
    a = rng.normal(0, 10, dim).tolist()
    b = rng.normal(0, 10, dim).tolist()
    got = _dist(spark, a, b, space)
    av, bv = np.array(a), np.array(b)
    if space == "euclidean":
        want = float(np.sqrt(((av - bv) ** 2).sum()))
    elif space == "manhattan":
        want = float(np.abs(av - bv).sum())
    else:
        want = abs(1 - float(av @ bv) / (np.linalg.norm(av) * np.linalg.norm(bv)))
    assert got == pytest.approx(want, rel=1e-12)


def test_distance_sql_matches_distance_col(spark):
    """Spark-dialect SQL text and the Column implementation agree bitwise."""
    q = [1.5, -2.25, 3.0, 0.125, 7.5]
    df = spark.createDataFrame([([3.0, 1.0, -2.0, 5.5, 0.25],)], "v ARRAY<DOUBLE>")
    for space in ["euclidean", "manhattan", "cosine"]:
        sql = distance_sql("v", q, space=space, dialect="spark")
        via_sql = df.select(F.expr(sql).alias("d")).collect()[0]["d"]
        qlit = F.array(*[F.lit(x).cast("double") for x in q])
        via_col = df.select(distance_col(F.col("v"), qlit, space).alias("d")).collect()[0]["d"]
        assert via_sql == via_col  # bit-identical


def test_np_distances_float32():
    mat = np.array([[1, 1, 1, 1, 1, 0, 0, 2], [0] * 8], dtype=np.float32)
    q = np.zeros(8, dtype=np.float32)
    d = np_distances(mat, q, "euclidean")
    assert d.dtype == np.float32
    assert d[0] == np.float32(3.0) and d[1] == np.float32(0.0)
    d = np_distances(mat, np.ones(8, dtype=np.float32), "manhattan")
    assert d[0] == np.float32(3.0) and d[1] == np.float32(8.0)


def test_wide_dim_fold_sql_bitwise_parity(spark):
    """Above _FOLD_UNROLL_MAX terms distance_sql switches to a flat
    list fold (DuckDB's binder recursion cap rejects 128+ nested '+').
    All three forms — Spark Column, Spark-dialect SQL (aggregate fold),
    DuckDB SQL (list_reduce fold) — must stay bit-identical."""
    import duckdb

    dim = 192
    vec = [((i * 31) % 17 - 8) / 16.0 for i in range(dim)]
    q = [((i * 7) % 13 - 6) / 8.0 for i in range(dim)]
    df = spark.createDataFrame([(vec,)], "v ARRAY<DOUBLE>")
    con = duckdb.connect()
    for space in ["euclidean", "manhattan", "cosine"]:
        qlit = F.array(*[F.lit(x).cast("double") for x in q])
        via_col = df.select(
            distance_col(F.col("v"), qlit, space).alias("d")
        ).collect()[0]["d"]
        s_sql = distance_sql("v", q, space=space, dialect="spark")
        assert "aggregate(array(" in s_sql  # the flat form kicked in
        via_spark_sql = df.select(F.expr(s_sql).alias("d")).collect()[0]["d"]
        d_sql = distance_sql("v", q, space=space, dialect="duckdb")
        assert "list_reduce" in d_sql
        via_duck = con.execute(
            f"SELECT {d_sql} AS d FROM (SELECT ? AS v)", [vec]
        ).fetchone()[0]
        assert via_col == via_spark_sql == via_duck, space
