"""Deterministic generator tests — cross-engine bit-equality (DuckDB),
distribution sanity, and repartition-stability.

Mirrors the reference's generator tests conceptually
(`math/random.go:31-53` has no unit tests; distribution checks here
play the role its benchmark usage plays)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from anndb_spark.functions.generators import (
    normal_sql,
    random_vector_cols,
    uniform_sql,
    with_random_vector,
)


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "k")


def test_uniform_matches_duckdb_bitwise(spark, keys_df):
    got = (
        keys_df.select("k", F.expr(uniform_sql("k", "s0", dialect="spark")).alias("u"))
        .orderBy("k")
        .toPandas()
    )
    want = duckdb.sql(
        f"SELECT k, {uniform_sql('k', 's0', dialect='duckdb')} AS u "
        "FROM (SELECT unnest(range(2000)) k) ORDER BY k"
    ).df()
    assert (got["u"].to_numpy() == want["u"].to_numpy()).all()


def test_normal_matches_duckdb_bitwise(spark, keys_df):
    got = (
        keys_df.limit(300)
        .select("k", F.expr(normal_sql("k", "n0", mu=2.0, sigma=3.0)).alias("z"))
        .orderBy("k")
        .toPandas()
    )
    want = duckdb.sql(
        f"SELECT k, {normal_sql('k', 'n0', mu=2.0, sigma=3.0, dialect='duckdb')} AS z "
        "FROM (SELECT unnest(range(300)) k) ORDER BY k"
    ).df()
    assert (got["z"].to_numpy() == want["z"].to_numpy()).all()


def test_uniform_distribution_bounds(spark, keys_df):
    u = (
        keys_df.select(F.expr(uniform_sql("k", "d1", lo=-2.0, hi=4.0)).alias("u"))
        .toPandas()["u"]
        .to_numpy()
    )
    assert u.min() >= -2.0 and u.max() < 4.0
    assert abs(u.mean() - 1.0) < 0.2  # E = (lo+hi)/2 = 1


def test_normal_distribution_moments(spark, keys_df):
    z = (
        keys_df.select(F.expr(normal_sql("k", "d2")).alias("z"))
        .toPandas()["z"]
        .to_numpy()
    )
    assert abs(z.mean()) < 0.1
    assert abs(z.std() - 1.0) < 0.1


def test_vector_stable_under_repartition(spark, keys_df):
    a = (
        with_random_vector(keys_df, "k", 8, seed=7)
        .orderBy("k")
        .toPandas()["vector"]
    )
    b = (
        with_random_vector(keys_df.repartition(13), "k", 8, seed=7)
        .orderBy("k")
        .toPandas()["vector"]
    )
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_components_differ_by_index_and_seed(spark, keys_df):
    cols = random_vector_cols("k", 3, seed=1)
    other = random_vector_cols("k", 3, seed=2)
    row = (
        keys_df.limit(1)
        .select(*[F.expr(c).alias(f"c{i}") for i, c in enumerate(cols + other)])
        .collect()[0]
    )
    vals = [row[f"c{i}"] for i in range(6)]
    assert len(set(vals)) == 6
