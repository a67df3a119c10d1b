"""ann-benchmarks source tests — matrix→DataFrame plumbing, parquet
round-trip contract, recall join compatibility, and the h5py gate."""

import numpy as np
import pytest

from anndb_spark.sources.ann_benchmark import (
    matrix_to_df,
    neighbors_to_df,
    read_ann_benchmark,
)


def test_matrix_to_df_contract(spark):
    mat = np.arange(12, dtype=np.float32).reshape(4, 3)
    df = matrix_to_df(spark, mat, "train")
    assert df.schema.simpleString() == "struct<id:bigint,vector:array<float>>"
    rows = {r["id"]: r["vector"] for r in df.collect()}
    assert rows[2] == pytest.approx([6.0, 7.0, 8.0])


def test_neighbors_long_form_ranks(spark):
    neigh = np.array([[5, 3, 9], [1, 0, 7]])
    df = neighbors_to_df(spark, neigh)
    got = {(r["query_id"], r["rank"]): r["id"] for r in df.collect()}
    assert got[(0, 1)] == 5 and got[(0, 3)] == 9 and got[(1, 2)] == 0


def test_parquet_round_trip_and_recall_join(spark, tmp_path):
    rng = np.random.default_rng(5)
    train = rng.normal(0, 1, (50, 8)).astype(np.float32)
    test = train[:4] + rng.normal(0, 0.01, (4, 8)).astype(np.float32)
    out = str(tmp_path / "synth")
    matrix_to_df(spark, train, "train").write.parquet(f"{out}/train.parquet")
    matrix_to_df(spark, test, "test").write.parquet(f"{out}/test.parquet")
    neighbors_to_df(spark, np.array([[i] for i in range(4)])).write.parquet(
        f"{out}/neighbors.parquet"
    )

    from anndb_spark.operators.knn import knn_exact
    from anndb_spark.operators.recall import recall_avg

    vecs = read_ann_benchmark(spark, out, "train")
    queries = read_ann_benchmark(spark, out, "test")
    truth = read_ann_benchmark(spark, out, "neighbors")
    res = knn_exact(vecs, queries, 1)
    r = recall_avg(res, truth, 1).collect()[0]["avg_recall"]
    assert r == 1.0  # each query's nearest train row is its own source row


def test_h5_requires_h5py_or_gates(spark, tmp_path):
    try:
        import h5py  # noqa: F401

        pytest.skip("h5py installed; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="ann_benchmark_to_parquet"):
        read_ann_benchmark(spark, str(tmp_path / "x.hdf5"), "train")


def test_bad_part_rejected(spark):
    with pytest.raises(ValueError, match="unknown part"):
        read_ann_benchmark(spark, "/nonexistent", "distances_wrong")
