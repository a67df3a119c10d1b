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


def test_h5_direct_read_via_vendored_reader(spark, tmp_path):
    """Without h5py the .hdf5 path must still work end-to-end through
    the vendored hdf5lite reader (VERDICT r7 task 6)."""
    from tests.hdf5_writer import write_hdf5

    rng = np.random.default_rng(11)
    train = rng.normal(0, 1, (30, 6)).astype(np.float32)
    neigh = np.array([[i, (i + 1) % 30] for i in range(5)], dtype=np.int32)
    p = str(tmp_path / "synth.hdf5")
    write_hdf5(p, {"train": train, "neighbors": neigh})

    got = read_ann_benchmark(spark, p, "train").collect()
    assert len(got) == 30
    by_id = {r["id"]: r["vector"] for r in got}
    assert by_id[7] == pytest.approx(train[7].tolist())
    tr = {(r["query_id"], r["rank"]): r["id"]
          for r in read_ann_benchmark(spark, p, "neighbors").collect()}
    assert tr[(3, 2)] == 4


def test_h5_converter_via_vendored_reader(spark, tmp_path):
    """ann_benchmark_to_parquet over the shim: chunked conversion,
    parquet round-trip equals the source matrices."""
    from anndb_spark.sources.ann_benchmark import ann_benchmark_to_parquet
    from tests.hdf5_writer import write_hdf5

    rng = np.random.default_rng(12)
    parts = {
        "train": rng.normal(0, 1, (25, 4)).astype(np.float32),
        "test": rng.normal(0, 1, (7, 4)).astype(np.float32),
        "neighbors": rng.integers(0, 25, (7, 3)).astype(np.int32),
    }
    h5 = str(tmp_path / "synth.hdf5")
    write_hdf5(h5, parts)
    out = str(tmp_path / "converted")
    counts = ann_benchmark_to_parquet(spark, h5, out, chunk_rows=10)
    assert counts == {"train": 25, "test": 7, "neighbors": 7}
    vec = {r["id"]: r["vector"]
           for r in read_ann_benchmark(spark, out, "train").collect()}
    assert len(vec) == 25
    assert vec[13] == pytest.approx(parts["train"][13].tolist())


def test_h5_real_ann_benchmarks_file_if_present(spark):
    """Consume a REAL ann-benchmarks download when one exists on the
    host (skip-if-absent — the container ships none)."""
    import glob

    hits = sorted(
        glob.glob("/root/testdata/**/*.hdf5", recursive=True)
        + glob.glob("/root/data/**/*.hdf5", recursive=True)
    )
    if not hits:
        pytest.skip("no real ann-benchmarks .hdf5 on this host")
    df = read_ann_benchmark(spark, hits[0], "train")
    first = df.limit(5).collect()
    assert len(first) == 5 and len(first[0]["vector"]) >= 25


def test_bad_part_rejected(spark):
    with pytest.raises(ValueError, match="unknown part"):
        read_ann_benchmark(spark, "/nonexistent", "distances_wrong")
