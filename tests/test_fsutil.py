"""Filesystem abstraction for the serving paths: plain paths and
file:// URIs must behave identically (the object-store seam)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anndb_spark.sources import fsutil


def test_resolve_plain_and_uri(tmp_path):
    d = tmp_path / "x"
    d.mkdir()
    from pyarrow.fs import FileType

    for p in (str(d), f"file://{d}"):
        f, norm = fsutil.resolve_fs(p)
        assert f.get_file_info(norm).type == FileType.Directory


def test_resolve_unmountable_scheme_raises():
    with pytest.raises(ValueError, match="search_index"):
        fsutil.resolve_fs("nosuchscheme123://bucket/key")


def test_list_partition_values_and_join(tmp_path):
    for pid in (3, 0, 11):
        (tmp_path / f"partition_id={pid}").mkdir()
    (tmp_path / "partition_id=junk").mkdir()
    (tmp_path / "_SUCCESS").write_text("")
    for p in (str(tmp_path), f"file://{tmp_path}"):
        assert fsutil.list_partition_values(p, "partition_id=") == [0, 3, 11]
    assert fsutil.join("file:///a/b", "c=1") == "file:///a/b/c=1"
    assert fsutil.join("/a/b/", "c=1") == "/a/b/c=1"


def test_read_parquet_dir_and_schema(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"id": pa.array([1, 2], pa.int64()), "v": ["a", "b"]})
    pq.write_table(t, str(tmp_path / "part-0.parquet"))
    for p in (str(tmp_path), f"file://{tmp_path}"):
        got = fsutil.read_parquet_dir(p)
        assert got.num_rows == 2
        sch = fsutil.read_dir_schema(p)
        assert str(sch.field("id").type) == "int64"


def test_serving_paths_accept_file_uri(spark, tmp_path):
    """search_index_path and search_ivf_path must serve an index saved
    under a file:// URI — the layout a cluster actually deploys."""
    from anndb_spark.operators.hnsw import (
        HnswConfig,
        build_index,
        save_index,
        search_index,
        search_index_path,
    )
    from anndb_spark.operators.ivf import (
        assign_clusters,
        save_assigned,
        search_ivf,
        search_ivf_path,
        train_centroids,
    )

    rng = np.random.default_rng(9)
    n, dim = 400, 12
    rows = [
        (f"{i:032x}", rng.normal(0, 1, dim).tolist(), int(i % 4))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id STRING, vector ARRAY<FLOAT>, partition_id INT"
    )
    cfg = HnswConfig(m=8, ef_construction=60)
    idx = build_index(df, cfg)
    local = str(tmp_path / "idx")
    save_index(idx, local)
    queries = [(str(i), rng.normal(0, 1, dim).tolist()) for i in range(12)]
    expect = {
        (r["query_id"], r["rank"]): r["id"]
        for r in search_index_path(
            spark, local, queries, 5, ef=40, config=cfg
        ).collect()
    }
    via_uri = {
        (r["query_id"], r["rank"]): r["id"]
        for r in search_index_path(
            spark, f"file://{local}", queries, 5, ef=40, config=cfg
        ).collect()
    }
    assert via_uri == expect and len(expect) == 60

    emb = df.select("id", "vector")
    cent = train_centroids(emb, 4, sample_n=1000)
    assigned = assign_clusters(emb, cent)
    ivf_local = str(tmp_path / "ivf")
    save_assigned(assigned, ivf_local)
    got_local = {
        (r["query_id"], r["rank"]): r["id"]
        for r in search_ivf_path(
            spark, ivf_local, queries, 5, cent, nprobe=4
        ).collect()
    }
    got_uri = {
        (r["query_id"], r["rank"]): r["id"]
        for r in search_ivf_path(
            spark, f"file://{ivf_local}", queries, 5, cent, nprobe=4
        ).collect()
    }
    assert got_uri == got_local and len(got_local) == 60
