"""kNN physical-path router + connected-components dedup clusters."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anndb_spark.plans.planner import knn


@pytest.fixture(scope="module")
def small_vectors(spark):
    rng = np.random.default_rng(3)
    rows = [(str(i), rng.normal(0, 1, 8).tolist()) for i in range(500)]
    return spark.createDataFrame(rows, "id STRING, vector ARRAY<DOUBLE>").cache()


QUERIES = [("q0", [0.1] * 8), ("q1", [-0.2] * 8)]


def test_auto_routes_small_to_exact(small_vectors):
    plan, res = knn(small_vectors, QUERIES, 5)
    assert plan == "exact"
    assert res.count() == 10


def test_explicit_ivf_and_exact_agree(small_vectors):
    from anndb_spark.operators.ivf import train_centroids

    cent = train_centroids(small_vectors, 4, sample_n=500)
    plan, ivf_res = knn(small_vectors, QUERIES, 5, mode="ivf", centroids=cent, nprobe=4)
    assert plan == "ivf"
    _, exact_res = knn(small_vectors, QUERIES, 5, mode="exact")
    g = {(r.query_id, r.rank): r.id for r in ivf_res.collect()}
    w = {(r.query_id, r.rank): r.id for r in exact_res.collect()}
    assert g == w


def test_ann_mode_requires_index(small_vectors):
    with pytest.raises(ValueError):
        knn(small_vectors, QUERIES, 5, mode="ann")


def test_auto_prefers_index_when_large(spark, small_vectors):
    from anndb_spark.operators.hnsw import HnswConfig, build_index

    vecs = small_vectors.withColumn(
        "partition_id", F.pmod(F.xxhash64("id"), F.lit(2)).cast("int")
    )
    idx = build_index(vecs, HnswConfig(m=8, ef_construction=50))
    plan, res = knn(
        vecs, QUERIES, 5, mode="auto", index=idx, exact_max_rows=100,
        approx_row_count=500, ef=50,
    )
    assert plan == "ann"
    assert res.groupBy("query_id").count().select(F.min("count")).collect()[0][0] == 5


def test_dedup_clusters_components(spark):
    from anndb_spark.operators.dedup import dedup_clusters

    # components: {a,b,c} (chain), {x,y}, singleton pairs absent
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a STRING, id_b STRING"
    )
    got = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dedup_clusters_long_chain(spark):
    from anndb_spark.operators.dedup import dedup_clusters

    # 9-node path: propagation needs several rounds
    pairs = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(8)], "id_a STRING, id_b STRING"
    )
    got = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert set(got.values()) == {"n0"}
    assert len(got) == 9


def test_knn_filtered_exact_pushdown(spark, small_vectors):
    from anndb_spark.plans.planner import knn_filtered

    vecs = small_vectors.withColumn(
        "tag", F.when(F.col("id").cast("int") % 2 == 0, "even").otherwise("odd")
    )
    plan, res = knn_filtered(vecs, QUERIES, 5, F.col("tag") == "even")
    assert plan == "exact"
    ids = [r.id for r in res.collect()]
    assert all(int(i) % 2 == 0 for i in ids)


def test_knn_filtered_ivf_postfilter(spark, small_vectors):
    from anndb_spark.operators.ivf import train_centroids
    from anndb_spark.plans.planner import knn_filtered

    vecs = small_vectors.withColumn(
        "tag", F.when(F.col("id").cast("int") % 2 == 0, "even").otherwise("odd")
    )
    cent = train_centroids(small_vectors, 4, sample_n=500)
    plan, res = knn_filtered(
        vecs, QUERIES, 5, F.col("tag") == "even",
        mode="ivf", centroids=cent, nprobe=4, oversample=8,
    )
    assert plan == "ivf"
    rows = res.collect()
    assert all(int(r.id) % 2 == 0 for r in rows)
    # full probe + wide oversample: must equal exact-on-filtered
    _, exact = knn_filtered(vecs, QUERIES, 5, F.col("tag") == "even", mode="exact")
    g = {(r.query_id, r.rank): r.id for r in rows}
    w = {(r.query_id, r.rank): r.id for r in exact.collect()}
    assert g == w
