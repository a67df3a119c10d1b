"""End-to-end lifecycle tests for the Dataset façade — the reference's
client workflow (create → insert → search → update → remove → search)
run against the batch engine, mirroring the service-level behavior the
reference leaves untested (`SURVEY.md §5.6`)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anndb_spark.dataset import AnnDB


@pytest.fixture()
def db(spark, tmp_path):
    return AnnDB(spark, str(tmp_path / "db"))


def _vec_rows(spark, n, dim, seed=0, prefix="v"):
    rng = np.random.default_rng(seed)
    rows = [
        (f"{prefix}{i:04d}", rng.normal(0, 1, dim).tolist(), {"k": str(i)})
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "id STRING, vector ARRAY<DOUBLE>, metadata MAP<STRING,STRING>"
    )


def test_create_get_list_delete(db):
    db.create_dataset("a", dimension=4, partition_count=2)
    db.create_dataset("b", dimension=8)
    assert {r["name"] for r in db.list_datasets().collect()} == {"a", "b"}
    assert db.get_dataset("a").meta.dimension == 4
    db.delete_dataset("a")
    assert {r["name"] for r in db.list_datasets().collect()} == {"b"}
    with pytest.raises(ValueError, match="not found"):
        db.get_dataset("a")
    with pytest.raises(ValueError, match="already exists"):
        db.create_dataset("b", dimension=8)


def test_insert_compact_search_lifecycle(spark, db):
    ds = db.create_dataset("vecs", dimension=8, partition_count=2)
    rows, df = _vec_rows(spark, 80, 8, seed=1)
    ds.insert(df)
    # one bad-dimension row → reject, not state
    bad = spark.createDataFrame(
        [("bad1", [1.0, 2.0], {"x": "y"})],
        "id STRING, vector ARRAY<DOUBLE>, metadata MAP<STRING,STRING>",
    )
    ds.insert(bad)
    rejects = ds.compact()
    assert [(r["id"], r["error"]) for r in rejects.collect()] == [
        ("bad1", "DIMENSION_MISMATCH")
    ]
    assert ds.len() == 80
    assert ds.bytes_size() > 80 * 32

    # exact search matches NumPy brute force
    q = rows[7][1]
    got = [r["id"] for r in ds.search(q, 5).orderBy("rank").collect()]
    mat = np.array([v for _, v, _ in rows])
    d = np.sqrt(((mat - np.array(q)) ** 2).sum(axis=1))
    want = [rows[i][0] for i in np.argsort(d, kind="stable")[:5]]
    assert got == want
    assert got[0] == rows[7][0]

    # point get returns merged row
    row = ds.get(rows[3][0])
    assert row is not None and row["metadata"]["k"] == "3"


def test_update_merges_metadata_and_remove_tombstones(spark, db):
    ds = db.create_dataset("m", dimension=4, partition_count=2)
    ds.insert(
        spark.createDataFrame(
            [("a", [1.0, 0.0, 0.0, 0.0], {"keep": "1", "old": "x"})],
            "id STRING, vector ARRAY<DOUBLE>, metadata MAP<STRING,STRING>",
        )
    )
    ds.compact()
    ds.update(
        spark.createDataFrame(
            [("a", [0.0, 1.0, 0.0, 0.0], {"old": "y", "new": "z"})],
            "id STRING, vector ARRAY<DOUBLE>, metadata MAP<STRING,STRING>",
        )
    )
    ds.compact()
    row = ds.get("a")
    # metadata merge keeps old keys unless overwritten (storage/partition.go:349-367)
    assert row["metadata"] == {"keep": "1", "old": "y", "new": "z"}
    assert row["vector"] == [0.0, 1.0, 0.0, 0.0]

    ds.remove(["a"])
    ds.compact()
    assert ds.get("a") is None and ds.len() == 0


def test_ann_search_after_build_index(spark, db):
    ds = db.create_dataset("ann", dimension=16, partition_count=2)
    rows, df = _vec_rows(spark, 300, 16, seed=3)
    ds.insert(df)
    ds.compact()
    ds.build_index()
    assert ds.index() is not None
    got = ds.search(rows[11][1], 10, mode="ann").orderBy("rank").collect()
    ids = [r["id"] for r in got]
    mat = np.array([v for _, v, _ in rows])
    d = np.sqrt(((mat - np.array(rows[11][1])) ** 2).sum(axis=1))
    want = {rows[i][0] for i in np.argsort(d, kind="stable")[:10]}
    # recall ≥ 0.9 at this size (reference achieves ~0.94 @ M=16, §6)
    assert len(set(ids) & want) >= 9


def test_search_with_metadata(spark, db):
    """with_metadata returns the full SearchResultItem contract
    (protobuf/proto/search.proto:22-26): id, metadata, score."""
    ds = db.create_dataset("wm", dimension=4, partition_count=2)
    rows, df = _vec_rows(spark, 40, 4, seed=9)
    ds.insert(df)
    ds.compact()
    got = ds.search(rows[5][1], 3, with_metadata=True).orderBy("rank").collect()
    assert len(got) == 3
    assert got[0]["id"] == rows[5][0]
    by_id = {r_id: m for r_id, _, m in rows}
    for r in got:
        assert r["metadata"] == by_id[r["id"]]


def test_append_seq_deterministic_and_distributed(spark, db):
    """seq assignment is (a) a batch-unique deterministic total order —
    identical across reruns and input partitionings — and (b) computed
    without funneling the batch through one task (the bucketed
    row_number + offsets plan, VERDICT r3 wrong #1)."""
    ds = db.create_dataset("seqd", dimension=4, partition_count=2)
    _, df = _vec_rows(spark, 200, 4, seed=11)
    ds.insert(df)
    first = {
        r["id"]: r["seq"] for r in ds._changes().select("id", "seq").collect()
    }
    assert sorted(first.values()) == list(range(200))  # dense, unique, 0-based

    # rerun the same batch under a different physical layout → same seqs
    # (relative to the new offset): seq is a pure function of the id set
    ds2 = db.create_dataset("seqd2", dimension=4, partition_count=2)
    ds2.insert(df.repartition(7))
    second = {
        r["id"]: r["seq"] for r in ds2._changes().select("id", "seq").collect()
    }
    assert second == first

    # appends stack: next batch starts at max(seq) + 1
    _, df2 = _vec_rows(spark, 30, 4, seed=12, prefix="w")
    ds.insert(df2)
    seqs = [r["seq"] for r in ds._changes().select("seq").collect()]
    assert sorted(seqs) == list(range(230))

    # plan shape: no single-partition Exchange over the incoming batch —
    # the only SinglePartition exchange allowed is the ≤n_buckets-row
    # offsets aggregate (its child is an Aggregate, not the batch scan)
    import io
    from contextlib import redirect_stdout

    offset = ds._next_seq()
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keyed = df.select(F.col("id").cast("string").alias("id")).withColumn(
        "_bucket", F.pmod(F.xxhash64("id"), F.lit(n_buckets)).cast("int")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_bucket").orderBy("id")
    plan_df = keyed.withColumn("_rank", F.row_number().over(w))
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    assert "SinglePartition" not in buf.getvalue()


def test_pending_changes_invisible_until_compact(spark, db):
    ds = db.create_dataset("pend", dimension=4)
    ds.insert(
        spark.createDataFrame(
            [("p1", [0.0, 0.0, 0.0, 0.0], None)],
            "id STRING, vector ARRAY<DOUBLE>, metadata MAP<STRING,STRING>",
        )
    )
    assert ds.len() == 0  # changelog not yet folded
    ds.compact()
    assert ds.len() == 1


def test_remove_tombstones_index_without_rebuild(spark, db):
    """remove() on an indexed dataset tombstones the materialized index
    immediately — ANN search excludes deleted ids before any compaction
    or rebuild (reference Remove semantics, index/hnsw.go:164-214)."""
    from pyspark.sql import functions as F2

    ds = db.create_dataset("tomb", dimension=8, partition_count=2)
    rows, df = _vec_rows(spark, 120, 8, seed=21)
    ds.insert(df)
    ds.compact()
    ds.build_index()
    idx_before = ds.index()
    verts_before = idx_before.filter(F2.col("kind") == "vertex").count()

    victim = rows[7][0]
    near = ds.search(rows[7][1], 3, mode="ann").orderBy("rank").collect()
    assert near[0]["id"] == victim

    ds.remove([victim])  # no compact, no rebuild
    idx_after = ds.index()
    # graph untouched, one tombstone added
    assert idx_after.filter(F2.col("kind") == "vertex").count() == verts_before
    assert [
        r["src"] for r in idx_after.filter(F2.col("kind") == "tomb").collect()
    ] == [victim]
    got = ds.search(rows[7][1], 3, mode="ann").orderBy("rank").collect()
    assert victim not in {r["id"] for r in got} and len(got) == 3


def test_search_runs_no_count_job_after_first(spark, db, monkeypatch):
    """The planner's auto-mode size check must not launch a count job per
    search: the facade caches the state-table row count for the
    compaction epoch (VERDICT r4 wrong #3)."""
    import pyspark.sql

    ds = db.create_dataset("nocount", dimension=8, partition_count=2)
    rows, df = _vec_rows(spark, 60, 8, seed=33)
    ds.insert(df)
    ds.compact()
    ds.build_index()
    q = rows[3][1]
    first = ds.search(q, 5).orderBy("rank").collect()  # warms the cache
    assert first[0]["id"] == rows[3][0]

    def boom(self):
        raise AssertionError("count job launched during warm search")

    monkeypatch.setattr(pyspark.sql.DataFrame, "count", boom)
    warm = ds.search(q, 5).orderBy("rank").collect()
    assert [r["id"] for r in warm] == [r["id"] for r in first]


def test_index_version_token_tracks_mutations(spark, db):
    """The serving cache token must change on ANY index mutation even if
    mtime granularity is coarse — it folds in file count and total bytes
    (ADVICE r4)."""
    ds = db.create_dataset("vtok", dimension=8, partition_count=2)
    rows, df = _vec_rows(spark, 40, 8, seed=44)
    ds.insert(df)
    ds.compact()
    ds.build_index()
    v1 = ds._index_version()
    assert v1 is not None
    ds.remove([rows[0][0]])  # tombstone append mutates the index dir
    v2 = ds._index_version()
    assert v2 is not None and v2 != v1


def test_facade_pq_mode_roundtrip(spark, tmp_path):
    """build_pq persists codebooks + codes under the dataset dir; a
    FRESH Dataset handle (new catalog object — the new-session shape)
    serves mode='pq' searches from the artifacts alone, and the
    reranked top-k matches exact search."""
    import numpy as np

    from anndb_spark.dataset import AnnDB

    db = AnnDB(spark, str(tmp_path / "db"))
    ds = db.create_dataset("pqd", dimension=16, partition_count=2)
    rng = np.random.default_rng(8)
    centers = rng.normal(0, 1, (5, 16)).astype(np.float32)
    mat = centers[np.arange(300) % 5] + rng.normal(0, 0.05, (300, 16)).astype(
        np.float32
    )
    rows = [(f"v{i}", mat[i].astype(float).tolist(), None) for i in range(300)]
    ds.insert(
        spark.createDataFrame(
            rows, "id STRING, vector ARRAY<FLOAT>, metadata MAP<STRING,STRING>"
        )
    )
    ds.compact()
    ds.build_pq(m=4, n_centroids=16, sample_n=300)
    q = (mat[7] + rng.normal(0, 0.02, 16).astype(np.float32)).astype(float).tolist()
    fresh = db.get_dataset("pqd")  # new handle: artifacts only
    got = [r["id"] for r in fresh.search(q, 5, mode="pq").collect()]
    exact = [r["id"] for r in fresh.search(q, 5, mode="exact").collect()]
    assert len(got) == 5
    assert len(set(got) & set(exact)) >= 4, (got, exact)


def test_facade_ivfpq_mode(spark, tmp_path):
    """build_ivfpq persists the compressed layout; mode='ivfpq' serves
    from it (fresh handle) and matches exact top-k after rerank."""
    import numpy as np

    from anndb_spark.dataset import AnnDB

    db = AnnDB(spark, str(tmp_path / "db"))
    ds = db.create_dataset("ipq", dimension=16, partition_count=2)
    rng = np.random.default_rng(15)
    centers = rng.normal(0, 1, (4, 16)).astype(np.float32)
    mat = centers[np.arange(240) % 4] + rng.normal(0, 0.05, (240, 16)).astype(
        np.float32
    )
    rows = [(f"v{i}", mat[i].astype(float).tolist(), None) for i in range(240)]
    ds.insert(
        spark.createDataFrame(
            rows, "id STRING, vector ARRAY<FLOAT>, metadata MAP<STRING,STRING>"
        )
    )
    ds.compact()
    ds.build_ivfpq(n_cells=4, m=4, n_centroids=16, sample_n=240)
    q = (mat[11] + rng.normal(0, 0.02, 16).astype(np.float32)).astype(float).tolist()
    fresh = db.get_dataset("ipq")
    got = [r["id"] for r in fresh.search(q, 5, mode="ivfpq", nprobe=2).collect()]
    exact = [r["id"] for r in fresh.search(q, 5, mode="exact").collect()]
    assert len(got) == 5
    assert len(set(got) & set(exact)) >= 4, (got, exact)


def test_search_filter_exact_and_ann(spark, db):
    """filter= on Dataset.search: exact mode filters before scoring
    (predicate pushed to the scan); ann mode post-filters a wide search
    and re-ranks.  Both must agree with NumPy brute force over the
    matching subset — a predicate surface the reference doesn't have
    (`SURVEY.md §4`)."""
    ds = db.create_dataset("flt", dimension=12, partition_count=2)
    rng = np.random.default_rng(23)
    rows = [
        (f"v{i:04d}", rng.normal(0, 1, 12).tolist(), {"group": str(i % 3)})
        for i in range(200)
    ]
    ds.insert(
        spark.createDataFrame(
            rows, "id STRING, vector ARRAY<DOUBLE>, metadata MAP<STRING,STRING>"
        )
    )
    ds.compact()
    q = rows[17][1]
    pred = F.element_at("metadata", "group") == "1"
    mat = np.array([v for _, v, _ in rows])
    d = np.sqrt(((mat - np.array(q)) ** 2).sum(axis=1))
    keep = [i for i in range(200) if i % 3 == 1]
    want = [rows[i][0] for i in sorted(keep, key=lambda i: (d[i], rows[i][0]))[:5]]

    got = [r["id"] for r in ds.search(q, 5, filter=pred).orderBy("rank").collect()]
    assert got == want  # exact path: filter-then-score

    ds.build_index()
    got_ann = [
        r["id"]
        for r in ds.search(q, 5, mode="ann", filter=pred, oversample=10)
        .orderBy("rank")
        .collect()
    ]
    # wide stage is exact at this size (auto → brute), so post-filter
    # with a 10x oversample recovers the exact filtered top-5
    assert got_ann == want

    # metadata rides along when asked
    wm = ds.search(q, 3, filter=pred, with_metadata=True).collect()
    assert all(r["metadata"]["group"] == "1" for r in wm)

    with pytest.raises(ValueError, match="filter="):
        ds.search(q, 3, mode="ivfpq", filter=pred)
