"""Best-fit-decreasing sequence packing invariants."""

import pytest

from anndb_spark.operators.packing import pack_sequences

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


def _check_invariants(rows, seq_len):
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[(r["bucket"], r["bin_id"])].append(r)
    for (_, _), docs in bins.items():
        total = sum(d["n_tokens"] for d in docs)
        if any(d["oversize"] for d in docs):
            assert len(docs) == 1  # oversize docs pack alone
        else:
            assert total <= seq_len
        # offsets are the cumulative fill in pack order
        assert sorted(d["bin_offset"] for d in docs) == [
            x for x in _prefix_sums(d["n_tokens"] for d in sorted(
                docs, key=lambda d: d["bin_offset"]))
        ]


def _prefix_sums(ns):
    acc = 0
    for n in ns:
        yield acc
        acc += n


def test_pack_documents_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, seq_len=128)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc exactly once
    assert len({r["id"] for r in rows}) == len(rows)
    _check_invariants(rows, 128)
    # deterministic rerun
    again = pack_sequences(docs, seq_len=128).collect()
    key = lambda r: (r["bucket"], r["id"])  # noqa: E731
    assert sorted(map(lambda r: r.asDict(), rows), key=lambda d: (d["bucket"], d["id"])) == sorted(
        map(lambda r: r.asDict(), again), key=lambda d: (d["bucket"], d["id"])
    )


def test_pack_oversize_and_exact_fit(spark):
    rows = [
        ("a", "w " * 9, "s"),    # 10 tokens ('w'*9 + trailing '')
        ("b", "x y z", "s"),     # 3
        ("c", "p q", "s"),       # 2
        ("d", " ".join(["t"] * 20), "s"),  # 20 > seq_len: oversize
    ]
    df = spark.createDataFrame(rows, "doc_id STRING, text STRING, source STRING")
    out = {r["id"]: r for r in pack_sequences(df, seq_len=10).collect()}
    assert out["d"]["oversize"] and out["d"]["n_tokens"] == 20
    # 'a' is 10 tokens -> exactly fills a bin alone
    assert out["a"]["n_tokens"] == 10 and not out["a"]["oversize"]
    assert out["b"]["bin_id"] == out["c"]["bin_id"]  # 3+2 share a bin
    assert {out["a"]["bin_id"], out["b"]["bin_id"], out["d"]["bin_id"]} == {0, 1, 2} - set()
    _check_invariants(list(out.values()), 10)


def test_pack_random_corpora_invariants(spark):
    """Randomized doc lengths (hypothesis): invariants hold for every
    drawn corpus, including all-oversize and all-tiny extremes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(
        lens=st.lists(st.integers(1, 40), min_size=1, max_size=40),
        seq_len=st.sampled_from([8, 16, 64]),
    )
    def run(lens, seq_len):
        rows = [
            (f"d{i:03d}", " ".join(["w"] * n), "s") for i, n in enumerate(lens)
        ]
        df = spark.createDataFrame(
            rows, "doc_id STRING, text STRING, source STRING"
        )
        out = pack_sequences(df, seq_len=seq_len).collect()
        assert len(out) == len(lens)
        _check_invariants(out, seq_len)
        got = {r["id"]: r["n_tokens"] for r in out}
        assert got == {f"d{i:03d}": n for i, n in enumerate(lens)}

    run()


def test_pack_sub_buckets_bound_group_size(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, seq_len=128, sub_buckets=4)
    rows = out.collect()
    assert len(rows) == docs.count()
    _check_invariants(rows, 128)
    assert len({r["bucket"] for r in rows}) > len(
        {r["bucket"] for r in pack_sequences(docs, seq_len=128).collect()}
    )
    # pmod salts: non-negative, and never more than sub_buckets per base
    salts = {r["bucket"].rsplit("#", 1)[1] for r in rows}
    assert all(not s.startswith("-") for s in salts), salts
    assert salts <= {str(i) for i in range(4)}, salts

    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)


def test_write_training_shards_round_trip(spark, tmp_path):
    from anndb_spark.operators.packing import (
        read_training_shards,
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    meta = write_training_shards(docs, out, seq_len=256)
    assert meta["seq_len"] == 256
    assert sum(b["n_docs"] for b in meta["buckets"].values()) == docs.count()

    back = read_training_shards(spark, out)
    assert back.count() == docs.count()
    # every bin respects the budget (oversize singletons exempt)
    from pyspark.sql import functions as F

    over = (
        back.filter(~F.col("oversize"))
        .groupBy("bucket", "bin_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .filter(F.col("tot") > 256)
        .count()
    )
    assert over == 0
    # text survived the round trip
    one = back.filter(F.col("text").isNotNull()).limit(1).collect()
    assert one and len(one[0]["text"]) > 0
    # loader order: inside one bucket, offsets are cumulative per bin
    rows = (
        back.filter(F.col("bucket") == one[0]["bucket"])
        .orderBy("bin_id", "bin_offset")
        .collect()
    )
    seen = {}
    for r in rows:
        if r["oversize"]:
            continue
        assert r["bin_offset"] == seen.get(r["bin_id"], 0)
        seen[r["bin_id"]] = r["bin_offset"] + r["n_tokens"]
