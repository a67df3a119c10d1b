"""Watermarked streaming dedup (streaming/dedup.py): a REAL
availableNow stream over a source with injected redeliveries must
emit exactly the original record set — first occurrence wins, state
bounded by the watermark horizon."""

import pytest

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


def test_stream_dedup_matches_batch_rollup(spark):
    from anndb_spark.sources.tables import load_events
    from pyspark.sql import functions as F

    got = {r["event_type"]: r for r in e._stream_dedup_events(spark, SF).collect()}
    ev = load_events(spark, SF)
    want = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got.keys() == want.keys() and got
    for et, w in want.items():
        g = got[et]
        assert (g["n_events"], g["n_users"]) == (w["n_events"], w["n_users"])
        assert g["sum_value"] == w["sum_value"]


def test_stream_neardup_matches_batch_incremental(spark):
    """The foreachBatch streaming near-dup over multiple micro-batches
    must emit exactly the one-shot batch incremental pairs — same md5
    split, same threshold, rows compared as sets."""
    from pyspark.sql import functions as F

    from anndb_spark.operators.dedup import minhash_incremental_pairs

    got = {
        (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in e._stream_neardup_documents(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "2"
    want = {
        (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in minhash_incremental_pairs(
            docs.filter(is_new), docs.filter(~is_new), threshold=0.5
        ).collect()
    }
    assert got == want and got


def test_minhash_banded_state_reuse(spark):
    """minhash_incremental_pairs(corpus_state=...) must equal the
    corpus_df form — the contract stream_neardup's persisted state
    relies on."""
    from pyspark.sql import functions as F

    from anndb_spark.operators.dedup import (
        minhash_banded,
        minhash_incremental_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "4"
    new, old = docs.filter(is_new), docs.filter(~is_new)
    direct = {
        tuple(r)
        for r in minhash_incremental_pairs(new, old, threshold=0.5).collect()
    }
    via_state = {
        tuple(r)
        for r in minhash_incremental_pairs(
            new, corpus_state=minhash_banded(old), threshold=0.5
        ).collect()
    }
    assert direct == via_state
    with pytest.raises(ValueError):
        minhash_incremental_pairs(new, threshold=0.5)
