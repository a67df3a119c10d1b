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
