"""grouped_quantiles: the approx sketch path vs the exact oracle path
(VERDICT r7 Wrong #3 — exact `percentile` buffers every group value)."""

import pytest
from pyspark.sql import functions as F

from anndb_spark.operators.stats import grouped_quantiles


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


def test_approx_matches_exact_at_sf001(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    probs = [0.25, 0.5, 0.75, 0.99]
    approx = {
        r["lang"]: r
        for r in grouped_quantiles(
            docs, probs, "n_chars", by="lang", exact=False
        ).collect()
    }
    # rank-bracket check: the sketch returns an actual data value whose
    # RANK is within 1/accuracy of the target (plus one rank of slack
    # for interpolation on these ~100-row groups), so each approx value
    # must lie between the exact quantiles one rank either side.
    vals = {
        r["lang"]: sorted(v["n_chars"] for v in r["vs"])
        for r in docs.groupBy("lang")
        .agg(F.collect_list(F.struct("n_chars")).alias("vs"))
        .collect()
    }
    assert vals.keys() == approx.keys()
    for lang, ar in approx.items():
        xs = vals[lang]
        assert ar["n_rows"] == len(xs)
        for p, col in zip(probs, ("p25", "p50", "p75", "p99")):
            i = p * (len(xs) - 1)
            lo = xs[max(int(i) - 1, 0)]
            hi = xs[min(int(i) + 2, len(xs) - 1)]
            assert lo <= ar[col] <= hi, (lang, col, ar[col], lo, hi)


def test_approx_plan_has_no_exact_percentile(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        grouped_quantiles(docs, [0.5], "n_chars", by="lang")
        ._jdf.queryExecution().toString()
    )
    assert "approx_percentile" in plan or "percentile_approx" in plan
    assert "percentile(" not in plan.replace("approx_percentile(", "").replace(
        "percentile_approx(", ""
    )


def test_grouped_distinct_exact_and_sketch(spark):
    from anndb_spark.operators.stats import grouped_distinct
    from anndb_spark.sources.tables import load_events

    ev = load_events(spark, "/root/testdata/sf0.01")
    exact = {
        r["event_type"]: r
        for r in grouped_distinct(
            ev, "user_id", by="event_type", exact=True, name="n_users"
        ).collect()
    }
    approx = {
        r["event_type"]: r
        for r in grouped_distinct(
            ev, "user_id", by="event_type", name="n_users"
        ).collect()
    }
    assert exact.keys() == approx.keys() and exact
    for et, row in exact.items():
        # HLL++ at rsd=0.05: allow 3 sigma
        assert abs(approx[et]["n_users"] - row["n_users"]) <= max(
            3, 0.15 * row["n_users"]
        )
        assert approx[et]["n_rows"] == row["n_rows"]
    # the sketch path must plan approx_count_distinct, the exact path
    # a real distinct aggregate — the whole point of the split
    plan_a = (
        grouped_distinct(ev, "user_id", by="event_type")
        ._jdf.queryExecution().toString()
    )
    assert "approx_count_distinct" in plan_a
    plan_e = (
        grouped_distinct(ev, "user_id", by="event_type", exact=True)
        ._jdf.queryExecution().toString()
    )
    assert "count(distinct" in plan_e or "count(user_id" in plan_e


def test_referential_audit_orphans_and_dups(spark):
    from anndb_spark.operators.stats import referential_audit

    left = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (9,)], "doc_id LONG"
    )
    right = spark.createDataFrame(
        [(1,), (2,), (4,), (4,), (4,)], "vec_id LONG"
    )
    r = referential_audit(left, right, "doc_id", "vec_id").collect()[0]
    assert r["n_left"] == 5 and r["n_right"] == 5
    assert r["n_left_dup_keys"] == 1      # key 2
    assert r["n_right_dup_keys"] == 1     # key 4
    assert r["n_left_orphan_keys"] == 2   # keys 3, 9
    assert r["n_right_orphan_keys"] == 1  # key 4


def test_ungrouped_and_name_validation(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = grouped_quantiles(docs, [0.5], "n_chars", names=["median"]).collect()[0]
    assert row["n_rows"] == docs.count() and row["median"] > 0
    with pytest.raises(ValueError):
        grouped_quantiles(docs, [0.5, 0.9], "n_chars", names=["only_one"])
