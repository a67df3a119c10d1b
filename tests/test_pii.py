"""PII detection/redaction: pattern behavior, precision bias, plan
shape (pure projection, no shuffle/Python)."""

import pytest

from anndb_spark.operators.pii import pii_stats, redact_pii


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


ROWS = [
    (1, "write to alice.smith+x@mail-host.co.uk or call 555-867-5309"),
    (2, "server at 192.168.1.254 answered; ssn 078-05-1120 leaked"),
    (3, "no pii here, just pi 3.14159 and version 1.2.3 and 12-34"),
    (4, "two mails: a@b.io c@d.org and ip 10.0.0.1"),
]


def test_counts(spark):
    df = spark.createDataFrame(ROWS, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"]) == (1, 1)
    assert (out[2]["n_ipv4"], out[2]["n_ssn"]) == (1, 1)
    # precision bias: dotted versions / short number pairs are NOT pii
    assert not out[3]["has_pii"]
    assert (out[4]["n_email"], out[4]["n_ipv4"]) == (2, 1)


def test_redaction_order_and_tokens(spark):
    df = spark.createDataFrame(ROWS, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert "[EMAIL]" in out[1]["text_redacted"]
    assert "[PHONE]" in out[1]["text_redacted"]
    assert "555-867" not in out[1]["text_redacted"]
    # email hosts are eaten by [EMAIL], never half-rewritten by [IPV4]
    assert out[4]["text_redacted"].count("[EMAIL]") == 2
    assert "[IPV4]" in out[4]["text_redacted"]
    assert out[3]["text_redacted"] == ROWS[2][1]
    assert out[3]["n_redacted"] == 0 and out[1]["n_redacted"] == 2


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame(ROWS, "doc_id LONG, text STRING")
    for op in (pii_stats, redact_pii):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle
        assert "Python" not in plan    # no UDF — stays in codegen
