"""JSONL/CSV ingestion with corrupt-record quarantine."""

import json

import pytest

from anndb_spark.sources.ingest import (
    read_documents_csv,
    read_documents_jsonl,
)


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7},
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(1, '{"doc_id": 3, "text": "truncated')        # bad json
    lines.append('{"doc_id": "not-a-number", "text": "x"}')    # type defect
    p = tmp_path / "shard.jsonl"
    p.write_text("\n".join(lines) + "\n")

    clean, quarantine = read_documents_jsonl(spark, str(p))
    got = {r["doc_id"]: r for r in clean.collect()}
    assert set(got) == {1, 2}
    assert got[1]["text"] == "hello world" and got[2]["lang"] == "fr"
    assert set(clean.columns) == {"doc_id", "text", "lang", "source", "n_chars"}

    bad = [r["raw"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("truncated" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_jsonl_roundtrip_into_pipeline(spark, tmp_path):
    # the lazy clean stream feeds an operator directly (collect-style
    # queries work; bare counts need ingest_documents, see below)
    from anndb_spark.operators.text import token_counts

    rows = [
        {"doc_id": i, "text": f"tok{i} tok tok", "lang": "en",
         "source": "s", "n_chars": 12}
        for i in range(5)
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    clean, _ = read_documents_jsonl(spark, str(p))
    out = token_counts(clean)
    assert len(out.collect()) == 5


def test_ingest_documents_single_pass_materialization(spark, tmp_path):
    from anndb_spark.sources.ingest import ingest_documents

    good = [
        {"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s",
         "n_chars": 5}
        for i in range(4)
    ]
    lines = [json.dumps(g) for g in good] + ['{"doc_id": bad']
    p = tmp_path / "shard.jsonl"
    p.write_text("\n".join(lines) + "\n")

    clean, quarantine = ingest_documents(
        spark, str(p), str(tmp_path / "ingested")
    )
    # bare counts work here — the split reads parquet partitions
    assert clean.count() == 4
    assert quarantine.count() == 1
    assert sorted(r["doc_id"] for r in clean.collect()) == [0, 1, 2, 3]
    assert "bad" in quarantine.collect()[0]["raw"]


def test_csv_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello,en,web,5\n"
        "oops,broken,en,web,notanint\n"
        "2,salut,fr,web,5\n"
    )
    clean, quarantine = read_documents_csv(spark, str(p))
    ids = sorted(r["doc_id"] for r in clean.collect())
    assert ids == [1, 2]
    bad = [r["raw"] for r in quarantine.collect()]
    assert len(bad) == 1 and "oops" in bad[0]
