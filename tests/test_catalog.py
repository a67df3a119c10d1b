"""Catalog DDL + routing tests (O20, O21, O27-O29)."""

import uuid

import pytest
from pyspark.sql import functions as F

from anndb_spark.catalog import Catalog, uuid_mod, validate_dimension, with_partition_id


def _uuid_mod_py(u: str, m: int) -> int:
    # ground truth per utils/uuid.go:9-12: (low64 % m + high64 % m) % m
    b = uuid.UUID(u).bytes
    hi = int.from_bytes(b[:8], "big")
    lo = int.from_bytes(b[8:], "big")
    return (lo % m + hi % m) % m


@pytest.mark.parametrize("m", [1, 4, 7, 16])
def test_uuid_mod_matches_reference_semantics(spark, m):
    ids = [str(uuid.UUID(int=i * 0x9E3779B97F4A7C15_9E3779B97F4A7C15 % (1 << 128))) for i in range(1, 40)]
    df = spark.createDataFrame([(i,) for i in ids], "id STRING")
    got = {r["id"]: r["p"] for r in df.select("id", uuid_mod(F.col("id"), m).alias("p")).collect()}
    for u in ids:
        assert got[u] == _uuid_mod_py(u, m), u


def test_validate_dimension_split(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [1.0]), ("c", [1.0, 2.0])],
        "id STRING, vector ARRAY<FLOAT>",
    )
    valid, rejects = validate_dimension(df, 2)
    assert {r["id"] for r in valid.collect()} == {"a", "c"}
    rej = rejects.collect()
    assert [r["id"] for r in rej] == ["b"] and rej[0]["error"] == "DIMENSION_MISMATCH"


def test_catalog_crud_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    meta = cat.create("vecs", dimension=4, space="cosine", partition_count=2)
    assert cat.get("vecs").dataset_id == meta.dataset_id
    assert cat.get("missing") is None
    with pytest.raises(ValueError):
        cat.create("vecs", dimension=4)
    df = spark.createDataFrame(
        [(str(uuid.uuid4()), [float(i)] * 4, {"k": str(i)}) for i in range(20)]
        + [(str(uuid.uuid4()), [1.0], {})],  # wrong dim
        "id STRING, vector ARRAY<FLOAT>, metadata MAP<STRING,STRING>",
    )
    rejects = cat.write_vectors("vecs", df)
    assert rejects.count() == 1
    back = cat.read_vectors("vecs")
    assert back.count() == 20
    assert set(back.select("partition_id").distinct().toPandas()["partition_id"]) <= {0, 1}
    # routing matches reference partitioner
    for r in back.select("id", "partition_id").collect():
        assert r["partition_id"] == _uuid_mod_py(r["id"], 2)
    cat.delete("vecs")
    assert cat.get("vecs") is None


def test_with_partition_id(spark):
    ids = [str(uuid.uuid4()) for _ in range(10)]
    df = spark.createDataFrame([(i,) for i in ids], "id STRING")
    out = with_partition_id(df, 4)
    for r in out.collect():
        assert r["partition_id"] == _uuid_mod_py(r["id"], 4)


def test_validate_metadata_codec_limits(spark):
    """Key ≤ 255 bytes / value ≤ 65535 bytes (uint8/uint16 length
    prefixes of the reference codec, index/metadata.go:46-60); byte
    semantics (multibyte chars count per byte); null metadata valid."""
    from anndb_spark.catalog import validate_metadata

    rows = [
        ("ok", {"k": "v"}),
        ("nullmeta", None),
        ("badkey", {"K" * 256: "v"}),
        ("badkey_utf8", {"é" * 128: "v"}),  # 128 chars, 256 bytes
        ("badval", {"k": "V" * 65536}),
        ("badboth", {"K" * 256: "V" * 65536}),
    ]
    df = spark.createDataFrame(rows, "id STRING, metadata MAP<STRING,STRING>")
    valid, rejects = validate_metadata(df)
    assert {r["id"] for r in valid.collect()} == {"ok", "nullmeta"}
    errs = {r["id"]: r["error"] for r in rejects.collect()}
    assert errs == {
        "badkey": "METADATA_KEY_TOO_LONG",
        "badkey_utf8": "METADATA_KEY_TOO_LONG",
        "badval": "METADATA_VALUE_TOO_LONG",
        "badboth": "METADATA_KEY_TOO_LONG",  # key check first, like the encoder
    }
