"""Pin the pure-Python XXH64 (functions/xxhash.py) bit-exact against
Spark's ``xxhash64`` — it feeds the bucket IN-list of the indexed BM25
readers, where a wrong bucket would silently drop postings, so the pin
must be unmissable: a buggy implementation mis-buckets ~(B-1)/B of all
strings and fails the vocabulary sweep immediately."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from anndb_spark.functions.xxhash import (
    spark_xxhash64_string,
    term_bucket,
    xxh64,
)

SF = "/root/testdata/sf0.001"


def test_xxh64_known_vectors():
    # reference vectors from the public XXH64 spec/implementation
    # (seed 0 and the Spark seed 42), computed with the canonical C
    # implementation's Python binding and frozen here
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


def test_matches_spark_random_strings(spark):
    rng = random.Random(7)
    alphabet = string.printable[:95] + "éü日本語Ω�😀"
    cases = ["", "a", "ab", "abc", "abcd", "é", "漢字テスト"]
    # every length class of the algorithm: <4, 4-7, 8-31, 32+, and
    # multi-byte UTF-8 straddling block boundaries
    for n in (3, 4, 7, 8, 15, 16, 31, 32, 33, 63, 64, 100):
        cases.append("x" * n)
        cases.append("é" * n)
    for _ in range(2000):
        n = rng.randint(0, 80)
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    rows = spark.createDataFrame(
        [(c,) for c in cases], "s STRING"
    ).select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_string(r["s"]) == r["h"], repr(r["s"])


def test_matches_spark_corpus_vocabulary(spark):
    """Every distinct term of the test corpus buckets identically to
    the Spark expression the index writer uses."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
        .where(F.col("t") != "")
        .distinct()
        .select(
            "t",
            F.pmod(F.xxhash64("t"), F.lit(64)).cast("int").alias("b64"),
            F.pmod(F.xxhash64("t"), F.lit(16)).cast("int").alias("b16"),
        )
        .collect()
    )
    assert len(vocab) > 20
    for r in vocab:
        assert term_bucket(r["t"], 64) == r["b64"], repr(r["t"])
        assert term_bucket(r["t"], 16) == r["b16"], repr(r["t"])
