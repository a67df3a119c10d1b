"""Row-wise SQ8 columnar codec: encode/decode/error expressions."""

import numpy as np
from pyspark.sql import functions as F

from anndb_spark.functions.quantize import (
    _rmin,
    _scale,
    sq8_decode,
    sq8_encode,
    sq8_max_error,
)


def test_sq8_roundtrip_error_bound(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(0, 1, 16).astype(float).tolist()) for i in range(50)]
    rows.append((50, [3.25] * 16))  # constant vector edge case
    df = spark.createDataFrame(rows, "id long, vector array<float>")
    v = F.col("vector")
    out = df.select(
        "id",
        "vector",
        sq8_encode(v).alias("codes"),
        _rmin(v).alias("rmin"),
        _scale(v).alias("scale"),
        sq8_max_error(v).alias("max_err"),
    ).collect()
    for r in out:
        assert all(0 <= c <= 255 for c in r["codes"])
        # reconstruction error bounded by scale/2 (+ float32 read noise)
        assert r["max_err"] <= r["scale"] / 2 + 1e-9
        # numpy replication of the exact arithmetic
        x = np.array(r["vector"], dtype=np.float32).astype(np.float64)
        rmin = float(np.min(x.astype(np.float32)))
        s = (float(np.max(x.astype(np.float32))) - rmin) / 255.0
        s = s if s > 0 else 1.0
        codes = np.floor((x - rmin) / s + 0.5).astype(int)
        assert codes.tolist() == list(r["codes"])


def test_sq8_decode_matches(spark):
    rng = np.random.default_rng(3)
    rows = [(i, rng.uniform(-5, 5, 8).astype(float).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, vector array<float>")
    v = F.col("vector")
    enc = df.select(
        "id",
        "vector",
        sq8_encode(v).alias("codes"),
        _rmin(v).alias("rmin"),
        _scale(v).alias("scale"),
    )
    dec = enc.select(
        "id",
        "vector",
        sq8_decode(F.col("codes"), F.col("rmin"), F.col("scale")).alias("rec"),
    ).collect()
    for r in dec:
        x = np.array(r["vector"], dtype=np.float32)
        rec = np.array(r["rec"])
        span = float(x.max() - x.min()) or 1.0
        assert np.abs(rec - x).max() <= span / 255 / 2 + 1e-9


def test_sq8_table_roundtrip_through_parquet(spark, tmp_path):
    """encode_table -> write parquet -> NEW read -> decode_table: every
    reconstructed component within scale/2 of the original (the
    self-describing-table catalog contract)."""
    import numpy as np
    from pyspark.sql import functions as F

    from anndb_spark.functions.quantize import (
        sq8_decode_table,
        sq8_encode_table,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, (rng.normal(0, 5, 16) * (1 + i % 3)).astype(float).tolist())
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id INT, vector ARRAY<FLOAT>")
    path = str(tmp_path / "sq8_table")
    sq8_encode_table(df).write.parquet(path)
    dec = sq8_decode_table(spark.read.parquet(path))
    got = {r["id"]: r["vector"] for r in dec.collect()}
    scale_by_id = {
        r["id"]: r["vector_scale"]
        for r in sq8_encode_table(df).select("id", "vector_scale").collect()
    }
    for i, vec in rows:
        orig = np.asarray(vec)
        rec = np.asarray(got[i])
        assert np.abs(orig - rec).max() <= scale_by_id[i] / 2 + 1e-9


def test_knn_sq8_rerank_matches_exact(spark):
    """SQ8 candidate scan + exact rerank recovers the exact top-k on
    the fixture (0.2% reconstruction error << neighbor separation);
    scores equal knn_exact's bitwise (same expression kernel)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from anndb_spark.functions.quantize import sq8_encode_table
    from anndb_spark.operators.knn import knn_exact, knn_sq8

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    qdf = e._queries_df(spark, e.EMBEDDING_QUERIES)
    exact = {(r["query_id"], r["rank"]): (r["id"], r["score"])
             for r in knn_exact(emb, qdf, 5).collect()}
    sq8 = {(r["query_id"], r["rank"]): (r["id"], r["score"])
           for r in knn_sq8(sq8_encode_table(emb), qdf, 5,
                            original=emb).collect()}
    assert sq8 == exact

    # without rerank: approximate scores over decoded vectors, same ids
    # at this error level
    approx = knn_sq8(sq8_encode_table(emb), qdf, 5)
    ids_a = {(r["query_id"], r["rank"]): r["id"] for r in approx.collect()}
    assert ids_a == {k: v[0] for k, v in exact.items()}


def test_knn_binary_recall_and_determinism(spark):
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from anndb_spark.operators.knn import knn_binary, knn_exact

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    got = knn_binary(emb, e.EMBEDDING_QUERIES, 10, dim=64).collect()
    assert len(got) == 20
    # deterministic across runs / partitionings
    got2 = knn_binary(
        emb.repartition(7), e.EMBEDDING_QUERIES, 10, dim=64
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))
    # the 64-bit sign proxy is coarse; rerank_mult is the accuracy
    # knob — recall must rise with the candidate budget and the exact
    # rerank must keep every candidate that IS a true neighbor
    qdf = e._queries_df(spark, e.EMBEDDING_QUERIES)
    exact = {(r["query_id"], r["id"]) for r in knn_exact(emb, qdf, 10).collect()}
    hits3 = sum(1 for r in got if (r["query_id"], r["id"]) in exact)
    wide = knn_binary(emb, e.EMBEDDING_QUERIES, 10, dim=64, rerank_mult=20)
    hits20 = sum(
        1 for r in wide.collect() if (r["query_id"], r["id"]) in exact
    )
    assert hits3 >= 4          # better than random even at mult=3
    assert hits20 > hits3      # the knob works
    assert hits20 >= 14        # mult=20 recovers >= 0.7 recall here
    # precomputed signature table (the stored-artifact scan path):
    # byte-identical results to on-the-fly packing
    from anndb_spark.functions.quantize import bq_encode_table

    sig = bq_encode_table(emb, dim=64)
    assert sig.columns == [
        "id", "vector_sig_lo", "vector_sig_hi", "vector_sig_dim"
    ]
    got_sig = knn_binary(
        emb, e.EMBEDDING_QUERIES, 10, dim=64, sig_table=sig
    ).collect()
    assert sorted(map(tuple, got_sig)) == sorted(map(tuple, got))
    # the dim stamp fails loudly on a packing/search dim mismatch
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    q32 = [(qid, qv[:32]) for qid, qv in e.EMBEDDING_QUERIES]
    bad = knn_binary(
        emb.withColumn("vector", F.slice("vector", 1, 32)),
        q32, 10, dim=32, sig_table=sig,
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        bad.collect()
    assert "packed at dim" in str(ei.value)


def test_sign_words_three_way_parity(spark):
    """The wide (ARRAY<BIGINT>) signature: Spark column, Python twin and
    DuckDB SQL twin must pack bit-identically at a non-word-aligned dim."""
    import duckdb
    from pyspark.sql import functions as F

    from anndb_spark.functions.quantize import (
        BQ_WORD_BITS,
        sign_words_col,
        sign_words_py,
        sign_words_sql,
    )

    dim = 150  # 3 words at 62 bits/word, last word partial
    vec = [((i * 29) % 11 - 5) / 3.0 for i in range(dim)]
    df = spark.createDataFrame([(vec,)], "v ARRAY<DOUBLE>")
    got = df.select(sign_words_col(F.col("v"), dim).alias("s")).first()["s"]
    py = sign_words_py(vec)
    assert list(got) == py and len(py) == -(-dim // BQ_WORD_BITS)
    duck = duckdb.connect().execute(
        f"SELECT {sign_words_sql('v', dim)} AS s FROM (SELECT ? AS v)",
        [vec],
    ).fetchone()[0]
    assert list(duck) == py
    # every word stays below the sign bit
    assert all(0 <= w < 2**62 for w in py)


def test_knn_binary_wide_dim(spark):
    """dim > 64 goes through the ARRAY<BIGINT> word path: deterministic,
    exact-rerank semantics identical to the two-long path, sig_table
    byte-identical, recall rises with the candidate budget."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from anndb_spark.functions.quantize import bq_encode_table
    from anndb_spark.operators.knn import knn_binary, knn_exact

    # derive 192-dim vectors: [v, v-0.5, 0.25-v*v] — sign patterns of
    # the extra segments are NOT functions of the first's
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        F.col("vec_id").alias("id"),
        F.concat(
            F.transform("embedding", lambda x: x.cast("double")),
            F.transform("embedding", lambda x: x.cast("double") - 0.5),
            F.transform(
                "embedding", lambda x: 0.25 - x.cast("double") * x.cast("double")
            ),
        ).alias("vector"),
    )
    queries = [
        (qid, list(qv) + [x - 0.5 for x in qv] + [0.25 - x * x for x in qv])
        for qid, qv in e.EMBEDDING_QUERIES
    ]
    got = knn_binary(emb, queries, 10, dim=192).collect()
    assert len(got) == 20
    got2 = knn_binary(emb.repartition(5), queries, 10, dim=192).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))
    # stored wide signature table: identical results
    sig = bq_encode_table(emb, dim=192)
    assert sig.columns == ["id", "vector_sig", "vector_sig_dim"]
    got_sig = knn_binary(emb, queries, 10, dim=192, sig_table=sig).collect()
    assert sorted(map(tuple, got_sig)) == sorted(map(tuple, got))
    # accuracy knob works at wide dims too
    qdf = e._queries_df(spark, queries)
    exact = {(r["query_id"], r["id"]) for r in knn_exact(emb, qdf, 10).collect()}
    hits3 = sum(1 for r in got if (r["query_id"], r["id"]) in exact)
    wide = knn_binary(emb, queries, 10, dim=192, rerank_mult=20).collect()
    hits20 = sum(1 for r in wide if (r["query_id"], r["id"]) in exact)
    assert hits20 >= hits3 and hits20 >= 14


def test_knn_binary_qid_types(spark):
    """String and past-int32 query ids round-trip (the r9 INT hardcode
    rejected both)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from anndb_spark.operators.knn import knn_binary

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    base = {qid: qv for qid, qv in e.EMBEDDING_QUERIES}
    as_str = [(f"q{qid}", qv) for qid, qv in base.items()]
    got_s = knn_binary(emb, as_str, 5, dim=64).collect()
    assert {r["query_id"] for r in got_s} == {f"q{q}" for q in base}
    big = [(qid + 2**40, qv) for qid, qv in base.items()]
    got_b = knn_binary(emb, big, 5, dim=64).collect()
    assert {r["query_id"] for r in got_b} == {q + 2**40 for q in base}
    import pytest

    with pytest.raises(TypeError):
        knn_binary(emb, [(1, base[0]), ("x", base[1])], 5, dim=64)


def test_sign_bits_py_matches_cols(spark):
    from pyspark.sql import functions as F

    from anndb_spark.functions.quantize import sign_bits_cols, sign_bits_py

    vec = [((i * 13) % 7 - 3) / 2.0 for i in range(64)]
    df = spark.createDataFrame([(vec,)], "v ARRAY<DOUBLE>")
    lo, hi = sign_bits_cols(F.col("v"), 64)
    row = df.select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    plo, phi = sign_bits_py(vec)
    assert (row["lo"], row["hi"]) == (plo, phi)


def test_sign_pack_expr_parity(spark):
    """The single-parse F.expr fast path (column NAME input, r13
    optimization) must pack bit-identically to the lambda form (Column
    input) and the Python twin — narrow halves and wide words, at
    aligned and non-aligned dims, zeros/negatives included."""
    import numpy as np
    from pyspark.sql import functions as F

    from anndb_spark.functions.quantize import (
        sign_bits_cols,
        sign_bits_py,
        sign_words_col,
        sign_words_py,
    )

    rng = np.random.default_rng(97)
    rows = [
        ([float(x) for x in rng.normal(0, 1, 192)],) for _ in range(40)
    ]
    rows.append(([0.0] * 192,))          # all-zero: no bit set
    rows.append(([-1.0] * 192,))         # all-negative: no bit set
    rows.append(([1e-300] * 192,))       # tiny positive: every bit set
    df = spark.createDataFrame(rows, "v ARRAY<DOUBLE>")

    for dim in (8, 33, 64):
        lo_s, hi_s = sign_bits_cols("v", dim)          # expr fast path
        lo_c, hi_c = sign_bits_cols(F.col("v"), dim)   # lambda path
        got = df.select(
            lo_s.alias("ls"), hi_s.alias("hs"),
            lo_c.alias("lc"), hi_c.alias("hc"),
        ).collect()
        for r, (vec,) in zip(got, rows):
            plo, phi = sign_bits_py(vec[:dim])
            assert (r["ls"], r["hs"]) == (r["lc"], r["hc"]) == (plo, phi)

    for dim in (100, 124, 192):
        got = df.select(
            sign_words_col("v", dim).alias("ws"),       # expr fast path
            sign_words_col(F.col("v"), dim).alias("wc"),  # lambda path
        ).collect()
        for r, (vec,) in zip(got, rows):
            py = sign_words_py(vec[:dim], dim)
            assert list(r["ws"]) == list(r["wc"]) == py


def test_literal_df_parity(spark):
    """literal_df (verifySchema=False, r13 driver-latency optimization)
    must produce bit-identical rows to the verified createDataFrame for
    the exactly-typed literal shapes the library builds."""
    import numpy as np

    from anndb_spark.utils import literal_df

    rng = np.random.default_rng(5)
    data = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(50)]
    ddl = "query_id INT, query_vector ARRAY<DOUBLE>"
    a = spark.createDataFrame(data, ddl).collect()
    b = literal_df(spark, data, ddl).collect()
    assert a == b
    sdata = [(str(i), [float(x) for x in rng.normal(0, 1, 7)]) for i in range(20)]
    sddl = "query_id STRING, qvec ARRAY<FLOAT>"
    a = spark.createDataFrame(sdata, sddl).collect()
    b = literal_df(spark, sdata, sddl).collect()
    assert a == b
