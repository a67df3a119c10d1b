"""1M-document DSIR oracle validation + 1k-probe BM25 batch point
(VERDICT r12 tasks 6 and 7).

Task 6 — the DSIR round-tie residual (`curation.py` docstring): the
rounding step is three implementations (Spark BigDecimal HALF_UP,
DuckDB double round, CPython HALF_EVEN) that can disagree at exact
decimal ties or 1 ULP of the pre-round value.  Validated hash-exact at
sf0.01 (driver) and sf0.1 (60k docs); this tool runs the SAME
Spark-vs-DuckDB comparison once over the 1M-document deterministic
corpus (tools/bench_dedup1m.synth_corpus — no lang column, so the
target slice is ``doc_id % 10 = 0`` in BOTH engines; every constant is
f-string-inlined from the same Python values) and records bit-exact or
the first observed tie, removing the last "validated only at small sf"
caveat on a driver-window entry.

Task 7 — the decontamination-service story's last point: r12 measured
0.53 s/probe at 100 probes (10.8x cheaper than sequential); this tool
adds ONE batch call with 1,000 probes over the same 1M-doc 64-bucket
index, plus the task-2 work counter (postings rows the batch joins).

Run AFTER heavy jobs finish (probe brackets assume the box is ours):
  python tools/scale1m_r13.py [N_BASE]
Writes tools/artifacts_r13/scale1m_meta.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_dedup1m import synth_corpus  # noqa: E402
from tools.host_probe import probe  # noqa: E402


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out: dict = {"n_docs": n_base}
    out["probe_pre"] = probe()

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from anndb_spark.operators.curation import dsir_weights
    from anndb_spark.session import get_spark

    buckets, alpha, ab = (
        entry._DSIR_BUCKETS,
        entry._DSIR_ALPHA,
        entry._DSIR_AB,
    )
    spark = get_spark("scale1m-r13")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="anndb_scale1m_")
    corpus_path = os.path.join(scratch, "corpus")
    t0 = time.time()
    synth_corpus(spark, n_base, 0, 0).repartition(64).write.parquet(
        corpus_path
    )
    out["gen_s"] = round(time.time() - t0, 1)
    corpus = spark.read.parquet(corpus_path)

    # ---- task 6: DSIR Spark vs DuckDB at 1M, bit-exact? -------------
    t0 = time.time()
    sp = (
        dsir_weights(
            corpus,
            corpus.filter(F.col("doc_id") % 10 == 0),
            buckets=buckets,
            alpha=alpha,
            id_col="doc_id",
        )
        .toPandas()
        .sort_values("id", kind="stable")
        .reset_index(drop=True)
    )
    out["dsir_spark_s"] = round(time.time() - t0, 1)

    import duckdb

    sql = f"""
        WITH w0 AS (
            SELECT doc_id, string_split(text, ' ') AS ws
            FROM read_parquet('{corpus_path}/*.parquet')
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_concat(
                       ws,
                       [ws[i] || ' ' || ws[i+1]
                        for i in range(1, len(ws))])) AS g
            FROM w0
        ),
        bkt AS (
            SELECT doc_id, substr(md5(g), 1, 3) AS b FROM grams
        ),
        dbc AS (
            SELECT doc_id, b, count(*) AS n FROM bkt GROUP BY doc_id, b
        ),
        raw_model AS (SELECT b, count(*) AS cr FROM bkt GROUP BY b),
        raw_total AS (SELECT sum(cr) AS tr FROM raw_model),
        tgt_model AS (
            SELECT b, count(*) AS ct FROM bkt
            WHERE doc_id % 10 = 0 GROUP BY b
        ),
        tgt_total AS (
            SELECT COALESCE(sum(ct), 0) AS tt FROM tgt_model
        ),
        delta AS (
            SELECT r.b,
                   round(
                       ln((CAST(COALESCE(t.ct, 0) AS DOUBLE) + {alpha!r})
                          / (CAST(tt AS DOUBLE) + {ab!r}))
                       - ln((CAST(r.cr AS DOUBLE) + {alpha!r})
                            / (CAST(tr AS DOUBLE) + {ab!r})),
                       10) AS delta
            FROM raw_model r
            LEFT JOIN tgt_model t USING (b), raw_total, tgt_total
        )
        SELECT dbc.doc_id AS id,
               CAST(sum(dbc.n) AS BIGINT) AS n_grams,
               list_reduce(list(dbc.n * delta.delta ORDER BY dbc.b),
                           (a, c) -> a + c) + 0.0 AS logw
        FROM dbc JOIN delta USING (b)
        GROUP BY dbc.doc_id
        ORDER BY id
    """
    t0 = time.time()
    dk = duckdb.sql(sql).df()
    out["dsir_duckdb_s"] = round(time.time() - t0, 1)
    assert len(sp) == len(dk) == n_base, (len(sp), len(dk))
    sp_ids = sp["id"].to_numpy().astype(np.int64)
    dk_ids = dk["id"].to_numpy().astype(np.int64)
    assert np.array_equal(sp_ids, dk_ids)
    out["dsir_rows"] = int(len(sp))
    out["dsir_ngrams_equal"] = bool(
        np.array_equal(
            sp["n_grams"].to_numpy().astype(np.int64),
            dk["n_grams"].to_numpy().astype(np.int64),
        )
    )
    a = sp["logw"].to_numpy().astype(np.float64)
    b = dk["logw"].to_numpy().astype(np.float64)
    bit_eq = a.view(np.int64) == b.view(np.int64)
    out["dsir_logw_bitexact_rows"] = int(bit_eq.sum())
    out["dsir_logw_mismatch_rows"] = int((~bit_eq).sum())
    if not bit_eq.all():
        i = int(np.argmin(bit_eq))
        out["dsir_first_tie"] = {
            "id": int(sp_ids[i]),
            "spark_logw": repr(float(a[i])),
            "duckdb_logw": repr(float(b[i])),
            "ulp_delta": int(abs(a[i].view(np.int64) - b[i].view(np.int64)))
            if np.isfinite(a[i]) and np.isfinite(b[i])
            else None,
        }
    del sp, dk, a, b
    out["probe_mid"] = probe()

    # ---- task 7: BM25 batch at 1k probes over the 1M index ----------
    from anndb_spark.operators.text import (
        bm25_search_indexed_batch,
        write_bm25_index,
    )

    idx_dir = os.path.join(scratch, "bm25idx")
    t0 = time.time()
    write_bm25_index(corpus, idx_dir, buckets=64)
    out["index_write_s"] = round(time.time() - t0, 1)
    rng = np.random.default_rng(1212)
    p1000 = [
        (f"p{i}", [f"w{int(w)}" for w in rng.integers(1, 2000, 3)])
        for i in range(1000)
    ]
    # warm (footers/codegen), then ONE timed batch call
    bm25_search_indexed_batch(spark, idx_dir, p1000[:10], k=20).collect()
    t0 = time.time()
    rows = bm25_search_indexed_batch(spark, idx_dir, p1000, k=20).collect()
    out["batch1000_s"] = round(time.time() - t0, 1)
    out["batch1000_s_per_probe"] = round(out["batch1000_s"] / 1000, 4)
    out["batch1000_rows"] = len(rows)
    terms = sorted({t for _, ts in p1000 for t in ts})
    out["counter_bm25_batch_postings_rows"] = int(
        spark.read.parquet(f"{idx_dir}/postings")
        .where(F.col("term").isin(terms))
        .count()
    )
    out["r12_batch100_s_per_probe"] = 0.53
    out["probe_post"] = probe()
    spark.stop()

    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts_r13"
    )
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "scale1m_meta.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
