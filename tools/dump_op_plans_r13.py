"""Operator-level .explain plans for the operators changed in r13.

The query-level dumps (tools/dump_plans.py) show `Scan ExistingRDD`
for entries that materialize internally, so the optimization evidence
for those operators lives one level down.  This script builds each
changed operator's DataFrame directly and writes its FORMATTED plan.

Usage:
    python tools/dump_op_plans_r13.py <suffix> [tree_root]

`tree_root` defaults to /root/repo; pass a git worktree of the
pre-optimization commit to produce the `before` files from the real
old code.  Output: plans/r13/op_<name>_<suffix>.txt (always under
/root/repo/plans/r13 regardless of tree_root).
"""

from __future__ import annotations

import os
import sys
import tempfile

TREE = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT_DIR = "/root/repo/plans/r13"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, TREE)

import numpy as np  # noqa: E402


def dump(name: str, df) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(OUT_DIR, f"op_{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"[plan] {name} -> {path}")


def main() -> None:
    from anndb_spark.session import get_spark

    spark = get_spark("op-plan-dump", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    os.makedirs(OUT_DIR, exist_ok=True)
    scratch = tempfile.mkdtemp(prefix="opplan_")

    # --- BM25 family over a freshly written index (this tree's layout)
    from anndb_spark.operators.text import (
        bm25_search,
        bm25_search_indexed,
        bm25_search_indexed_batch,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = os.path.join(scratch, "bm25idx")
    write_bm25_index(docs, idx, buckets=64)
    dump("bm25_search_indexed", bm25_search_indexed(spark, idx, ["batch", "merge", "vector"], k=20))
    probes = [("p0", ["batch", "merge"]), ("p1", ["vector", "stream", "merge"]), ("p2", ["window"])]
    dump("bm25_search_indexed_batch", bm25_search_indexed_batch(spark, idx, probes, k=20))
    dump("bm25_search_scan", bm25_search(docs, ["batch", "merge", "vector"], k=20))

    # --- DSIR: in-session target over a corpus slice
    from anndb_spark.operators.curation import dsir_weights

    try:
        df_dsir = dsir_weights(docs, target_filter=F.col("lang") == "en", buckets=4096)
    except TypeError:  # pre-r13 tree has no target_filter
        df_dsir = dsir_weights(docs, docs.filter(F.col("lang") == "en"), buckets=4096)
    dump("dsir_weights", df_dsir)

    # --- MinHash LSH pairs
    from anndb_spark.operators.dedup import minhash_lsh_pairs

    dump("minhash_lsh_pairs", minhash_lsh_pairs(docs))

    # --- wide binary-quantized kNN
    from anndb_spark.operators.knn import knn_binary

    rng = np.random.default_rng(11)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.concat(
            F.col("embedding"),
            F.transform(F.col("embedding"), lambda x: x - F.lit(0.5)),
            F.transform(F.col("embedding"), lambda x: F.lit(0.25) - x * x),
        ).alias("vector"),
    )
    wq = [(i, rng.normal(0, 1, 192).tolist()) for i in range(4)]
    dump("knn_binary_wide", knn_binary(emb, wq, 10, dim=192))

    spark.stop()


if __name__ == "__main__":
    main()
