"""Operator-level .explain plans for the operators changed in r14.

Query-level dumps (tools/dump_plans.py) cover the declared entries;
bench-only paths (knn_join_ivf_2k, winnow_pairs) need their plans
captured one level down.

Usage:
    python tools/dump_op_plans_r14.py <suffix> [tree_root]

`tree_root` defaults to /root/repo; pass a git worktree of the
pre-optimization commit to produce the `before` files from the real
old code.  Output: plans/r14/op_<name>_<suffix>.txt (always under
/root/repo/plans/r14 regardless of tree_root).
"""

from __future__ import annotations

import os
import sys

TREE = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT_DIR = "/root/repo/plans/r14"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, TREE)


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

    spark = get_spark(
        "op-plan-dump", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    os.makedirs(OUT_DIR, exist_ok=True)

    # --- IVF similarity join (the bench knn_join_ivf_2k shape)
    from anndb_spark.operators.ivf import assign_clusters, train_centroids
    from anndb_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).cache()
    emb.count()
    cent = train_centroids(emb, 32, sample_n=50_000)
    assigned = assign_clusters(emb, cent).cache()
    assigned.count()
    join_left = emb.limit(2000)
    dump(
        "knn_join_ivf",
        knn_join(
            join_left, assigned, 5, mode="ivf", centroids=cent, nprobe=4,
            exclude_self=True,
        ),
    )

    # --- winnowing candidate pairs (bench winnow_pairs shape)
    from anndb_spark.operators.dedup import winnow_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dump("winnow_pairs", winnow_pairs(docs))

    spark.stop()


if __name__ == "__main__":
    main()
