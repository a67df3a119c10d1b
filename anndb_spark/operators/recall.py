"""Recall metric — |top-k ∩ ground-truth-k| / k, averaged over queries.

Parity: `cmd/benchmark/ann-benchmark/main.go:147-161`.  Expressed as a
join + count (set intersection on (query_id, id)), all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_per_query(
    result: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "id",
) -> DataFrame:
    """(query_id, recall) — hits within the truth top-k, divided by k."""
    r = result.select(F.col(query_col).cast("string").alias(query_col), id_col)
    t = truth.select(F.col(query_col).cast("string").alias(query_col), id_col)
    hits = r.join(t, [query_col, id_col]).groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    all_q = t.select(query_col).distinct()
    return all_q.join(hits, query_col, "left").select(
        query_col,
        (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k))).alias("recall"),
    )


def recall_avg(result: DataFrame, truth: DataFrame, k: int, **kw) -> DataFrame:
    """Single row: (avg_recall)."""
    return recall_per_query(result, truth, k, **kw).agg(
        F.avg("recall").alias("avg_recall")
    )
