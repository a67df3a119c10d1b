"""Exact (brute-force) k-nearest-neighbor search.

Parity target: the reference's brute-force oracle and its distributed
scatter/gather search shape:

- exact scoring of all vectors (`index/hnsw_test.go:42-53`,
  `cmd/benchmark/ann-benchmark/main.go:83-99`)
- partial top-k per partition, then global merge-and-truncate
  (`storage/dataset.go:418-431` local merge, `:374-387` global merge)

Spark shape (100 TB-minded):

    vectors ⨯ broadcast(queries)                -- no shuffle of the big side
      → score = distance_col(...)               -- whole-stage codegen
      → mapInPandas partial top-k per query     -- per-input-partition heap,
                                                   survivors ≤ |Q|·k per part
      → Window(query_id, score, id) row_number  -- final top-k over the tiny
                                                   survivor set only

The partial stage only *filters* rows (scores are computed by Catalyst and
pass through Arrow losslessly), so results stay bit-identical to the pure
SQL formulation the DuckDB oracle runs — while the shuffle into the final
window moves |Q|·k·P rows instead of |V|·|Q|.

The single-query path is simply orderBy(score).limit(k), which Spark
executes as TakeOrderedAndProject — the same partial+final top-k the
reference hand-codes.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anndb_spark.functions.spaces import distance_col


def partial_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Per-input-partition top-k per key — a filtering pre-aggregation.

    Keeps at most k rows per key from every input partition without any
    shuffle; a final global top-k still has to run afterwards.  Values
    pass through Arrow untouched, so this is safe to insert into an
    oracle-checked plan.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    schema = df.schema

    def keep_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            cand = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = (
                cand.sort_values(order_cols, kind="mergesort")
                .groupby(key_cols, sort=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    return df.mapInPandas(keep_topk, schema=schema)


def knn_exact(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    space: str = "euclidean",
    vec_col: str = "vector",
    id_col: str = "id",
    query_vec_col: str = "query_vector",
    query_id_col: str = "query_id",
    payload_cols: Sequence[str] = (),
    score_expr: Column | None = None,
    two_stage: bool = True,
) -> DataFrame:
    """Exact kNN of every query against every vector.

    Returns (query_id, rank, id, score [, payload...]) with rank 1..k,
    ascending by (score, id) — id tiebreak makes results deterministic,
    matching FIXTURES.md F5.

    ``score_expr`` lets the caller substitute a custom scoring Column
    (e.g. a literal-query unrolled expression for oracle parity).
    """
    qcols = [F.col(query_id_col), F.col(query_vec_col)]
    joined = vectors.crossJoin(F.broadcast(queries.select(*qcols)))
    score = (
        score_expr
        if score_expr is not None
        else distance_col(F.col(vec_col), F.col(query_vec_col), space)
    )
    scored = joined.select(
        query_id_col,
        id_col,
        score.alias("score"),
        *[F.col(c) for c in payload_cols],
    )
    if two_stage:
        scored = partial_topk(scored, [query_id_col], ["score", id_col], k)
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score", *payload_cols)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    space: str = "euclidean",
    left_id_col: str = "id",
    left_vec_col: str = "vector",
    right_id_col: str = "id",
    right_vec_col: str = "vector",
    exclude_self: bool = False,
    mode: str = "exact",
    centroids=None,
    nprobe: int = 8,
    broadcast_left: bool = True,
    two_stage: bool = True,
) -> DataFrame:
    """Top-k similarity join: for every row of ``left``, its k nearest
    rows of ``right``.

    Returns (left_id, rank, right_id, score), rank 1..k ascending by
    (score, right_id).  ``exclude_self`` drops pairs with equal ids (for
    self-joins: "each item's k nearest *other* items").

    The symmetric generalization of the reference's search path — every
    left row plays the role of a query in
    `storage/dataset.go:349-387`'s scatter/gather, batched into one plan.

    Modes (the physical strategies):

    - ``'exact'`` — cross join + partial/final top-k, the same shape as
      `knn_exact`.  With ``broadcast_left`` (default) the left side rides
      the broadcast and the big right side never shuffles; set it False
      when *both* sides are large and let AQE pick the join (the honest
      cost of an exact big✕big join is O(|L|·|R|) scores — at that scale
      use ``mode='ivf'``).
    - ``'ivf'`` — route left rows to their nprobe nearest coarse
      centroids and score only those clusters of right (see
      `operators/ivf.py`): O(|L|·nprobe·cluster_size) scores, the 100 TB
      path.  Requires ``centroids`` (train via `ivf.train_centroids`).

    Exact mode is bit-identical to the SQL cross-join formulation
    (`pair_distance_sql`), so it is oracle-checkable; ivf mode is
    validated by recall against it.
    """
    if mode == "ivf":
        if centroids is None:
            raise ValueError("mode='ivf' requires centroids")
        from anndb_spark.operators.ivf import search_ivf

        inner_k = k + 1 if exclude_self else k
        res = search_ivf(
            right.select(
                F.col(right_id_col).alias("id"), F.col(right_vec_col).alias("vector")
            ),
            left.select(
                F.col(left_id_col).alias("query_id"),
                F.col(left_vec_col).alias("query_vector"),
            ),
            inner_k,
            centroids,
            nprobe=nprobe,
            space=space,
        ).select(
            F.col("query_id").alias("left_id"),
            F.col("id").alias("right_id"),
            F.col("score"),
        )
        if exclude_self:
            res = res.filter(F.col("left_id") != F.col("right_id"))
        w = Window.partitionBy("left_id").orderBy(
            F.col("score").asc(), F.col("right_id").asc()
        )
        return (
            res.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("left_id", "rank", "right_id", "score")
        )
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")

    qdf = left.select(
        F.col(left_id_col).alias("left_id"), F.col(left_vec_col).alias("__qvec")
    )
    vdf = right.select(
        F.col(right_id_col).alias("right_id"), F.col(right_vec_col).alias("__vvec")
    )
    joined = vdf.crossJoin(F.broadcast(qdf) if broadcast_left else qdf)
    if exclude_self:
        joined = joined.filter(F.col("left_id") != F.col("right_id"))
    scored = joined.select(
        "left_id",
        "right_id",
        distance_col(F.col("__vvec"), F.col("__qvec"), space).alias("score"),
    )
    if two_stage:
        scored = partial_topk(scored, ["left_id"], ["score", "right_id"], k)
    w = Window.partitionBy("left_id").orderBy(F.col("score").asc(), F.col("right_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("left_id", "rank", "right_id", "score")
    )


def knn_search(
    vectors: DataFrame,
    query: Sequence[float],
    k: int,
    space: str = "euclidean",
    vec_col: str = "vector",
    id_col: str = "id",
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Single-query exact kNN: orderBy + limit → TakeOrderedAndProject.

    Spark's TakeOrderedAndProject computes per-partition partial top-k in
    the mappers and merges on the driver — exactly the reference's
    two-level scatter/gather (`storage/dataset.go:374-387,418-431`) as
    one built-in physical operator.
    """
    qlit = F.array(*[F.lit(float(x)).cast("double") for x in query])
    scored = vectors.select(
        id_col,
        distance_col(F.col(vec_col), qlit, space).alias("score"),
        *[F.col(c) for c in payload_cols],
    )
    return scored.orderBy(F.col("score").asc(), F.col(id_col).asc()).limit(k)
