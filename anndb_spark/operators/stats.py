"""Grouped distribution statistics with an explicit exact/approx split.

Spark's exact ``percentile`` materializes EVERY value of a group in one
aggregation buffer (OpenHashMap of value -> count inside a single
ImperativeAggregate) — at 100 TB a hot group is billions of entries in
one task's heap, an OOM by construction.  ``approx_percentile`` is the
scale path: a KLL/GK-style mergeable sketch whose buffer is bounded by
the ``accuracy`` knob (~accuracy entries), with rank error <=
1/accuracy, and it merges map-side like any other partial aggregate.

Rule of thumb encoded here: ``exact=True`` is for oracle rows and
small-cardinality profiling at test scale; production profiling goes
through the sketch.  The default accuracy 10000 bounds rank error to
1e-4 — for a length distribution that is far below any decision
threshold a corpus filter would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ACCURACY = 10_000


def _quantile_name(p: float) -> str:
    """Deterministic column name for a probability: 0.5 -> 'p50',
    0.25 -> 'p25', 1.0 -> 'p100', 0.999 -> 'p99_9'.  Always percent-
    scaled and never contains '.', so names read correctly (p50, not
    the ambiguous 'p5') and need no backquoting in column references."""
    pct = p * 100.0
    ipct = int(round(pct))
    if abs(pct - ipct) < 1e-9:
        return f"p{ipct:02d}"
    return "p" + f"{pct:g}".replace(".", "_").replace("-", "m")


def grouped_distinct(
    df: DataFrame,
    value_col: str,
    by: str | list[str] | None = None,
    exact: bool = False,
    rsd: float = 0.05,
    name: str = "n_distinct",
) -> DataFrame:
    """(by..., n_rows, <name>): distinct-value cardinality per group,
    with the same exact/approx split as `grouped_quantiles`.

    ``exact=False`` (default, the 100 TB path): HyperLogLog++ sketch
    (`approx_count_distinct`) — fixed O(1/rsd²) buffer per group that
    merges map-side like any partial aggregate; relative error ≤ rsd.
    ``exact=True`` (oracle/test path): ``count_distinct``, which
    plans a per-group de-dup Expand+Exchange — exact, but a hot group
    shuffles every distinct value to one task; refuse it on unbounded
    key domains."""
    by_cols = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col)
    agg = (
        F.count_distinct(v) if exact else F.approx_count_distinct(v, rsd)
    ).alias(name)
    aggs = [F.count("*").alias("n_rows"), agg]
    if by_cols:
        return df.groupBy(*by_cols).agg(*aggs)
    return df.agg(*aggs)


def grouped_quantiles(
    df: DataFrame,
    probs: list[float],
    value_col: str,
    by: str | list[str] | None = None,
    exact: bool = False,
    accuracy: int = DEFAULT_ACCURACY,
    names: list[str] | None = None,
) -> DataFrame:
    """(by..., n, q_<p>...) per group.

    ``exact=False`` (default, the 100 TB path): ``approx_percentile``
    sketch, buffer O(accuracy) per group whatever the group size, rank
    error <= 1/accuracy, integer-valued results for integer inputs (the
    sketch returns actual data values, no interpolation).

    ``exact=True`` (oracle/test path): Spark ``percentile`` ==
    DuckDB ``quantile_cont`` bit-identically, but buffers every group
    value — refuse to reach for this on unbounded groups.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if names is None:
        names = [_quantile_name(p) for p in probs]
    if len(names) != len(probs):
        raise ValueError("names must align with probs")
    v = F.col(value_col)
    if exact:
        qs = F.percentile(v, F.lit(probs))
    else:
        qs = F.approx_percentile(v, F.lit(probs), F.lit(int(accuracy)))
    aggs = [F.count("*").alias("n_rows")] + [
        qs.getItem(i).alias(nm) for i, nm in enumerate(names)
    ]
    if by_cols:
        return df.groupBy(*by_cols).agg(*aggs)
    return df.agg(*aggs)


def referential_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """One-row data-quality audit of a key relationship between two
    tables: row counts, orphan keys on each side (present in one,
    absent in the other), and duplicated keys on each side — the
    pipeline-hygiene check run before any join is trusted (a silent
    orphan set means the join drops rows; silent dup keys mean it
    fans out).

    100 TB shape: both tables are reduced to key-only projections
    immediately (column pruning reaches the scans), each side pays one
    hash aggregate on its key, and the orphan checks are anti-joins
    between the two DISTINCT key sets — never between the tables.  The
    six scalars then cross-join as single-row aggregates (no data
    movement)."""
    lk = left.select(F.col(left_key).alias("k"))
    rk = right.select(F.col(right_key).alias("k"))
    lg = lk.groupBy("k").count()
    rg = rk.groupBy("k").count()
    l_stats = lg.agg(
        F.sum("count").alias("n_left"),
        F.sum(F.when(F.col("count") > 1, 1).otherwise(0)).alias(
            "n_left_dup_keys"
        ),
    )
    r_stats = rg.agg(
        F.sum("count").alias("n_right"),
        F.sum(F.when(F.col("count") > 1, 1).otherwise(0)).alias(
            "n_right_dup_keys"
        ),
    )
    l_orph = (
        lg.select("k")
        .join(rg.select("k"), "k", "left_anti")
        .agg(F.count("*").alias("n_left_orphan_keys"))
    )
    r_orph = (
        rg.select("k")
        .join(lg.select("k"), "k", "left_anti")
        .agg(F.count("*").alias("n_right_orphan_keys"))
    )
    return l_stats.crossJoin(r_stats).crossJoin(l_orph).crossJoin(r_orph)
