"""Deterministic hash-based sampling and split assignment.

Corpus curation needs REPRODUCIBLE sampling: the same document must
land in the same sample/split on every run, on any cluster size, with
no RNG state to coordinate — so membership is a pure function of the
document id.  A document is selected when the first 8 hex chars of
``md5(salt || ':' || id)`` fall below a threshold derived from the
fraction (uniform on [0, 16^8)); split assignment generalizes this to
cumulative thresholds.  Everything is a JVM column expression
(md5 + substring + string compare — hex strings compare binary-
lexicographically identically in Spark and DuckDB, so the oracle is
bit-exact), per-row with no shuffle: the filter pushes past scans and
composes with any downstream operator at 100 TB.

The salt decouples samples: different salts draw independent
subsets, the same salt is stable across runs/releases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8


def _bucket(id_col: Column, salt: str) -> Column:
    """First 8 md5 hex chars of 'salt:id' — uniform over [0, 16^8)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8
    )


def _threshold_hex(fraction: float) -> str:
    f = min(max(float(fraction), 0.0), 1.0)
    return format(min(int(f * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of id."""
    return df.filter(
        _bucket(F.col(id_col), salt) < F.lit(_threshold_hex(fraction))
    )


def hash_split(
    df: DataFrame,
    weights: list[float],
    labels: list[str],
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one of ``labels`` with expected
    proportions ``weights`` (normalized), deterministically by id —
    the train/val/test split that survives reshuffles and re-runs."""
    if len(weights) != len(labels) or not labels:
        raise ValueError("weights and labels must align and be non-empty")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = _bucket(F.col(id_col), salt)
    acc = 0.0
    expr = F.lit(labels[-1])  # the last band absorbs rounding
    cuts: list[tuple[str, str]] = []
    for w, lab in zip(weights[:-1], labels[:-1]):
        acc += w / total
        cuts.append((_threshold_hex(acc), lab))
    for cut, lab in reversed(cuts):
        expr = F.when(b < F.lit(cut), F.lit(lab)).otherwise(expr)
    return df.withColumn(out_col, expr)


def split_thresholds(weights: list[float]) -> list[str]:
    """The cumulative hex cutpoints (for oracle SQL twins / audits)."""
    total = float(sum(weights))
    acc, out = 0.0, []
    for w in weights[:-1]:
        acc += w / total
        out.append(_threshold_hex(acc))
    return out


def stratified_take(
    df: DataFrame,
    n_per_group: int,
    by: str | list[str],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY min(n, group size) rows per group, deterministically.

    ``hash_sample`` keeps an *expected* fraction; curation frequently
    needs exact per-stratum counts instead (n eval docs per language,
    n audit samples per source).  Rows are ranked inside each group by
    the same md5 hash used for sampling (uniform, reproducible, salt-
    decoupled; id tiebreak) and the top n kept — so the selection is a
    pure function of (id, salt), independent of partitioning or
    cluster size, and growing a group only ever ADDS candidates
    without reshuffling previously selected ones... (note: unlike
    reservoir sampling, membership may change as the group grows —
    what is stable is the ranking function, not the selected set).

    Cost: one hash-partition shuffle of (by, id, hash) width — Spark
    ≥3.5 plants a pre-shuffle WindowGroupLimit, so at most n rows per
    group per input partition cross the wire, never the group."""
    by_cols = [by] if isinstance(by, str) else list(by)
    if n_per_group <= 0:
        raise ValueError("n_per_group must be positive")
    from pyspark.sql import Window

    w = Window.partitionBy(*by_cols).orderBy(
        _bucket(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )
