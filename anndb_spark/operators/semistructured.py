"""Semi-structured column extraction for event/log tables.

Training-data pipelines carry JSON payload columns (request logs, tool
traces, metadata sidecars); the standard first stage is typed field
extraction + keyed rollups.  Everything here is JVM-side
(`get_json_object` runs in codegen; no Python in the row loop), so
the same query has an exact DuckDB oracle via `json_extract_string`.

Scale shape: extraction is per-row (no shuffle); the rollup is one
keyed aggregation with map-side partials.  Float sums go through
DECIMAL so the result is order-independent and bit-stable across
engines (same trick as the events_hourly query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_json_field(
    df: DataFrame, col: str, path: str, out: str, cast: str = "string"
) -> DataFrame:
    """Typed field extraction: ``path`` is a JSONPath like ``$.k``."""
    return df.withColumn(
        out, F.get_json_object(F.col(col), path).cast(cast)
    )


def props_stats(
    df: DataFrame,
    props_col: str = "props",
    key_col: str = "event_type",
    value_col: str = "value",
    field: str = "k",
) -> DataFrame:
    """Per-``key_col`` rollup of a JSON payload field: row count, rows
    where the field parses, exact integer sum of the field, and the
    decimal-stable sum of ``value_col``."""
    k = F.get_json_object(F.col(props_col), f"$.{field}").cast("long")
    return (
        df.select(F.col(key_col), k.alias("_k"), F.col(value_col))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_k").alias("n_with_field"),
            F.sum("_k").alias("sum_field"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
