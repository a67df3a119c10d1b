"""Parquet sources over the driver-generated TPC-H-ish tables, plus the
deterministic vector views of FIXTURES.md §F6.

The reference's only batch source is the ann-benchmarks HDF5 reader
(`cmd/benchmark/ann-benchmark/main.go:23-99`); here every dataset is a
parquet scan, which gives Catalyst predicate pushdown + column pruning
on the 100 TB path for free.

Vector views are defined as *portable SQL component expressions* shared
verbatim between Spark and DuckDB (modulo a couple of mechanical dialect
substitutions handled by ``to_dialect``), so the correctness oracle
computes bit-identical vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def to_dialect(sql: str, dialect: str) -> str:
    """Mechanical Spark→DuckDB SQL substitutions for our portable subset."""
    if dialect == "spark":
        return sql
    if dialect == "duckdb":
        return sql.replace(" AS STRING", " AS VARCHAR")
    raise ValueError(f"unknown dialect {dialect!r}")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts arrives either as a real TIMESTAMP (micros) or as
    TIMESTAMP(NANOS), which Spark's parquet reader only accepts as a
    long; normalize both to a microsecond TIMESTAMP (sub-microsecond
    precision is not used by any query).

    The nanosAsLong conf is only set when the plain read fails (i.e. the
    file really carries TIMESTAMP(NANOS)); it then has to stay set for
    the lifetime of the lazy plan, so it is left session-wide — in these
    datasets only events.parquet may contain nanos timestamps, and the
    bigint branch below re-normalizes any scan that surfaces them.

    Nanos→micros uses exact integer division (``ts div 1000``): the
    ~1.7e18 ns values exceed double's 2^53 exact range, so a float
    divide could land whole microseconds off by one."""
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# --- lineitem_vec (FIXTURES.md F6): 8-d deterministic embedding -----------

_LINEITEM_VEC_ID = "concat(CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING))"

_LINEITEM_VEC_COMPONENTS = (
    "CAST(l_quantity AS DOUBLE)",
    "CAST(l_extendedprice AS DOUBLE) / 1000.0",
    "CAST(l_discount AS DOUBLE) * 100.0",
    "CAST(l_tax AS DOUBLE) * 100.0",
    "CAST(l_partkey % 97 AS DOUBLE)",
    "CAST(l_suppkey % 89 AS DOUBLE)",
    "CAST(day(l_shipdate) AS DOUBLE)",
    "CAST(month(l_shipdate) AS DOUBLE)",
)


def lineitem_vec_components(dialect: str) -> tuple[str, tuple[str, ...]]:
    """(id_sql, component_sqls) in the requested dialect."""
    return (
        to_dialect(_LINEITEM_VEC_ID, dialect),
        tuple(to_dialect(c, dialect) for c in _LINEITEM_VEC_COMPONENTS),
    )


def lineitem_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as a vector dataset: (id, vector ARRAY<DOUBLE>, metadata)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    id_sql, comps = lineitem_vec_components("spark")
    return li.select(
        F.expr(id_sql).alias("id"),
        F.array(*[F.expr(c) for c in comps]).alias("vector"),
        F.create_map(
            F.lit("returnflag"), F.col("l_returnflag"),
            F.lit("linestatus"), F.col("l_linestatus"),
        ).alias("metadata"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    )


def embeddings_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings table as a vector dataset: (id, vector, label)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        F.col("label"),
    )
