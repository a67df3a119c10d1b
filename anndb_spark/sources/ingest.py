"""Raw-corpus ingestion: schema-enforced JSONL / CSV document readers
with corrupt-record quarantine.

Real crawls arrive as JSONL shards with a non-trivial defect rate
(truncated lines, wrong types, stray bytes).  The Spark-first answer
is the built-in json/csv reader in PERMISSIVE mode with
``columnNameOfCorruptRecord``: well-formed rows parse columnar and
codegen-friendly, defective lines land intact in a quarantine column
instead of failing the job — at 100 TB a fail-on-first-bad-line
ingest never finishes.  ``read_documents_jsonl`` splits the two
streams; callers write the quarantine aside for triage and feed the
clean frame to the pipeline operators.

Scale notes: JSONL is splittable line-by-line, so one 100 GB shard
still fans out across tasks (multiLine JSON is not — never ingest
multiLine at scale); an explicit schema is mandatory because schema
inference is a full extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _split_streams(
    df: DataFrame, schema: T.StructType, id_col: str
) -> tuple[DataFrame, DataFrame]:
    clean = df.filter(F.col(_CORRUPT).isNull()).select(
        *[f.name for f in schema.fields]
    )
    # Spark refuses scans whose referenced columns are ONLY the
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    # quarantine projects the best-effort parsed id alongside (useful
    # for triage anyway), and the SAME rule is why a count()-shaped
    # query on the lazy `clean` frame fails (column pruning leaves
    # just the filter's corrupt column): audits that only count
    # should go through ``ingest_documents`` instead.
    quarantine = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw"), F.col(id_col)
    )
    return clean, quarantine


def ingest_documents(
    spark: SparkSession,
    path: str,
    out_dir: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    fmt: str = "json",
    id_col: str = "doc_id",
    **reader_options: str,
) -> tuple[DataFrame, DataFrame]:
    """ONE pass over the raw shards materializing clean and
    quarantine together: the parsed frame is written partitioned by
    ``is_clean``, so the split costs a partition-pruned read instead
    of a second scan, and every downstream query (including bare
    counts) works because it reads parquet, not raw JSON/CSV.  This
    is the recommended ingest shape at corpus scale — ingestion is a
    materialization step anyway."""
    full = T.StructType(
        schema.fields + [T.StructField(_CORRUPT, T.StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    df = reader.json(path) if fmt == "json" else reader.csv(path)
    unified = df.select(
        *[f.name for f in schema.fields],
        F.col(_CORRUPT).alias("raw"),
        F.col(_CORRUPT).isNull().alias("is_clean"),
    )
    unified.write.mode("overwrite").partitionBy("is_clean").parquet(out_dir)
    # partition-dir values come back as strings unless inferred
    back = spark.read.parquet(out_dir).withColumn(
        "is_clean", F.col("is_clean").cast("boolean")
    )
    clean = back.filter(F.col("is_clean")).select(
        *[f.name for f in schema.fields]
    )
    quarantine = back.filter(~F.col("is_clean")).select("raw", id_col)
    return clean, quarantine


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): ``clean`` has exactly ``schema``'s columns
    for every parseable line; ``quarantine`` holds each defective line
    verbatim in ``raw`` plus the best-effort parsed ``id_col``."""
    full = T.StructType(
        schema.fields + [T.StructField(_CORRUPT, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _split_streams(df, schema, id_col)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    header: bool = True,
    sep: str = ",",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of ``read_documents_jsonl`` — same clean/quarantine
    contract via the csv reader's PERMISSIVE mode."""
    full = T.StructType(
        schema.fields + [T.StructField(_CORRUPT, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", "true" if header else "false")
        .option("sep", sep)
        .csv(path)
    )
    return _split_streams(df, schema, id_col)
