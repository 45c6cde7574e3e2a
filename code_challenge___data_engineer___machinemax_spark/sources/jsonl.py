"""JSONL (newline-delimited JSON) document source/sink.

The interchange format of LLM training-data pipelines: one JSON object per
line, schema-on-read. This generalizes the reference's line-oriented file
source (URL lists, index.py:200-205 / newsspider.py:24-27 — read lines,
strip, skip blanks) to structured records.

Scale notes:
- ALWAYS pass an explicit schema on read: schema inference is a full extra
  pass over the data (at 100 TB it doubles ingest cost) and silently widens
  types on dirty rows. ``DOCUMENT_SCHEMA`` is the canonical document shape.
- Corrupt lines are data, not exceptions: mode=PERMISSIVE routes them to
  ``_corrupt_record`` (the same dead-letter discipline as the crawl
  fetcher's (ok, error) columns, reference index.py:124-129), so one bad
  line in a 100 TB ingest cannot kill the job. ``dead_letter_split``
  separates clean rows from quarantined ones.
- Writes are plain ``df.write.json`` with gzip so the output stays
  line-splittable for downstream readers; partition count = file count
  (repartition upstream to control file sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical document shape (mirrors testdata documents.parquet)
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENT_SCHEMA
) -> DataFrame:
    """Read JSONL documents with an explicit schema and dead-letter capture.

    Returns the full frame including ``_corrupt_record`` (NULL for clean
    rows); use :func:`dead_letter_split` to separate them.
    """
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    return (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def dead_letter_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_lines).

    Persists the parsed frame first: (a) both halves consume it, so the
    parse pass is paid once, and (b) Spark disallows a file-scan plan whose
    referenced columns are ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the quarantine
    side would be exactly that query. At cluster scale use
    ``StorageLevel.DISK_ONLY`` (or write both halves out in one job) rather
    than default memory caching.
    """
    df = df.persist()
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(F.col(_CORRUPT).alias("raw_line"))
    return clean, bad


def write_documents_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Write documents as (optionally gzipped) JSONL — one object per line,
    one file per partition."""
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_documents_csv(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENT_SCHEMA
) -> DataFrame:
    """CSV twin of :func:`read_documents_jsonl`: explicit schema, header,
    PERMISSIVE dead-letter capture (malformed lines -> ``_corrupt_record``),
    multiLine off so files stay splittable. Same :func:`dead_letter_split`
    applies."""
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    return (
        spark.read.schema(read_schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("enforceSchema", "false")
        .csv(path)
    )


def write_documents_csv(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Write documents as headered CSV (quoted as needed), one file per
    partition."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("compression", compression)
        .csv(path)
    )
