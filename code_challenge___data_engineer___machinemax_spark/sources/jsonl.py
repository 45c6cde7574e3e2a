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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

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


@dataclass
class DeadLetterSplit:
    """The two halves of a dead-letter split plus the lifecycle of the
    shared cached parse. Unpacks like the (clean, bad) tuple it replaces;
    additionally a context manager so ingest loops release the cached
    partitions deterministically instead of accumulating them until
    executor storage evicts under pressure (round-2 advice)::

        with dead_letter_split(read_documents_jsonl(spark, path)) as s:
            s.clean.write...; s.bad.write...
        # cache released here
    """

    clean: DataFrame
    bad: DataFrame
    _parsed: DataFrame

    def __iter__(self):
        return iter((self.clean, self.bad))

    def unpersist(self) -> None:
        self._parsed.unpersist()

    def __enter__(self) -> "DeadLetterSplit":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


def dead_letter_split(df: DataFrame) -> DeadLetterSplit:
    """Split parsed rows into (clean_rows_without_corrupt_col,
    quarantined_raw_lines); returns a :class:`DeadLetterSplit` (tuple-
    unpackable, context-managed).

    Persists the parsed frame first: (a) both halves consume it, so the
    parse pass is paid once, and (b) Spark disallows a file-scan plan whose
    referenced columns are ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the quarantine
    side would be exactly that query. DISK_ONLY: the parsed frame is
    corpus-sized, and spilling it to local disk beats both re-parsing and
    pinning executor memory at 100 TB ingest scale.
    """
    df = df.persist(StorageLevel.DISK_ONLY)
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(F.col(_CORRUPT).alias("raw_line"))
    return DeadLetterSplit(clean=clean, bad=bad, _parsed=df)


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
