"""Streaming corpus ingest with incremental exact-dedup.

The LLM-pipeline ingest shape: documents stream in (a landing directory
here; Kafka at production scale — the code is source-agnostic past
``readStream``), each micro-batch is fingerprinted, deduped within itself,
anti-joined against the persistent fingerprint store, and only NOVEL
documents are appended to the corpus — so re-delivered or re-crawled
content can never duplicate the corpus, no matter how many times it
arrives.

This is the streaming generalization of the crawl frontier's
"never process twice" set discipline (reference index.py:117-119) applied
to document content instead of URLs: the dedup key is
:func:`~..operators.dedup.text_digest` (md5 of normalized text), the same
32-byte key batch exact-dedup groups on.

Scale notes: the store keeps ONLY fingerprints (32-byte strings) next to
the corpus — the anti-join probe reads the narrow fingerprint table, never
the document bodies. At production scale the fingerprint table is a Delta
table with a MERGE (or a bloom-filter-fronted key-value store); the
append+anti-join here is the plain-parquet equivalent with the same
semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.dedup import text_digest
from ..sources.jsonl import DOCUMENT_SCHEMA


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def dedup_ingest_stream(spark: SparkSession, landing_dir: str, store_dir: str) -> dict[str, int]:
    """Drain the landing directory (JSONL documents) into a deduped corpus.

    Blocks until the stream quiesces, then returns counts. Layout under
    ``store_dir``: ``corpus/`` (unique documents + fingerprint column) and
    ``fingerprints/`` (the narrow dedup-key table the anti-join probes).
    Restart-safe: the checkpoint dir pins source progress, and a replayed
    batch's documents are all already in the fingerprint store, so replays
    append nothing (idempotent by construction — no epoch tracking needed,
    unlike the aggregating upsert in events.py).
    """
    corpus_dir = os.path.join(store_dir, "corpus")
    fp_dir = os.path.join(store_dir, "fingerprints")
    checkpoint_dir = os.path.join(store_dir, "_checkpoint")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        batch = (
            batch_df.filter(F.col("text").isNotNull())
            .withColumn("fingerprint", text_digest("text"))
            .dropDuplicates(["fingerprint"])  # within-batch dedup first
        )
        seen = _read_or_empty(sess, fp_dir, "fingerprint string")
        # materialize so the fingerprint append below can't feed back into
        # this batch's own anti-join (same discipline as the crawl stream's
        # visited table, crawl_stream.py)
        fresh = batch.join(seen, "fingerprint", "left_anti").localCheckpoint()
        if not fresh.take(1):
            return
        fresh.select("fingerprint").write.mode("append").parquet(fp_dir)
        fresh.write.mode("append").parquet(corpus_dir)

    stream = spark.readStream.schema(DOCUMENT_SCHEMA).json(landing_dir)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    corpus = _read_or_empty(
        spark, corpus_dir,
        "doc_id long, text string, lang string, source string, n_chars long, fingerprint string",
    )
    return {
        "corpus_docs": corpus.count(),
        "distinct_fingerprints": corpus.select("fingerprint").distinct().count(),
    }
