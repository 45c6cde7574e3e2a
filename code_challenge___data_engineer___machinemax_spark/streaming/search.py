"""Streaming search: continuous keyword matching over the article store.

The reference's API answers one keyword request per call (api.py:11-39);
the streaming twin watches the store and maintains match counts as new
articles are ingested — the crawl->store->search loop as one continuous
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.search import keyword_search


def stream_article_matches(
    spark: SparkSession, store_path: str, keyword: str
) -> DataFrame:
    """readStream over the article store, filtered to keyword matches.
    Append-mode rows are live search hits; aggregate downstream as needed."""
    schema = spark.read.parquet(store_path).schema
    stream = spark.readStream.schema(schema).parquet(store_path)
    return keyword_search(stream, keyword)


def streaming_match_counts(
    spark: SparkSession, store_path: str, keyword: str
) -> DataFrame:
    """Running per-section count of matching articles."""
    hits = stream_article_matches(spark, store_path, keyword)
    return hits.groupBy("section").agg(F.count("*").alias("n_matches"))
