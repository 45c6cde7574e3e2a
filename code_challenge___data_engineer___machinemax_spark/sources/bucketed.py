"""Bucketed table layout: pre-shuffled storage for co-located joins.

The 100 TB answer to "orders ⋈ lineitem shuffles both sides every query":
write both tables bucketed (and sorted) by the join key once at ingest;
every subsequent equi-join on that key reads co-located buckets and skips
the exchange entirely (SortMergeJoin with zero Exchange operators —
asserted by tests/test_bucketing.py).

This is the persisted-layout generalization of the repartition() the batch
crawl uses per round: pay the shuffle once at write time, amortize it over
every read. The bucket count is the write-time parallelism contract — pick
it for the target cluster (e.g. 4× executors), not the test machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed+sorted external parquet table.

    Bucket metadata lives in the session catalog; the files themselves are
    plain parquet split by ``hash(bucket_col) % n_buckets``.
    """
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys — shuffle-free
    when both sides share the bucket count (Catalyst aligns mismatched
    counts by coalescing buckets when enabled)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
