"""Streaming semantics: batch/stream parity for windowed aggs, streaming
dedup, custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.streaming.events import (
    dedup_stream,
    read_event_stream,
    run_to_memory,
    user_running_totals,
    windowed_counts,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table


def test_windowed_counts_stream_matches_batch(spark, sf_dir):
    stream = read_event_stream(spark, sf_dir)
    run_to_memory(windowed_counts(stream), "win_counts", "complete")
    got = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        (r.win_start, r.event_type): (r.n, r.total_value)
        for r in windowed_counts(batch).collect()
    }
    assert set(got) == set(want)
    # counts identical; float sums compared rounded (already rounded to 4)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-3


def test_dedup_stream_drops_replays(spark, sf_dir):
    stream = read_event_stream(spark, sf_dir)
    # replay the same file: union of the stream with itself via two reads
    run_to_memory(dedup_stream(stream), "dedup_once", "append")
    n_once = spark.sql("SELECT COUNT(*) AS n FROM dedup_once").collect()[0].n
    n_batch = load_table(spark, sf_dir, "events").count()
    n_distinct = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert n_once == n_distinct <= n_batch


def test_user_running_totals_state(spark, sf_dir):
    stream = read_event_stream(spark, sf_dir)
    run_to_memory(user_running_totals(stream), "user_totals", "update")
    # final state per user == batch aggregation
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY n_events DESC) rn FROM user_totals) WHERE rn = 1"""
        ).collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    want = {r.user_id: (r.n, r.v) for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-2
