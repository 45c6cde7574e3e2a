"""Checkpoint-recovery semantics: a streaming query stopped mid-stream and
restarted from the SAME checkpoint must (a) process data that arrived while
it was down, (b) never duplicate what it already committed (exactly-once
file sink), and (c) resume stateful aggregation from the recovered state
store, not from zero. This is the crash-recovery contract a production
deployment actually relies on — the streaming counterpart of test_txn's
crash-injection cases."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("amount_c", T.LongType()),
    ]
)


def _write_wave(src: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rows(lo: int, hi: int) -> list[dict]:
    return [
        {"event_id": i, "user_id": i % 7, "amount_c": 10 * i} for i in range(lo, hi)
    ]


def _start_file_sink(spark, src: str, chk: str, out: str):
    stream = spark.readStream.schema(SCHEMA).json(src)
    return (
        stream.withColumn("doubled_c", F.col("amount_c") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )


def test_file_sink_exactly_once_across_restart(spark, tmp_path):
    src, chk, out = (str(tmp_path / d) for d in ("src", "chk", "out"))
    os.makedirs(src)
    _write_wave(src, "wave1.json", _rows(0, 100))

    q = _start_file_sink(spark, src, chk, out)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 100

    # data lands while the query is DOWN
    _write_wave(src, "wave2.json", _rows(100, 250))

    q = _start_file_sink(spark, src, chk, out)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    # exactly-once: every event exactly once, no wave-1 replay
    assert got.count() == 250
    assert got.select("event_id").distinct().count() == 250
    assert got.agg(F.sum("doubled_c")).first()[0] == sum(20 * i for i in range(250))

    # idle restart: nothing new -> nothing appended, nothing re-emitted
    q = _start_file_sink(spark, src, chk, out)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 250


def test_stateful_agg_state_recovers_across_restart(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    os.makedirs(src)
    emitted: dict[int, dict[int, int]] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.setdefault(batch_id, {})[r["user_id"]] = r["total_c"]

    def start():
        stream = spark.readStream.schema(SCHEMA).json(src)
        agg = stream.groupBy("user_id").agg(
            F.sum("amount_c").cast("bigint").alias("total_c")
        )
        return (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", chk)
            .trigger(processingTime="0 seconds")
            .start()
        )

    _write_wave(src, "wave1.json", _rows(0, 100))
    q = start()
    q.processAllAvailable()
    q.stop()

    _write_wave(src, "wave2.json", _rows(100, 250))
    q = start()  # fresh query object, same checkpoint -> recovered state
    q.processAllAvailable()
    q.stop()

    # the post-restart emission must equal the FULL-history totals: the
    # wave-1 contribution comes out of the recovered state store, since
    # wave-1 rows were never re-read (exactly-once source offsets)
    final = {}
    for b in sorted(emitted):
        final.update(emitted[b])
    expect = {}
    for i in range(250):
        expect[i % 7] = expect.get(i % 7, 0) + 10 * i
    assert final == expect
