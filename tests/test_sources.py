"""Source/sink format coverage: the article schema round-trips through the
engine's supported formats (parquet is the store default; csv/json are the
interchange paths) with null fidelity where the format allows it."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.schemas import ARTICLE

ROWS = [
    ("http://s/a", "T1", "d", "au", "news", "k1,k2", "alpha body"),
    ("http://s/b", None, None, None, None, None, None),  # all-null payload
    ("http://s/c", "", "x", "y", "sport", "", ""),  # empty strings distinct from null
]


def test_parquet_roundtrip_preserves_null_vs_empty(spark, tmp_path):
    df = spark.createDataFrame(ROWS, ARTICLE)
    p = str(tmp_path / "a.parquet")
    df.write.parquet(p)
    back = {r.url: r for r in spark.read.parquet(p).collect()}
    assert back["http://s/b"].title is None
    assert back["http://s/c"].title == ""  # '' survives as '', not NULL


def test_json_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, ARTICLE)
    p = str(tmp_path / "a.json")
    df.write.json(p)
    back = {r.url: r for r in spark.read.schema(ARTICLE).json(p).collect()}
    assert back["http://s/b"].text is None
    assert back["http://s/a"].keywords == "k1,k2"


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, ARTICLE)
    p = str(tmp_path / "a.orc")
    df.write.orc(p)
    back = {r.url: r for r in spark.read.orc(p).collect()}
    assert back["http://s/b"].title is None
    assert back["http://s/c"].title == ""


def test_csv_roundtrip_documented_null_caveat(spark, tmp_path):
    df = spark.createDataFrame(ROWS, ARTICLE)
    p = str(tmp_path / "a.csv")
    df.write.option("header", True).csv(p)
    back = {
        r.url: r
        for r in spark.read.schema(ARTICLE).option("header", True).csv(p).collect()
    }
    # CSV cannot distinguish '' from NULL without emptyValue tricks — both
    # come back NULL; the store format (parquet) is what preserves the edge
    assert back["http://s/b"].title is None
    assert back["http://s/c"].title is None
    assert back["http://s/a"].text == "alpha body"

def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Snapshot-evolution read: a v2 writer adds a column; mergeSchema
    reads both generations with NULL backfill for v1 rows, and the old
    fixed-schema read path still works against the union."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, text string"
    ).write.parquet(base + "/gen=1")
    spark.createDataFrame(
        [(3, "gamma", "en")], "id long, text string, lang string"
    ).write.parquet(base + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    assert set(merged.columns) == {"id", "text", "lang"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].lang is None and rows[3].lang == "en"
    # a reader pinned to the v1 schema keeps working across generations
    from pyspark.sql import types as T

    v1 = T.StructType([T.StructField("id", T.LongType()), T.StructField("text", T.StringType())])
    old_reader = spark.read.schema(v1).parquet(base + "/gen=1", base + "/gen=2")
    assert old_reader.count() == 3 and set(old_reader.columns) == {"id", "text"}


# -- custom Python DataSource (sources/pyds.py) -----------------------------


def test_pyds_pushdown_handles_type_eq_and_returns_rest():
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        SyntheticEventsReader,
        _RangePartition,
    )

    r = SyntheticEventsReader({"rows": "200", "seed": "s42"})
    unsupported = list(
        r.pushFilters([EqualTo(("event_type",), "view"), GreaterThan(("user_id",), 5)])
    )
    assert [type(f).__name__ for f in unsupported] == ["GreaterThan"]
    rows = list(r.read(_RangePartition(0, 200)))
    assert rows and all(t == "view" for _, _, t, _ in rows)


def test_pyds_end_to_end_filter_and_partitions(spark):
    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    read = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "8")
        .option("seed", "px")
    )
    full = read.load()
    assert full.rdd.getNumPartitions() == 8
    assert full.count() == 1000
    pushed = read.load().filter("event_type = 'purchase'")
    recheck = [r for r in full.collect() if r.event_type == "purchase"]
    assert sorted(map(tuple, pushed.collect())) == sorted(map(tuple, recheck))
    # deterministic per seed, different across seeds
    again = read.load()
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, full.collect()))
    other = read.option("seed", "py").load()
    assert sorted(map(tuple, other.collect())) != sorted(map(tuple, full.collect()))


def test_pyds_stream_reader_matches_batch(spark):
    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("rows", "900")
        .option("rows_per_batch", "250")
        .option("seed", "stx")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_stream_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    got = spark.sql("SELECT * FROM pyds_stream_t")
    batch = (
        spark.read.format("synthetic_events")
        .option("rows", "900")
        .option("seed", "stx")
        .load()
    )
    assert n_batches == 4  # 250+250+250+150: offsets actually advanced
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_pyds_jsonl_commit_sink_two_phase(spark, tmp_path):
    import glob
    import json as _json

    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        register_jsonl_commit_sink,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    register_jsonl_commit_sink(spark)
    src = (
        spark.read.format("synthetic_events")
        .option("rows", "120")
        .option("seed", "wr1")
        .load()
        .repartition(4)
    )
    out = str(tmp_path / "sink")
    src.write.format("jsonl_commit").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files  # commit marker only after all parts landed
    assert not any(f.startswith("_staged") for f in files)  # staging cleaned
    parts = glob.glob(out + "/part-*.jsonl")
    assert len(parts) == 4  # one published file per task
    rows = [_json.loads(line) for f in parts for line in open(f)]
    assert sorted((r["event_id"], r["user_id"]) for r in rows) == sorted(
        (r.event_id, r.user_id) for r in src.collect()
    )


def test_pyds_lessthan_pushdown_prunes_partition_planning(spark):
    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    read = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "8")
        .option("seed", "lt1")
    )
    pruned = read.load().filter("event_id < 100")
    # the pushed bound caps the planned domain: 100 rows over ceil splits,
    # not 1000 rows filtered after the fact
    assert pruned.count() == 100
    assert {r.event_id for r in pruned.collect()} == set(range(100))
    full = read.load()
    kept = [tuple(r) for r in full.collect() if r.event_id < 100]
    assert sorted(map(tuple, pruned.collect())) == sorted(kept)


def test_pyds_lessthan_pushdown_caps_planned_domain_unit():
    """Direct evidence the LessThan bound reaches the PLANNER (the e2e
    equality above would also pass if Spark re-applied the filter
    post-read): after pushFilters, the reader's domain and the last
    planned split end at the bound."""
    from pyspark.sql.datasource import LessThan

    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        SyntheticEventsReader,
    )

    r = SyntheticEventsReader({"rows": "1000", "partitions": "8"})
    assert list(r.pushFilters([LessThan(("event_id",), 100)])) == []  # consumed
    assert r.rows == 100
    parts = r.partitions()
    assert parts[-1].end == 100
    assert sum(p.end - p.start for p in parts) == 100  # 100 rows planned, not 1000


def test_pyds_sink_overwrite_append_and_coercion(spark, tmp_path):
    import glob
    import json as _json

    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        register_jsonl_commit_sink,
    )

    register_jsonl_commit_sink(spark)
    out = str(tmp_path / "sink2")
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string").repartition(2)
    b = spark.createDataFrame([(3, "z")], "id long, s string").repartition(1)

    a.write.format("jsonl_commit").option("path", out).mode("append").save()
    b.write.format("jsonl_commit").option("path", out).mode("append").save()
    rows = [_json.loads(l) for f in glob.glob(out + "/part-*.jsonl") for l in open(f)]
    assert sorted(r["id"] for r in rows) == [1, 2, 3]  # append really appends

    b.write.format("jsonl_commit").option("path", out).mode("overwrite").save()
    rows = [_json.loads(l) for f in glob.glob(out + "/part-*.jsonl") for l in open(f)]
    assert sorted(r["id"] for r in rows) == [3]  # prior jobs' parts removed

    # non-JSON-native types coerce via str() instead of aborting the job
    ts = spark.sql("SELECT 1 AS id, timestamp'2024-01-02 03:04:05' AS ts")
    ts.write.format("jsonl_commit").option("path", out).mode("overwrite").save()
    row = [_json.loads(l) for f in glob.glob(out + "/part-*.jsonl") for l in open(f)][0]
    assert row["ts"].startswith("2024-01-02")


def test_pyds_stream_offset_never_regresses():
    from code_challenge___data_engineer___machinemax_spark.sources.pyds import (
        SyntheticEventsStreamReader,
    )

    r = SyntheticEventsStreamReader({"rows": "1000", "rows_per_batch": "400"})
    # checkpoint offset beyond a later, smaller rows option must not move back
    rows, off = r.read({"i": 3000})
    assert off == {"i": 3000} and list(rows) == []
