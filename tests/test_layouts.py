"""Persisted-layout pruning evidence beyond bucketing (DEPLOY.md L1/L3):
the IVF vector store partitioned by centroid_id and the events table
partitioned by date both plan partition-pruned scans — the physical
property that turns 'scan everything' into 'scan the touched slice' at
100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
    ivf_assign,
    label_centroids_df,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table

from tests.test_plans import explain_text


def test_ivf_store_partitioned_by_centroid_prunes(spark, sf_dir, tmp_path):
    """Write the assigned vectors partitioned by centroid_id (the DEPLOY L3
    layout); an nprobe-style probe of two lists plans PartitionFilters on
    centroid_id — the scan reads ~nprobe/C of the store by construction."""
    emb = load_table(spark, sf_dir, "embeddings").limit(500)
    cents = label_centroids_df(emb, "embedding", "label")
    assigned = ivf_assign(emb, cents, "embedding", id_col="vec_id")
    path = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("centroid_id").parquet(path)

    store = spark.read.parquet(path)
    probe = store.filter(F.col("centroid_id").isin(0, 1))
    txt = explain_text(probe.select("vec_id"))
    assert "PartitionFilters" in txt
    assert "centroid_id" in txt.split("PartitionFilters", 1)[1][:200]
    # and the probe really is a subset scan, not a post-scan filter
    assert probe.count() < store.count()


def test_events_partitioned_by_date_prunes(spark, sf_dir, tmp_path):
    """Events persisted partitioned by event_date: a one-day window query
    plans PartitionFilters on the date column, so a time-windowed
    aggregation (events_hourly's shape) scans one partition of the store
    rather than the full history."""
    ev = load_table(spark, sf_dir, "events").limit(20000)
    path = str(tmp_path / "events_by_date")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(path)

    store = spark.read.parquet(path)
    some_day = store.select("event_date").orderBy("event_date").limit(1).collect()[0][0]
    day = store.filter(F.col("event_date") == F.lit(some_day))
    txt = explain_text(day.groupBy(F.window("ts", "1 hour")).count())
    assert "PartitionFilters" in txt
    assert "event_date" in txt.split("PartitionFilters", 1)[1][:200]
    assert day.count() < store.count()


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered events (user_id x hour-of-history): per-file parquet
    min/max stats must be selective on BOTH columns — the property a
    single-column sort cannot give. Footer stats are read the way any
    pruning reader (Spark row-group pushdown included) consumes them."""
    import glob

    import pyarrow.parquet as pq

    from code_challenge___data_engineer___machinemax_spark.sources.zorder import (
        write_zordered,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_hour", (F.unix_timestamp("ts") / 3600).cast("long")
    )
    lo = e.agg(F.min("ts_hour")).collect()[0][0]
    e = e.withColumn("ts_hour", F.col("ts_hour") - F.lit(lo))
    path = str(tmp_path / "events_z")
    # balance the two dimensions to comparable bucket counts before
    # interleaving (the docstring's contract): a dimension with more bits
    # would otherwise dominate the code's high bits and the layout would
    # degenerate into a single-column sort
    u_span_all = e.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    h_span_all = e.agg(F.max("ts_hour")).collect()[0][0]
    write_zordered(
        e,
        path,
        "user_id",
        "ts_hour",
        n_files=16,
        scale_a=max(1, u_span_all // 128),
        scale_b=max(1, h_span_all // 128),
    )

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 8  # range partitioner actually split the code space

    def files_overlapping(col, pred_lo, pred_hi):
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
            maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
            if min(mins) <= pred_hi and max(maxs) >= pred_lo:
                hit += 1
        return hit

    users = [r[0] for r in e.agg(F.min("user_id"), F.max("user_id")).collect()[0:1]]
    u_lo, u_hi = e.agg(F.min("user_id")).collect()[0][0], e.agg(F.max("user_id")).collect()[0][0]
    h_hi = e.agg(F.max("ts_hour")).collect()[0][0]

    # a narrow slice in EITHER dimension touches a strict minority of files
    u_span = max(1, (u_hi - u_lo) // 8)
    h_span = max(1, h_hi // 8)
    u_hits = files_overlapping("user_id", u_lo, u_lo + u_span)
    h_hits = files_overlapping("ts_hour", 0, h_span)
    assert u_hits <= len(files) // 2, (u_hits, len(files))
    assert h_hits <= len(files) // 2, (h_hits, len(files))

    # and the data survives the round trip
    assert spark.read.parquet(path).count() == e.count()


def test_morton_code_interleaves(spark):
    from code_challenge___data_engineer___machinemax_spark.sources.zorder import (
        morton_code,
    )

    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (0xFFFF, 0xFFFF)], "a long, b long"
    ).select(morton_code(F.col("a"), F.col("b")).alias("z")).collect()

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    expect = [ref(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (0xFFFF, 0xFFFF)]]
    assert [r.z for r in rows] == expect


def test_zorder_layout_query_shows_both_dim_pruning(spark, sf_dir):
    """The registered `zorder_layout` query's probe flags must exhibit the
    layout trade-off: a linear-by-custkey layout cannot prune the date
    probe (all 16 files touched), while the z-ordered layout bounds both
    dimensions so each probe touches a strict minority of files."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    rows = get("zorder_layout").fn(spark, sf_dir).collect()
    by_layout = {}
    for r in rows:
        d = by_layout.setdefault(r.layout, {"x": 0, "y": 0, "files": 0, "rows": 0})
        d["x"] += r.probe_x_hit
        d["y"] += r.probe_y_hit
        d["files"] += 1
        d["rows"] += r.n_rows

    assert by_layout["linear"]["files"] == 16
    assert by_layout["zorder"]["files"] == 16
    # equal-depth assignment: both layouts cover every order exactly once
    assert by_layout["linear"]["rows"] == by_layout["zorder"]["rows"]
    # linear prunes x hard but cannot prune y at all
    assert by_layout["linear"]["y"] == 16
    assert by_layout["linear"]["x"] <= 3
    # z-order prunes BOTH probes to a strict minority of files
    assert by_layout["zorder"]["x"] <= 8
    assert by_layout["zorder"]["y"] <= 8


# --- Hilbert curve ---------------------------------------------------------


def _xy2d(n: int, x: int, y: int) -> int:
    """Reference Wikipedia xy2d, the spec with_hilbert unrolls."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_is_continuous(spark):
    """with_hilbert == the sequential reference on sampled 12-bit points,
    and on the full 16x16 grid it is a bijection whose consecutive indexes
    are GRID NEIGHBORS (|dx|+|dy| == 1) — the locality property the
    hilbert_layout query's pruning claim rests on (Morton order fails this:
    it jumps diagonally between quadrants)."""
    from code_challenge___data_engineer___machinemax_spark.sources.zorder import (
        with_hilbert,
    )

    # reference equality at the query's production width (12 bits)
    pts = [((i * 2654435761) % 4096, (i * 40503 + 17) % 4096) for i in range(64)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {(r.x, r.y): r.h for r in with_hilbert(df, "x", "y", 12, "h").collect()}
    for x, y in pts:
        assert got[(x, y)] == _xy2d(4096, x, y)

    # bijection + unit-step continuity on the full 4-bit grid
    full = [(x, y) for x in range(16) for y in range(16)]
    df2 = spark.createDataFrame(full, "x: long, y: long")
    by_d = {r.h: (r.x, r.y) for r in with_hilbert(df2, "x", "y", 4, "h").collect()}
    assert sorted(by_d) == list(range(256))
    for d in range(255):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1


def test_hilbert_layout_query_prunes_both_dimensions(spark, sf_dir):
    """Both layouts in the hilbert_layout manifest must prune BOTH probe
    rectangles (each probe touches a strict subset of the 16 files) — the
    same gate zorder_layout passes, now also for the Hilbert assignment."""
    import __spark_entry__ as mod

    rows = mod.queries()["hilbert_layout"](spark, sf_dir).collect()
    assert len(rows) == 32
    for layout in ("hilbert", "zorder"):
        files = [r for r in rows if r.layout == layout]
        assert len(files) == 16
        assert sum(r.probe_x_hit for r in files) < 16
        assert sum(r.probe_y_hit for r in files) < 16


def test_bloom_file_skipping_invariants(spark, sf_dir):
    """Per file: bloom_touches >= true_touches (a bloom filter has NO
    false negatives) and minmax_touches >= true_touches; across the
    date-sorted layout the bloom manifest must beat min/max pruning in
    total (the query's reason to exist — min/max is blind to a
    point-lookup key the sort ignored). The FP margin is value-pinned by
    the oracle; these are the semantic floors."""
    import __spark_entry__ as mod

    rows = mod.queries()["bloom_file_skipping"](spark, sf_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.bloom_touches >= r.true_touches, f"file {r.file_id}: false negative"
        assert r.minmax_touches >= r.true_touches, f"file {r.file_id}: minmax broken"
    # at the gate SF the per-file filters are unsaturated (m=4096 vs ~1k
    # keys/file), so bloom must prune strictly better than min/max
    assert sum(r.bloom_touches for r in rows) < sum(r.minmax_touches for r in rows)
