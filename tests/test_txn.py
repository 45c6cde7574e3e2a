"""ManifestStore: atomic multi-bucket commit over plain parquet. The
crash-injection cases are the point — under the previous dynamic-
partition-overwrite layout, a crash between two partition directory swaps
exposed a torn state (epoch applied to bucket A, missing from bucket B);
under the manifest layer the CURRENT pointer swap is the only publish
step, so every reader sees a complete snapshot or the previous one."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.streaming.events import (
    merge_epoch_into_store,
    read_state_store,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table
from code_challenge___data_engineer___machinemax_spark.txn import ManifestStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, n long, bucket int")


def test_commit_read_roundtrip_and_versions(spark, tmp_path):
    store = ManifestStore(str(tmp_path / "s"))
    assert store.version() == -1 and store.read(spark) is None
    v0 = store.commit(_df(spark, [("a", 1, 0), ("b", 2, 1)]), [0, 1])
    assert v0 == 0 and store.version() == 0
    got = {r.k: (r.n, r.bucket) for r in store.read(spark).collect()}
    assert got == {"a": (1, 0), "b": (2, 1)}
    # replace bucket 1 only; bucket 0 rows survive untouched
    v1 = store.commit(_df(spark, [("b", 5, 1)]), [1])
    assert v1 == 1
    got = {r.k: r.n for r in store.read(spark).collect()}
    assert got == {"a": 1, "b": 5}
    # bucket-selected read prunes to the requested bucket's files
    only0 = store.read(spark, buckets=[0])
    assert {r.k for r in only0.collect()} == {"a"}


def test_commit_rejects_undeclared_buckets(spark, tmp_path):
    store = ManifestStore(str(tmp_path / "s"))
    with pytest.raises(ValueError, match="not declared"):
        store.commit(_df(spark, [("a", 1, 0), ("b", 1, 3)]), [0])


def test_declared_empty_bucket_is_dropped(spark, tmp_path):
    store = ManifestStore(str(tmp_path / "s"))
    store.commit(_df(spark, [("a", 1, 0), ("b", 2, 1)]), [0, 1])
    # bucket 1 declared for replacement but df carries no rows for it:
    # the new snapshot no longer contains bucket 1 (a delete)
    store.commit(_df(spark, [("a", 9, 0)]), [0, 1])
    got = {r.k: r.n for r in store.read(spark).collect()}
    assert got == {"a": 9}


def test_crash_before_publish_preserves_previous_snapshot(spark, tmp_path):
    store = ManifestStore(str(tmp_path / "s"))
    store.commit(_df(spark, [("a", 1, 0), ("b", 2, 1)]), [0, 1], meta={"e": 0})
    before = {r.k: r.n for r in store.read(spark).collect()}
    # crash after data files AND manifest are written, before pointer swap
    v = store.commit(
        _df(spark, [("a", 100, 0), ("b", 200, 1)]),
        [0, 1],
        meta={"e": 1},
        crash_before_publish=True,
    )
    assert v == 0  # still the old version
    assert store.version() == 0
    assert {r.k: r.n for r in store.read(spark).collect()} == before
    # the orphaned commit is invisible garbage; gc removes it
    data_dirs = set(os.listdir(tmp_path / "s" / "data"))
    assert len(data_dirs) == 2  # committed + orphan
    removed = store.gc()
    assert any("data" in r for r in removed)
    assert {r.k: r.n for r in store.read(spark).collect()} == before


def test_epoch_merge_crash_is_atomic_and_replayable(spark, sf_dir, tmp_path):
    """The end-to-end L5 story: epoch 0 commits; epoch 1 crashes mid-commit
    (all data written, pointer not swapped). The store reads as epoch 0 —
    never a mix — and foreachBatch's at-least-once replay of epoch 1 then
    applies it exactly once."""
    path = str(tmp_path / "store")
    events = load_table(spark, sf_dir, "events")
    b0 = events.limit(1000)
    b1 = events.limit(2000).subtract(b0)
    assert merge_epoch_into_store(b0, 0, path, run_scope="run") is True
    epoch0 = {r.event_type: (r.n, r.v_e6) for r in read_state_store(spark, path).collect()}

    # crash: every bucket's new files + manifest hit disk, CURRENT does not
    assert (
        merge_epoch_into_store(b1, 1, path, run_scope="run", _crash_before_publish=True)
        is True
    )
    assert {
        r.event_type: (r.n, r.v_e6) for r in read_state_store(spark, path).collect()
    } == epoch0  # fully the old snapshot, no torn buckets

    # replay (what the restarted stream does): applies cleanly, once
    assert merge_epoch_into_store(b1, 1, path, run_scope="run") is True
    want = {
        r.event_type: (r.n, r.v_e6)
        for r in events.limit(2000)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(value * 1e6 AS BIGINT)")).alias("v_e6"),
        )
        .collect()
    }
    got = {r.event_type: (r.n, r.v_e6) for r in read_state_store(spark, path).collect()}
    assert got == want
    # and a second replay of the same epoch is guarded out
    assert merge_epoch_into_store(b1, 1, path, run_scope="run") is False


def test_cdc_merge_atomic_insert_update_delete(spark, sf_dir, tmp_path):
    """The CDC companion of the epoch merge: one I/U/D batch applies as a
    single snapshot swap, rewriting only the buckets holding delta keys; a
    crash mid-merge leaves the previous table version fully readable."""
    import glob

    store = ManifestStore(str(tmp_path / "orders"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(2000)
    base = o.withColumn(
        "bucket", F.pmod(F.xxhash64("o_orderkey"), F.lit(16)).cast("int")
    )
    store.commit(base, list(range(16)))
    before = {r.o_orderkey: r.o_totalprice for r in store.read(spark).collect()}

    keys = sorted(before)[:30]
    delta = spark.createDataFrame(
        [(keys[0], "X", 1.0, "U"), (keys[1], None, None, "D"), (10**12, "N", 9.0, "I")],
        "o_orderkey long, o_orderstatus string, o_totalprice double, op string",
    )
    files_before = set(glob.glob(f"{tmp_path}/orders/data/*/__pb=*/*.parquet"))
    # crash first: table unchanged
    store.cdc_merge(delta, "o_orderkey", crash_before_publish=True)
    assert {r.o_orderkey: r.o_totalprice for r in store.read(spark).collect()} == before
    # real merge
    store.cdc_merge(delta, "o_orderkey")
    after = {r.o_orderkey: r.o_totalprice for r in store.read(spark).collect()}
    assert after[keys[0]] == 1.0  # updated
    assert keys[1] not in after  # deleted
    assert after[10**12] == 9.0  # inserted
    assert len(after) == len(before)  # -1 delete +1 insert
    # bounded IO: pre-existing files never rewritten
    for f in files_before:
        assert os.path.exists(f)


def test_reader_mid_commit_sees_old_then_new(spark, tmp_path):
    """The pointer file is replaced atomically: a reader that resolved
    CURRENT before the swap keeps reading the old snapshot's files (they
    are immutable — never overwritten), one that resolves after sees the
    new one. Simulated by capturing the file list before the swap."""
    store = ManifestStore(str(tmp_path / "s"))
    store.commit(_df(spark, [("a", 1, 0)]), [0])
    old_df = store.read(spark)  # plan holds the old snapshot's file list
    store.commit(_df(spark, [("a", 2, 0)]), [0])
    assert {r.n for r in old_df.collect()} == {1}  # old files intact
    assert {r.n for r in store.read(spark).collect()} == {2}
    # CURRENT content is valid JSON with the new version
    with open(tmp_path / "s" / "CURRENT") as f:
        assert json.load(f)["version"] == 1


def _bucket_files(store):
    """{bucket: n_part_files} of the committed snapshot."""
    m = store.manifest()
    out = {}
    for b, e in m["buckets"].items():
        d = os.path.join(store.path, e["dir"])
        out[int(b)] = len([f for f in os.listdir(d) if f.startswith("part-")])
    return out


def test_compact_merges_small_files_preserving_content_and_meta(spark, tmp_path):
    store = ManifestStore(str(tmp_path / "s"))
    # many single-bucket commits, each fragmented into several part files
    for v in range(3):
        rows = [(f"k{v}-{i}", i, v) for i in range(8)]
        frag = _df(spark, rows).repartition(4)  # ~4 files in this bucket dir
        store.commit(frag, [v], meta={"last_epoch": v * 10})
    before = _bucket_files(store)
    assert sum(before.values()) > 3  # fragmentation actually happened
    content_before = sorted(tuple(r) for r in store.read(spark).collect())
    metas_before = store.bucket_meta()
    v_before = store.version()

    assert store.compact(spark) == v_before + 1
    after = _bucket_files(store)
    assert set(after) == set(before)
    assert all(n == 1 for n in after.values())  # one file per bucket
    assert sorted(tuple(r) for r in store.read(spark).collect()) == content_before
    assert store.bucket_meta() == metas_before  # replay guards survive

    # superseded fragment dirs are orphaned and gc-able; content unaffected
    removed = store.gc()
    assert removed
    assert sorted(tuple(r) for r in store.read(spark).collect()) == content_before


def test_compact_subset_leaves_other_buckets_untouched(spark, tmp_path):
    store = ManifestStore(str(tmp_path / "s"))
    for v in range(2):
        store.commit(_df(spark, [(f"k{v}-{i}", i, v) for i in range(6)]).repartition(3), [v])
    dir_b1_before = store.manifest()["buckets"]["1"]["dir"]
    store.compact(spark, buckets=[0])
    m = store.manifest()
    assert m["buckets"]["1"]["dir"] == dir_b1_before  # untouched carry-over
    assert _bucket_files(store)[0] == 1


def test_compact_empty_store_is_noop(spark, tmp_path):
    store = ManifestStore(str(tmp_path / "s"))
    assert store.compact(spark) == -1
