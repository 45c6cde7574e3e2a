"""Atomic multi-partition commit over plain parquet: a manifest-swap layer.

The reference's store gives per-document atomicity (``update_one``,
apitestmongo.py:53). Generalizing that to a bucketed parquet state table
needs MULTI-partition atomicity: an epoch merge or CDC batch rewrites
several hash buckets, and a crash between two partition swaps must never
expose a half-applied state. Spark's ``partitionOverwriteMode=dynamic``
cannot give that — each partition directory swap is its own rename.

This module is the minimal transactional-table core (the commit-log idea
of Delta/Iceberg, without the format): data files are immutable and
written to unique commit directories, a JSON manifest names the exact
set of per-bucket directories that constitute a snapshot, and publishing
a snapshot is ONE ``os.replace`` of the ``CURRENT`` pointer — atomic on
POSIX. Readers resolve ``CURRENT`` -> manifest -> file list; they see
snapshot N or snapshot N+1, never a mix. A crash anywhere before the
pointer swap leaves orphan data directories (invisible; ``gc()`` removes
them) and the previous snapshot fully intact.

Layout::

    <path>/data/<commit-id>/__pb=<bucket>/part-*.parquet
    <path>/_manifests/v<N>.json
    <path>/CURRENT              # atomic pointer: {"version": N}

Concurrency model: single writer (a foreachBatch driver or a batch merge
job — the same model the streaming epoch guard assumes), any number of
readers. The bucket column is stored as a REAL data column (``bucket``)
and duplicated into the ``__pb`` partition dir solely to split files per
bucket at write time; reads never depend on partition discovery.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ManifestStore:
    """Bucketed parquet snapshots with atomic multi-bucket commit."""

    def __init__(self, path: str):
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifests")
        self._current = os.path.join(path, "CURRENT")

    # -- snapshot resolution -------------------------------------------------

    def version(self) -> int:
        """Committed snapshot version, or -1 when the store is empty."""
        try:
            with open(self._current) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return -1

    def manifest(self) -> dict | None:
        v = self.version()
        if v < 0:
            return None
        with open(os.path.join(self._manifest_dir, f"v{v}.json")) as f:
            return json.load(f)

    def bucket_meta(self) -> dict[int, dict]:
        """{bucket: {"run_scope": ..., "last_epoch": ...}} of the committed
        snapshot — the replay guard lives in the manifest, not in data rows,
        so checking it costs a file read, not a parquet scan."""
        m = self.manifest()
        if m is None:
            return {}
        return {int(b): e["meta"] for b, e in m["buckets"].items()}

    # -- read ----------------------------------------------------------------

    def read(self, spark: SparkSession, buckets: list[int] | None = None) -> DataFrame | None:
        """DataFrame of the committed snapshot (optionally only the given
        buckets — manifest-driven directory selection, the pruning that
        bounds an epoch's read to the buckets it touches). None if empty."""
        m = self.manifest()
        if m is None:
            return None
        dirs = [
            os.path.join(self.path, e["dir"])
            for b, e in m["buckets"].items()
            if buckets is None or int(b) in set(buckets)
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    # -- write ---------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        replace_buckets: list[int],
        meta: dict | None = None,
        crash_before_publish: bool = False,
        meta_by_bucket: dict[int, dict] | None = None,
    ) -> int:
        """Atomically publish a new snapshot: ``replace_buckets`` get the
        rows of ``df`` (which must carry an int ``bucket`` column covering
        exactly those buckets); every other bucket keeps its current files
        untouched. Returns the new version.

        ``crash_before_publish`` is the test hook: do all the work —
        data files, manifest file — but skip the pointer swap, simulating
        a crash at the worst moment. The store must then still read as the
        previous snapshot.
        """
        prev = self.manifest()
        new_version = (prev["version"] + 1) if prev else 0
        commit_id = f"c{new_version}-{uuid.uuid4().hex[:8]}"
        commit_dir = os.path.join(self.path, "data", commit_id)
        (
            df.withColumn("__pb", F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("__pb")
            .parquet(commit_dir)
        )
        written = {
            int(d.split("=", 1)[1]): os.path.join("data", commit_id, d)
            for d in os.listdir(commit_dir)
            if d.startswith("__pb=")
        }
        missing = set(replace_buckets) - set(written)
        extra = set(written) - set(replace_buckets)
        if extra:
            raise ValueError(f"df contains buckets not declared for replacement: {sorted(extra)}")
        buckets: dict[str, dict] = dict(prev["buckets"]) if prev else {}
        for b in replace_buckets:
            if b in missing:
                # declared-but-empty bucket: the new snapshot drops it
                buckets.pop(str(b), None)
                continue
            b_meta = meta_by_bucket.get(b, {}) if meta_by_bucket is not None else (meta or {})
            buckets[str(b)] = {"dir": written[b], "meta": b_meta}
        manifest = {"version": new_version, "buckets": buckets}
        os.makedirs(self._manifest_dir, exist_ok=True)
        mpath = os.path.join(self._manifest_dir, f"v{new_version}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        if crash_before_publish:
            return self.version()  # unchanged — the crash window
        self._publish(new_version)
        return new_version

    def _publish(self, version: int) -> None:
        tmp = self._current + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._current)  # THE atomic step

    # -- maintenance ---------------------------------------------------------

    def cdc_merge(
        self,
        delta: DataFrame,
        key_col: str,
        op_col: str = "op",
        n_buckets: int = 16,
        meta: dict | None = None,
        crash_before_publish: bool = False,
    ) -> int:
        """Apply a CDC batch (insert/update/delete) ATOMICALLY: rows with
        ``op_col`` in ('I','U') upsert by ``key_col``, 'D' deletes. Only the
        buckets containing delta keys are rewritten (survivors = pruned
        current anti-join delta keys, union upserts); every other bucket's
        files carry over untouched — the bounded-IO story of the epoch
        merge, and the multi-partition generalization of the reference's
        per-document ``update_one`` (apitestmongo.py:53). The whole batch
        publishes via one pointer swap: a crash mid-merge leaves the
        previous table version fully readable."""
        spark = delta.sparkSession
        bucketed = delta.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
        )
        touched = [r.bucket for r in bucketed.select("bucket").distinct().collect()]
        if not touched:
            return self.version()
        upserts = bucketed.filter(F.col(op_col).isin("I", "U")).drop(op_col)
        keys = bucketed.select(key_col).distinct()
        current = self.read(spark, buckets=touched)
        if current is not None:
            survivors = current.join(F.broadcast(keys), key_col, "left_anti")
            merged = survivors.unionByName(upserts)
        else:
            merged = upserts
        return self.commit(
            merged, touched, meta=meta, crash_before_publish=crash_before_publish
        )

    def compact(self, spark: SparkSession, buckets: list[int] | None = None) -> int:
        """Rewrite the given buckets (default: all) into one fresh commit
        with ONE file per bucket — the OPTIMIZE step that undoes small-file
        accumulation after many single-bucket epoch commits. Content is
        byte-for-byte the same rows; each bucket's manifest meta (the
        replay guard) carries over unchanged, so an epoch resuming after a
        compaction still sees its watermark. Published like any commit:
        one pointer swap, readers see pre- or post-compaction, never a mix;
        the superseded dirs become gc() fodder.

        The repartition(n, bucket) puts every bucket's rows in exactly one
        task (hash of the bucket value is deterministic; co-hashed buckets
        just share a task), so the partitionBy write emits exactly one
        part-file per bucket dir — at 100 TB, compaction IO is bounded by
        the buckets selected, never the table."""
        m = self.manifest()
        if m is None:
            return -1
        committed = [int(b) for b in m["buckets"]]
        target = committed if buckets is None else [b for b in committed if b in set(buckets)]
        if not target:
            return self.version()
        cur = self.read(spark, buckets=target)
        merged = cur.repartition(len(target), "bucket")
        metas = self.bucket_meta()
        return self.commit(
            merged, target, meta_by_bucket={b: metas.get(b, {}) for b in target}
        )

    def gc(self) -> list[str]:
        """Remove commit directories not referenced by the CURRENT manifest
        (orphans from crashed commits) and superseded manifest files.
        Safe under the single-writer model; returns removed paths."""
        m = self.manifest()
        live = {e["dir"].split(os.sep)[1] for e in m["buckets"].values()} if m else set()
        removed = []
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                if d not in live:
                    full = os.path.join(data_root, d)
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
        v = self.version()
        if os.path.isdir(self._manifest_dir):
            for f_ in os.listdir(self._manifest_dir):
                if f_.startswith("v") and f_.endswith(".json") and int(f_[1:-5]) != v:
                    full = os.path.join(self._manifest_dir, f_)
                    os.remove(full)
                    removed.append(full)
        return removed
