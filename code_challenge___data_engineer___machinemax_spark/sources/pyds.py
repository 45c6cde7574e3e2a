"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic event generator whose every cell is a pure
function of ``md5(seed:i)`` — so the source's CONTENT, not just its
plumbing, sits under the DuckDB value gate (the oracle replays the same
md5 arithmetic over ``range(n)``).

What it demonstrates, beyond file formats the engine already reads
(parquet testdata, JSONL with dead-letter quarantine in sources/jsonl.py):

- partition planning: ``partitions()`` splits the row domain into
  contiguous ranges, one ``InputPartition`` per task — Spark reads them in
  parallel exactly like file splits, so the source scales with the
  cluster, not the driver;
- Python-side filter pushdown: ``pushFilters`` accepts ``event_type``
  equality filters (non-matching rows never materialize — the Arrow
  transfer carries only the selected slice, the contract PushedFilters
  gives a parquet scan) and ``event_id`` upper bounds (which cap the
  planned row domain BEFORE partitions() runs — pushdown reaching the
  split planner, the analogue of partition pruning); unsupported filters
  are handed back for Spark to re-apply;
- streaming read: ``SyntheticEventsStreamReader`` exposes the same domain
  as micro-batches with row-index offsets and deterministic
  ``readBetweenOffsets`` replay (checkpoint-recovery contract);
- sink with two-phase commit: ``JsonlCommitWriter`` stages one file per
  task and publishes via driver-side renames + a ``_SUCCESS`` marker.

This is the blueprint for wrapping a real external system (a REST API, a
message queue, a proprietary scanner) as a first-class DataFrame source:
the reference's requests-based fetch (index.py:125) is exactly such a
system, and crawl/fetcher.py wraps it at the operator level; this module
shows the engine-level integration point.

Generator derivation (hex digits of ``md5(f"{seed}:{i}")``):
  user_id  = int(h[0:8], 16) % 1000
  type_ix  = int(h[8:10], 16) % 4   -> (view, click, purchase, error)
  value_e6 = int(h[10:18], 16) % 1000000
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    LessThan,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ("view", "click", "purchase", "error")

_SCHEMA = "event_id bigint, user_id bigint, event_type string, value_e6 bigint"


def _row(seed: str, i: int) -> tuple[int, int, str, int]:
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    return (
        i,
        int(h[0:8], 16) % 1000,
        EVENT_TYPES[int(h[8:10], 16) % 4],
        int(h[10:18], 16) % 1000000,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = options.get("seed", "s42")
        self.type_eq: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                self.type_eq = f.value  # handled here: rows never materialize
            elif (
                isinstance(f, LessThan)
                and f.attribute == ("event_id",)
                and isinstance(f.value, int)
            ):
                # event_id IS the row index, so this prunes the PLANNED
                # domain: partitions() sees the capped rows and emits fewer
                # splits — pushdown reaching partition planning, the Python-
                # source analogue of parquet partition pruning
                self.rows = min(self.rows, max(f.value, 0))
            else:
                yield f  # unsupported -> Spark re-applies it post-read

    def partitions(self) -> list[InputPartition]:
        if self.rows <= 0:  # empty source, not a planner crash
            return [_RangePartition(0, 0)]
        per = -(-self.rows // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            row = _row(self.seed, i)
            if self.type_eq is not None and row[2] != self.type_eq:
                continue
            yield row


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest wins per Spark's DataSourceRegistration). Implementing
    ``pushFilters`` requires the runtime conf
    ``spark.sql.python.filterPushdown.enabled`` (Spark refuses to silently
    ignore a pushdown implementation when the feature flag is off). The
    set is session-scoped and deliberately not restored: the flag must be
    live whenever a plan over this source EXECUTES (lazily, possibly long
    after registration), and its only effect is enabling the pushdown
    protocol for Python sources — of which this is the repo's only one."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


# -- streaming read (micro-batch generator) ---------------------------------


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same md5-derived row domain: offsets are
    row indices ({"i": n}), each batch advances by ``rows_per_batch`` until
    ``rows`` is exhausted, and ``readBetweenOffsets`` replays any committed
    range exactly (the generator is pure, so recovery re-derives identical
    rows — the replayability contract checkpoint recovery needs). Driver-
    side by design (SimpleDataSourceStreamReader); a partitioned
    DataSourceStreamReader is the high-throughput upgrade path."""

    def __init__(self, options: dict):
        self.total = int(options.get("rows", 1000))
        self.per_batch = max(1, int(options.get("rows_per_batch", 400)))
        self.seed = options.get("seed", "s42")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, start: int, end: int) -> Iterator[tuple]:
        # a concrete list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator, which generators can't survive
        return iter([_row(self.seed, i) for i in range(start, end)])

    def read(self, start: dict):
        i0 = int(start["i"])
        # never move the offset backward: a checkpoint can carry an offset
        # beyond a later (smaller) rows option, and a regressed offset
        # would re-emit already-delivered rows after the next restart
        end = max(i0, min(i0 + self.per_batch, self.total))
        return self._rows(i0, end), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(int(start["i"]), int(end["i"]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the generator holds no state


# -- batch write (two-phase task-file commit) -------------------------------


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class JsonlCommitWriter(DataSourceWriter):
    """Executor tasks write newline-JSON to job-scoped staging files;
    the driver-side ``commit`` publishes them under job-unique part names
    (so append never collides with prior jobs), honors ``overwrite`` by
    removing prior jobs' parts at publish time, sweeps EVERY leftover
    staged file of this job (including those of failed/retried attempts
    that never returned a commit message), and drops a ``_SUCCESS`` marker
    only after all of that — the two-phase output commit the
    DataSourceWriter API models. ``abort`` runs the same job-scoped sweep.
    Values that JSON can't encode natively (timestamps, decimals, binary)
    serialize via str()."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid as _uuid

        self.path = options["path"]
        self.overwrite = overwrite
        self.job = _uuid.uuid4().hex[:12]  # driver-side; tasks inherit it

    def write(self, iterator) -> _FileCommit:
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.path, exist_ok=True)
        staged = _os.path.join(
            self.path, f"_staged-{self.job}-{_uuid.uuid4().hex}.jsonl"
        )
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
        return _FileCommit(staged)

    def _sweep_staged(self) -> None:
        import glob as _glob
        import os as _os

        for stray in _glob.glob(
            _os.path.join(self.path, f"_staged-{self.job}-*.jsonl")
        ):
            try:
                _os.remove(stray)
            except FileNotFoundError:
                pass

    def commit(self, messages) -> None:
        import glob as _glob
        import os as _os

        if self.overwrite:
            for old in _glob.glob(_os.path.join(self.path, "part-*.jsonl")):
                _os.remove(old)
            try:
                _os.remove(_os.path.join(self.path, "_SUCCESS"))
            except FileNotFoundError:
                pass
        for i, m in enumerate(messages):
            if m is not None:
                final = _os.path.join(self.path, f"part-{self.job}-{i:05d}.jsonl")
                _os.replace(m.path, final)
        self._sweep_staged()  # failed/speculative attempts' leftovers
        with open(_os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        self._sweep_staged()


class JsonlCommitDataSource(DataSource):
    """`jsonl_commit`: a Python DataSource SINK — newline-JSON with the
    two-phase task-file/driver-commit protocol (staging names, atomic
    renames, _SUCCESS marker)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool) -> JsonlCommitWriter:
        return JsonlCommitWriter(self.options, overwrite)


def register_jsonl_commit_sink(spark) -> None:
    spark.dataSource.register(JsonlCommitDataSource)
