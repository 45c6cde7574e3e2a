"""Query registry: every engine capability is registered once here, as a
(spark_fn, oracle_sql) pair, and surfaced through __spark_entry__.queries() /
oracle_sql() for the driver's DuckDB correctness gate.

``oracle=None`` marks genuinely non-SQL-expressible operators (iterative
crawl, custom stateful streaming); the driver then records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Registered:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, Registered] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Registered(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: reg.fn for name, reg in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: reg.oracle for name, reg in _REGISTRY.items() if reg.oracle is not None}


def get(name: str) -> Registered:
    return _REGISTRY[name]
