"""Fetch stage: URLs -> raw pages, as a distributed mapInPandas operator.

Reference: synchronous per-URL requests.get with politeness sleeps and
try/except error tolerance (index.py:121-131,176-187). Here the frontier is
a DataFrame; each partition fetches its URLs inside one Arrow batch worker,
errors become rows (dead-letter columns, never exceptions — reference
index.py:124-129), and politeness is a per-partition rate limit.

The fetcher is injectable so correctness tests never touch the network
(SURVEY.md §7.4): `dict_fetcher` serves a fixture site; `http_fetcher` is
the production path (import-gated on `requests`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# fetch(url) -> (status, content_type, html) — raises on transport failure.
FetchFn = Callable[[str], tuple[int, str, str]]

FETCH_RESULT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("html", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def dict_fetcher(pages: dict[str, tuple[int, str, str]]) -> FetchFn:
    """Fixture fetcher: serve (status, content_type, html) from a dict;
    unknown URL raises like a transport error."""

    def fetch(url: str) -> tuple[int, str, str]:
        if url not in pages:
            raise ConnectionError(f"no route to {url}")
        return pages[url]

    return fetch


def http_fetcher(timeout: float = 10.0, wait: float = 0.0, random_wait: bool = False) -> FetchFn:
    """Production HTTP fetcher with politeness sleep (reference
    index.py:44-48,176-178: default 5s max, random 1..N)."""
    import random
    import time

    def fetch(url: str) -> tuple[int, str, str]:
        import requests  # gated: not needed (or installed) for tests

        if wait:
            time.sleep(random.uniform(1, wait) if random_wait else wait)
        resp = requests.get(url, timeout=timeout, stream=True)
        return (resp.status_code, resp.headers.get("content-type", ""), resp.text)

    return fetch


def fetch_stage(frontier: DataFrame, fetch: FetchFn, url_col: str = "url") -> DataFrame:
    """Distributed fetch: one output row per frontier URL, failures as rows.

    mapInPandas (Arrow-batched) rather than a row UDF: one Python worker
    per partition, I/O-bound loop inside. Partition count = fetch
    concurrency; `frontier.repartition(n)` is the politeness/parallelism
    knob at scale.
    """
    import pandas as pd

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        for pdf in batches:
            out = []
            for url in pdf[url_col]:
                try:
                    status, ctype, html = fetch(url)
                    out.append(
                        {"url": url, "status": status, "content_type": ctype,
                         "html": html, "ok": True, "error": None}
                    )
                except Exception as exc:  # error-row tolerance, index.py:124-129
                    out.append(
                        {"url": url, "status": None, "content_type": None,
                         "html": None, "ok": False, "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FETCH_RESULT.fields])

    return frontier.select(url_col).mapInPandas(run, FETCH_RESULT)


def urls_from_file(spark: SparkSession, path: str) -> DataFrame:
    """Seed-URL file source: one URL per line, trimmed, blanks dropped
    (reference newsspider.py:24-27, index.py:200-205)."""
    from pyspark.sql import functions as F

    return (
        spark.read.text(path)
        .select(F.trim("value").alias("url"))
        .filter(F.col("url") != "")
    )
