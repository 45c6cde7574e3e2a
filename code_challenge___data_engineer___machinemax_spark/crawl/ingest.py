"""Article store: the engine's replacement for the reference's MongoDB
collection (write path implied by README.md:26-28 but absent from the repo,
SURVEY.md §0.2; read path api.py:20-26).

Parquet-backed, append-only with latest-wins read semantics:
- append(): add article rows stamped with an ingest version.
- latest(): one row per url, the newest version (row_number dedup) — this is
  Mongo update_one's observable behavior (apitestmongo.py:53) without
  requiring a transactional format (Delta MERGE would replace this 1:1).
- search(): the keyword query surface (api.py:22-26 semantics).

At scale: partition the store by ingest date and bucket by url; `latest()`
then prunes to recent partitions and the window shuffles co-located data.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.search import keyword_search
from ..schemas import ARTICLE

_PROJECTION = [f.name for f in ARTICLE.fields]  # api.py:27-35 field order


class ArticleStore:
    def __init__(self, spark: SparkSession, path: str, partition_by: str | None = None):
        """``partition_by`` (e.g. 'section'): hive-partition the store so
        section-scoped queries prune at the directory level — the 100 TB
        layout lever. NULL partition values land in the HIVE_DEFAULT
        partition and read back as NULL."""
        self.spark = spark
        self.path = path
        self.partition_by = partition_by

    def append(self, articles: DataFrame, version: int | None = None) -> None:
        if version is None:
            version = time.time_ns()
        writer = (
            articles.select(*_PROJECTION)
            .withColumn("ingest_version", F.lit(version).cast("long"))
            .write.mode("append")
        )
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        writer.parquet(self.path)

    def _raw(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def latest(self, as_of_version: int | None = None) -> DataFrame:
        """One row per url, newest version wins. ``as_of_version`` reads the
        store as it stood at that ingest version (time travel over the
        append-only log — what Delta gives via VERSION AS OF, reconstructed
        from the version column)."""
        raw = self._raw()
        if as_of_version is not None:
            raw = raw.filter(F.col("ingest_version") <= as_of_version)
        w = W.partitionBy("url").orderBy(F.desc("ingest_version"))
        return (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*_PROJECTION)
        )

    def versions(self) -> list[int]:
        return [
            r.v for r in self._raw().select(F.col("ingest_version").alias("v")).distinct()
            .orderBy("v").collect()
        ]

    def update(self, url: str, **fields: str) -> None:
        """update_one-by-key equivalent: append a new version of the row."""
        row = self.latest().filter(F.col("url") == url)
        for name, value in fields.items():
            row = row.withColumn(name, F.lit(value))
        self.append(row)

    def search(self, keyword: str) -> DataFrame:
        """Keyword search over stored articles, public-field projection
        (api.py:26-35). Unknown keyword -> empty DataFrame, not an error;
        likewise a missing/empty store (the reference returns what it has
        on a failed read, api.py:36-37)."""
        if not self.exists():
            return self.spark.createDataFrame([], ARTICLE)
        return keyword_search(self.latest(), keyword).select(*_PROJECTION)

    def search_json(self, keyword: str) -> list[str]:
        """JSON-array boundary (api.py:38's jsonify)."""
        return self.search(keyword).toJSON().collect()

    def search_ranked(self, keyword: str, ranker: str = "bm25", k: int = 10) -> DataFrame:
        """Relevance-ranked search: the reference's unordered Mongo cursor
        (api.py:26-35) upgraded with a score column + top-k ordering.
        ``ranker``: 'bm25' (saturating) or 'tfidf' (linear)."""
        from ..operators.search import bm25_rank, tfidf_rank

        if not self.exists():
            return self.spark.createDataFrame([], ARTICLE)
        rank_fn = {"bm25": bm25_rank, "tfidf": tfidf_rank}[ranker]
        latest = self.latest()
        scores = rank_fn(latest, "url", keyword, k=k)
        score_col = scores.columns[-1]
        return (
            latest.join(scores, "url")
            .select(*_PROJECTION, score_col)
            .orderBy(F.desc(score_col), F.asc("url"))
        )

    def exists(self) -> bool:
        if not os.path.isdir(self.path):
            return False
        return any(
            n.endswith(".parquet") for _, _, files in os.walk(self.path) for n in files
        )


def download_files(pages: DataFrame, out_dir: str) -> DataFrame:
    """Document download sink (reference download_file/download_files,
    index.py:181-212): write each fetched body to ``out_dir`` named by the
    URL basename, return the ledger (url, ok, error) for the
    'downloaded m / n' report.

    Executed with mapInPandas so writes happen where the data lives; on a
    real cluster ``out_dir`` is a shared/object store path. Name collisions
    keep the first write (the reference's caught_docs set semantics).
    """
    import re as _re

    import pandas as pd

    def write_partition(batches):
        import os as _os

        _os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url, body = r["url"], r["html"]
                try:
                    name = _re.sub(r"[^A-Za-z0-9._-]", "_", url.rstrip("/").rsplit("/", 1)[-1]) or "index"
                    path = _os.path.join(out_dir, name)
                    if not _os.path.exists(path):
                        with open(path, "w") as f:
                            f.write(body or "")
                    rows.append({"url": url, "ok": True, "error": None})
                except Exception as exc:
                    rows.append({"url": url, "ok": False, "error": str(exc)})
            yield pd.DataFrame(rows, columns=["url", "ok", "error"])

    return pages.select("url", "html").mapInPandas(write_partition, "url string, ok boolean, error string")


def download_fetched(fetched: DataFrame, out_dir: str) -> DataFrame:
    """Download sink over a ``fetch_stage`` output: successful fetches are
    written by ``download_files``; fetch FAILURES stay in the ledger as
    failed rows so the 'downloaded m / n' report counts attempts, exactly
    like the reference's per-URL try/except loop (index.py:190-212)."""
    ok_ledger = download_files(fetched.filter("ok"), out_dir)
    failed = fetched.filter("NOT ok").selectExpr(
        "url", "false AS ok", "error"
    )
    return ok_ledger.unionByName(failed)


def download_report(ledger: DataFrame) -> tuple[int, int]:
    """'downloaded m / n' (reference index.py:212)."""
    row = ledger.agg(
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("ok"), F.count("*").alias("n")
    ).collect()[0]
    return int(row.ok or 0), int(row.n)
