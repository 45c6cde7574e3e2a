"""Download sink + ledger report (reference ops 4/5/26) and the URL-file
source (op 2)."""

from __future__ import annotations

import os

from code_challenge___data_engineer___machinemax_spark.crawl.fetcher import (
    dict_fetcher,
    fetch_stage,
    urls_from_file,
)
from code_challenge___data_engineer___machinemax_spark.crawl.ingest import (
    download_files,
    download_report,
)

from .test_crawl import BASE, SITE


def test_download_files_and_report(spark, tmp_path):
    urls = [f"{BASE}/a1", f"{BASE}/a2", f"{BASE}/missing"]
    fetched = fetch_stage(
        spark.createDataFrame([(u,) for u in urls], "url string"), dict_fetcher(SITE)
    )
    out = str(tmp_path / "docs")
    ledger = download_files(fetched.filter("ok"), out).cache()
    ok, n = download_report(ledger)
    assert (ok, n) == (2, 2)  # 'downloaded 2 / 2' for the fetchable pages
    assert sorted(os.listdir(out)) == ["a1", "a2"]
    assert "Title One" in open(os.path.join(out, "a1")).read()


def test_search_on_missing_store_returns_empty(spark, tmp_path):
    from code_challenge___data_engineer___machinemax_spark.crawl.ingest import ArticleStore

    store = ArticleStore(spark, str(tmp_path / "never_written"))
    assert store.search("anything").collect() == []
    assert store.search_json("anything") == []


def test_crawl_zero_depth(spark):
    from code_challenge___data_engineer___machinemax_spark.crawl.orchestrator import crawl

    res = crawl(spark, [f"{BASE}/"], dict_fetcher(SITE), BASE, max_depth=0)
    assert res.stats == {
        "pages_found": 0, "docs_found": 0, "fetch_failures": 0,
        "articles": 0, "depth_reached": 0,
    }


def test_asof_null_left_ts(spark):
    from datetime import datetime

    from code_challenge___data_engineer___machinemax_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, None, "null-ts"), (1, datetime(2024, 1, 1, 0, 10), "ok")],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 5), 7)], "user_id int, ts timestamp, rv int"
    )
    got = {r.tag: r.rv for r in asof_join(left, right, "user_id", "ts", "ts", ["rv"]).collect()}
    # NULL ts sorts before every right row -> matches nothing (documented)
    assert got == {"null-ts": None, "ok": 7}


def test_urls_from_file(spark, tmp_path):
    f = tmp_path / "seeds.txt"
    f.write_text("  http://a.test/ \n\nhttp://b.test/\n   \n")
    urls = [r.url for r in urls_from_file(spark, str(f)).collect()]
    assert sorted(urls) == ["http://a.test/", "http://b.test/"]  # trimmed, blanks dropped
