"""CLI surface: crawl with fixture fetcher -> store -> search, flags."""

from __future__ import annotations

import json

from code_challenge___data_engineer___machinemax_spark.cli import main

from .test_crawl import BASE, SITE


def test_cli_crawl_store_search(spark, tmp_path, capsys):
    fixture = tmp_path / "site.json"
    fixture.write_text(json.dumps({u: list(v) for u, v in SITE.items()}))
    store = str(tmp_path / "articles")

    rc = main([
        "crawl", f"{BASE}/", "--fixture", str(fixture), "--store", store, "--depth", "4",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pages_found"] == 5 and stats["articles"] == 2

    rc = main(["search", "bold", "--store", store])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and json.loads(out[0])["url"] == f"{BASE}/a1"


def test_cli_single_page_and_accept(spark, tmp_path, capsys):
    fixture = tmp_path / "site.json"
    fixture.write_text(json.dumps({u: list(v) for u, v in SITE.items()}))

    rc = main(["crawl", f"{BASE}/", "--fixture", str(fixture), "--single-page"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pages_found"] == 1  # --single-page == depth 1 (index.py:141-142)

    rc = main(["crawl", f"{BASE}/", "--fixture", str(fixture), "--depth", "4",
               "--accept", r"/a1$"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pages_found"] == 2  # seed + only the /a1 link passes --accept


def test_cli_scheme_defaulting(spark, tmp_path, capsys):
    # reference newsspider.py:29-30: bare host gets http:// and trailing /
    fixture = tmp_path / "site.json"
    site = dict(SITE)
    site["http://news.test/"] = SITE[f"{BASE}/"]
    fixture.write_text(json.dumps({u: list(v) for u, v in site.items()}))
    rc = main(["crawl", "news.test", "--fixture", str(fixture), "--single-page"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pages_found"] == 1 and stats["fetch_failures"] == 0


def test_cli_ranked_search(spark, tmp_path, capsys):
    fixture = tmp_path / "site.json"
    fixture.write_text(json.dumps({u: list(v) for u, v in SITE.items()}))
    store = str(tmp_path / "articles")
    main(["crawl", f"{BASE}/", "--fixture", str(fixture), "--store", store, "--depth", "4"])
    capsys.readouterr()

    for ranker, score_col in (("bm25", "bm25"), ("tfidf", "tfidf")):
        rc = main(["search", "world second", "--store", store, "--rank", ranker])
        assert rc == 0
        rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        # only the article containing the tokens matches, and it carries a
        # positive relevance score (the reference's cursor had no ordering)
        assert [r["url"] for r in rows] == [f"{BASE}/a1"]
        assert rows[0][score_col] > 0


def test_cli_sql(spark, capsys):
    rc = main(["sql", "SELECT COUNT(*) AS n FROM orders",
               "--tables-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {"n": 1500}


def test_cli_sql_limit(spark, capsys):
    rc = main(["sql", "SELECT o_orderkey FROM orders ORDER BY o_orderkey",
               "--tables-dir", "/root/testdata/sf0.001", "--limit", "3"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3


def test_cli_run_registered_query(spark, capsys):
    rc = main(["run", "q1_pricing_summary", "--tables-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {r["l_returnflag"] for r in rows} <= {"A", "N", "R"}
    assert all("sum_qty" in r for r in rows)


def test_cli_run_list_and_unknown(spark, capsys):
    rc = main(["run", "--list"])
    assert rc == 0
    names = capsys.readouterr().out.strip().splitlines()
    assert "q1_pricing_summary" in names and "q21_waiting_suppliers" in names

    rc = main(["run", "no_such_query", "--tables-dir", "/root/testdata/sf0.001"])
    assert rc == 2


def test_cli_explain(spark, capsys):
    rc = main(["explain", "q1_pricing_summary", "--tables-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "HashAggregate" in out

    rc = main(["explain", "nope", "--tables-dir", "/root/testdata/sf0.001"])
    assert rc == 2


def test_cli_download_single_file(spark, tmp_path, capsys):
    # --download-file equivalent (index.py:78-81): one URL, one body on disk
    fixture = tmp_path / "site.json"
    fixture.write_text(json.dumps({
        "http://files.test/docs/report.pdf": [200, "application/pdf", "PDFBODY"],
    }))
    out_dir = tmp_path / "docs"
    rc = main(["download", "--url", "http://files.test/docs/report.pdf",
               "--out-dir", str(out_dir), "--fixture", str(fixture)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report == {"downloaded_ok": 1, "downloaded_total": 1}
    assert (out_dir / "report.pdf").read_text() == "PDFBODY"


def test_cli_download_url_list_counts_failures(spark, tmp_path, capsys):
    # --download-files equivalent (index.py:82-85): list file, blank lines
    # skipped, fetch failures counted as attempts (reference's try/except)
    fixture = tmp_path / "site.json"
    fixture.write_text(json.dumps({
        "http://files.test/a.pdf": [200, "application/pdf", "AAA"],
        "http://files.test/b.csv": [200, "text/csv", "b1,b2"],
    }))
    lst = tmp_path / "urls.lst"
    lst.write_text("http://files.test/a.pdf\n\n  \nhttp://files.test/b.csv\n"
                   "http://files.test/missing.pdf\n")
    out_dir = tmp_path / "docs"
    rc = main(["download", "--url-file", str(lst),
               "--out-dir", str(out_dir), "--fixture", str(fixture)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report == {"downloaded_ok": 2, "downloaded_total": 3}
    assert (out_dir / "a.pdf").read_text() == "AAA"
    assert (out_dir / "b.csv").read_text() == "b1,b2"
    assert not (out_dir / "missing.pdf").exists()


def test_cli_crawl_download_and_verbose(spark, tmp_path, capsys):
    # crawl --download OUT_DIR (index.py:55-56) + --verbose journal
    # (index.py:59-60, 215-235): the matched doc is fetched and sunk, and
    # the journal's caught_doc event lands on stderr as a JSON line
    site = {u: list(v) for u, v in SITE.items()}
    site[f"{BASE}/files/report.pdf"] = [200, "application/pdf", "PDFBODY"]
    fixture = tmp_path / "site.json"
    fixture.write_text(json.dumps(site))
    out_dir = tmp_path / "docs"
    rc = main(["crawl", f"{BASE}/", "--fixture", str(fixture), "--depth", "4",
               "--download", str(out_dir), "--verbose"])
    assert rc == 0
    captured = capsys.readouterr()
    stats = json.loads(captured.out.strip().splitlines()[-1])
    assert stats["downloaded_ok"] == 1 and stats["downloaded_total"] == 1
    assert (out_dir / "report.pdf").read_text() == "PDFBODY"
    journal = [json.loads(l) for l in captured.err.strip().splitlines()
               if l.startswith("{")]
    events = {j["event"] for j in journal}
    assert "caught_doc" in events and "tries" in events
    assert any(j["url"].endswith("report.pdf") for j in journal
               if j["event"] == "caught_doc")
