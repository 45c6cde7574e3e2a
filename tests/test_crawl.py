"""Crawl-side tests: fixture site, injectable fetcher, no network.

Mirrors the reference's behavioral contract: BFS link following with dedup
(index.py:117-142), article admission + 7-field extraction
(newsspider.py:36-49), wanted-doc classification (index.py:162-172),
error-row tolerance (index.py:124-129), and the store round-trip assertions
(apitestmongo.py:34-55, api-test:36-60).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.crawl.extract import (
    article_fields,
    articles_only,
)
from code_challenge___data_engineer___machinemax_spark.crawl.fetcher import (
    dict_fetcher,
    fetch_stage,
)
from code_challenge___data_engineer___machinemax_spark.crawl.ingest import ArticleStore
from code_challenge___data_engineer___machinemax_spark.crawl.orchestrator import crawl

BASE = "http://news.test"

ARTICLE_HTML = """<html><head>
<meta property="og:type" content="article">
<meta property="og:title" content="Title One">
<meta property="og:description" content="Desc One">
<meta property="article:author" content="Alice">
<meta property="article:section" content="news">
<meta name="keywords" content="spark,engine">
</head><body>
<div itemprop="articleBody"><p>Hello <b>bold</b> world.</p><p>Second para.</p></div>
<a href="/page2">next</a>
<a href="/files/report.pdf">doc</a>
<a href="/img/photo.jpg">pic</a>
<a href="http://other.site/x">ext</a>
</body></html>"""

# article page with NO og:title but an h1 headline (fallback path) and NO
# paragraphs (text must be NULL, newsspider.py:49)
ARTICLE2_HTML = """<html><head>
<meta property="og:type" content="article">
<meta property="og:title" content="">
</head><body>
<h1 itemprop="headline">Headline <i>Two</i></h1>
<div itemprop="articleBody"></div>
<a href="page3">rel</a>
</body></html>"""

HUB_HTML = """<html><head><meta property="og:type" content="website"></head>
<body><a href="/a1">a1</a><a href="/a2">a2</a><a href="/a1">dup</a></body></html>"""

SITE = {
    f"{BASE}/": (200, "text/html", HUB_HTML),
    f"{BASE}/a1": (200, "text/html", ARTICLE_HTML),
    f"{BASE}/a2": (200, "text/html", ARTICLE2_HTML),
    f"{BASE}/page2": (200, "text/html", "<html><a href='/a1'>back</a></html>"),
    f"{BASE}/a2/page3": (404, "text/html", "nope"),
}


@pytest.fixture(scope="module")
def result(spark):
    return crawl(spark, [f"{BASE}/"], dict_fetcher(SITE), BASE, max_depth=4)


def test_bfs_visits_all_reachable(result):
    visited = {r.url for r in result.visited.collect()}
    assert f"{BASE}/" in visited and f"{BASE}/a1" in visited and f"{BASE}/a2" in visited
    assert f"{BASE}/page2" in visited
    # junk/offsite never enqueued
    assert f"{BASE}/img/photo.jpg" not in visited
    assert "http://other.site/x" not in visited


def test_journal_counts_match_stats(result):
    # op 30: the journal sink's event counts reconcile with CrawlResult.stats
    # (reference index.py:215-235 'found N pages, M doc(s)' + per-event lines)
    j = result.journal
    assert [f.name for f in j.schema.fields] == ["event", "url", "round", "ts"]
    counts = {r.event: r.n for r in j.groupBy("event").agg(F.count("*").alias("n")).collect()}
    # every visited page got exactly one 'tries' line (dedup-before-fetch)
    assert counts["tries"] == result.stats["pages_found"]
    assert j.filter(F.col("event") == "tries").select("url").distinct().count() == counts["tries"]
    # every wanted doc got a 'caught_doc' line (per-round dedup; the site has
    # one pdf reachable in one round)
    assert (
        j.filter(F.col("event") == "caught_doc").select("url").distinct().count()
        == result.stats["docs_found"]
    )
    assert counts.get("fetch_error", 0) == result.stats["fetch_failures"]
    # junk + offsite links were regurgitated
    assert (
        j.filter(F.col("event") == "regurgitate").select("url").distinct().count()
        == result.rejected.count()
    )
    # rounds are within the crawl depth
    assert j.agg(F.max("round")).collect()[0][0] < result.stats["depth_reached"]


def test_no_url_fetched_twice(result):
    # /a1 is linked from hub (twice) and page2: dedup sets must collapse it
    assert result.visited.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    assert result.stats["pages_found"] == 5  # incl. the 404 page3


def test_article_admission_and_fields(result):
    arts = {r.url: r for r in result.articles.collect()}
    assert set(arts) == {f"{BASE}/a1", f"{BASE}/a2"}  # hub/page2 not articles
    a1 = arts[f"{BASE}/a1"]
    assert a1.title == "Title One"
    assert a1.description == "Desc One"
    assert a1.author == "Alice"
    assert a1.section == "news"
    assert a1.keywords == "spark,engine"
    assert a1.text == "Hello bold world. Second para."  # tags stripped, joined


def test_title_fallback_and_null_text(result):
    a2 = {r.url: r for r in result.articles.collect()}[f"{BASE}/a2"]
    assert a2.title == "Headline Two"  # '' og:title falls through to h1
    assert a2.text is None  # zero paragraphs -> NULL, not ''
    assert a2.description is None


def test_wanted_doc_classification(result):
    docs = {r.url for r in result.downloads.collect()}
    assert docs == {f"{BASE}/files/report.pdf"}
    assert result.stats["docs_found"] == 1


def test_fetch_error_is_row_not_exception(spark):
    fetched = fetch_stage(
        spark.createDataFrame([(f"{BASE}/missing",)], "url string"),
        dict_fetcher(SITE),
    ).collect()
    assert len(fetched) == 1
    assert fetched[0].ok is False
    assert "ConnectionError" in fetched[0].error


def test_single_page_mode(spark):
    res = crawl(spark, [f"{BASE}/"], dict_fetcher(SITE), BASE, max_depth=1)
    assert res.stats["depth_reached"] == 1
    assert res.stats["pages_found"] == 1  # only the seed fetched


def test_store_roundtrip_update_search(spark, tmp_path, result):
    # the reference's four storage/API assertions (apitestmongo.py:34-55,
    # api-test:40-60) against the parquet store
    store = ArticleStore(spark, str(tmp_path / "articles"))
    store.append(result.articles, version=1)

    # insert -> lookup round-trip, value fidelity
    row = store.latest().filter(F.col("url") == f"{BASE}/a1").collect()
    assert len(row) == 1 and row[0].text == "Hello bold world. Second para."

    # keyword search: hit is exactly the matching doc
    hits = store.search("bold").collect()
    assert [h.url for h in hits] == [f"{BASE}/a1"]
    # unknown keyword -> empty list, not an error
    assert store.search("zzzzzz").collect() == []
    # case-insensitive OR semantics
    assert len(store.search("BOLD nosuchtoken").collect()) == 1

    # update-by-key changes the value; latest() sees exactly one row
    store.update(f"{BASE}/a1", text="replaced text")
    row = store.latest().filter(F.col("url") == f"{BASE}/a1").collect()
    assert len(row) == 1 and row[0].text == "replaced text"
    # search over old content no longer matches
    assert store.search("bold").collect() == []
    assert len(store.search("replaced").collect()) == 1

    # json boundary
    js = store.search_json("replaced")
    assert len(js) == 1 and '"url"' in js[0]

    # time travel: as-of the first version the old text is still visible
    vs = store.versions()
    assert len(vs) == 2
    old = store.latest(as_of_version=vs[0]).filter(F.col("url") == f"{BASE}/a1").collect()
    assert old[0].text == "Hello bold world. Second para."


def test_bfs_frontier_order_golden(result):
    """Pin the BFS round structure itself (reference index.py:121-142's
    order of discovery), not just depth/no-refetch: per-round 'tries'
    (the frontier actually fetched) and 'will_explore' (the next frontier
    after dedup) on the fixture site. hub -> {a1, a2} -> {page2, page3}
    -> {} (page2's only link /a1 is already visited; page3 404s)."""
    from collections import defaultdict

    by = defaultdict(set)
    for r in result.journal.collect():
        by[(r.event, r.round)].add(r.url)

    assert by[("tries", 0)] == {f"{BASE}/"}
    assert by[("will_explore", 0)] == {f"{BASE}/a1", f"{BASE}/a2"}
    assert by[("tries", 1)] == {f"{BASE}/a1", f"{BASE}/a2"}
    # a2's relative 'page3' resolves against {BASE}/a2 -> {BASE}/page3
    # (proper urljoin — the reference's naive concat bug is NOT reproduced)
    assert by[("will_explore", 1)] == {f"{BASE}/page2", f"{BASE}/page3"}
    assert by[("tries", 2)] == {f"{BASE}/page2", f"{BASE}/page3"}
    # page2 links only to the already-visited /a1 -> frontier drains
    assert ("will_explore", 2) not in by or by[("will_explore", 2)] == set()
    assert by[("fetch_error", 2)] == {f"{BASE}/page3"}
    # doc/junk discovery rounds are pinned too (round 1 = links of round-1
    # fetches of the hub's children... the hub itself links none)
    assert by[("caught_doc", 1)] == {f"{BASE}/files/report.pdf"}
    assert by[("regurgitate", 1)] == {f"{BASE}/img/photo.jpg", "http://other.site/x"}
    # no event ever references a round beyond the drained frontier
    assert max(r for _, r in by) == 2


def _deep_site(depth: int) -> dict:
    """Synthetic binary-tree site, heap-indexed: node i links to children
    2i+1 / 2i+2, plus a back-link to its parent and to the root (revisits
    the dedup sets must absorb every round, reference index.py:117-119).
    2^depth - 1 pages; BFS level of node i is floor(log2(i+1))."""
    n = 2**depth - 1
    site = {}
    for i in range(n):
        links = [f"/n{c}" for c in (2 * i + 1, 2 * i + 2) if c < n]
        if i > 0:
            links += [f"/n{(i - 1) // 2}", "/n0"]
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        html = ('<html><head><meta property="og:type" content="website"></head>'
                f"<body>{body}</body></html>")
        site[f"{BASE}/n{i}"] = (200, "text/html", html)
    return site


def test_bfs_deep_site_rounds_and_counts(spark):
    """Scale pin for the driver-side BFS loop (VERDICT r4 #8): a site 10x
    deeper than the fixture (10 BFS levels, 1023 pages). Pins: round count
    == tree depth (the localCheckpoint-bounded loop neither stalls nor
    overshoots), per-round frontier == exactly the BFS level (2^r nodes —
    the back-links to parent/root are absorbed by the visited anti-join
    every round), no page fetched twice, and the loop drains."""
    import time
    from collections import defaultdict

    depth = 10
    site = _deep_site(depth)
    t0 = time.perf_counter()
    res = crawl(spark, [f"{BASE}/n0"], dict_fetcher(site), BASE,
                max_depth=depth + 3, fetch_partitions=8)
    wall = time.perf_counter() - t0

    by = defaultdict(set)
    for r in res.journal.filter(F.col("event") == "tries").collect():
        by[r.round].add(r.url)
    assert sorted(by) == list(range(depth))  # exactly `depth` rounds
    for rnd in range(depth):
        assert len(by[rnd]) == 2**rnd, f"round {rnd}: {len(by[rnd])} != {2**rnd}"
    # every page fetched exactly once
    assert res.visited.count() == len(site)
    assert res.stats["pages_found"] == len(site)
    assert res.stats["fetch_failures"] == 0
    # sanity ceiling so a pathological per-round blowup fails loudly rather
    # than silently burning CI time (measured ~0.5-1 s/round on local[8];
    # SCALE.md records the profile)
    assert wall < 240, f"deep crawl took {wall:.0f}s"
