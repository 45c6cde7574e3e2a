"""Robust (stdlib-html.parser mapInPandas) extraction: matches the regex
fast path on the fixture site, and handles real-world markup variation
(attribute order, single quotes, uppercase tags) the fixture-exact regexes
cannot pin."""

from __future__ import annotations

from code_challenge___data_engineer___machinemax_spark.crawl.extract import (
    article_fields,
    articles_only,
    extract_articles_robust,
)

from tests.test_crawl import ARTICLE_HTML, ARTICLE2_HTML, HUB_HTML

# same article as ARTICLE_HTML, serialized the way real CMSes do: reversed
# attribute order, single quotes, uppercase tags, extra whitespace
NASTY_HTML = """<HTML><HEAD>
<META content='article' property='og:type'>
<META content='Title One' property='og:title'>
<meta content='Desc One' property='og:description'>
<meta content='Alice' property='article:author'>
<meta content='news' property='article:section'>
<meta content='spark,engine' name='keywords'>
</HEAD><BODY>
<DIV itemprop='articleBody'  class='body'><P>Hello <B>bold</B> world.</P><p >Second para.</p></DIV>
</BODY></HTML>"""


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_robust_matches_regex_path_on_fixture(spark):
    pages = _pages(
        spark,
        [("u1", ARTICLE_HTML), ("u2", ARTICLE2_HTML), ("u3", HUB_HTML)],
    )
    want = sorted(
        (r.asDict() for r in article_fields(articles_only(pages)).collect()),
        key=lambda d: d["url"],
    )
    got = sorted(
        (r.asDict() for r in extract_articles_robust(pages).collect()),
        key=lambda d: d["url"],
    )
    assert got == want
    assert len(got) == 2  # hub page not admitted


def test_robust_handles_markup_variation(spark):
    pages = _pages(spark, [("nasty", NASTY_HTML)])
    # the regex path extracts nothing from this serialization...
    assert article_fields(articles_only(pages)).count() == 0
    # ...the parser path extracts the full article
    rows = extract_articles_robust(pages).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["title"] == "Title One"
    assert r["author"] == "Alice"
    assert r["keywords"] == "spark,engine"
    assert r["text"] == "Hello bold world. Second para."


def test_robust_null_edges(spark):
    # no paragraphs -> text NULL; '' og:title falls through to h1
    pages = _pages(spark, [("u2", ARTICLE2_HTML)])
    r = extract_articles_robust(pages).collect()[0].asDict()
    assert r["text"] is None
    assert r["title"] == "Headline Two"


def test_crawl_with_robust_extract_matches(spark):
    from code_challenge___data_engineer___machinemax_spark.crawl.fetcher import dict_fetcher
    from code_challenge___data_engineer___machinemax_spark.crawl.orchestrator import crawl

    from tests.test_crawl import BASE, SITE

    fast = crawl(spark, [f"{BASE}/"], dict_fetcher(SITE), BASE, max_depth=4)
    robust = crawl(spark, [f"{BASE}/"], dict_fetcher(SITE), BASE, max_depth=4,
                   robust_extract=True)
    key = lambda d: d["url"]
    assert sorted((r.asDict() for r in robust.articles.collect()), key=key) == \
           sorted((r.asDict() for r in fast.articles.collect()), key=key)
    assert robust.stats == fast.stats
