"""Iterative BFS crawl as driver-side rounds of DataFrame operations.

Reference: the worklist loop (index.py:121-142) + Scrapy follow rules
(newsspider.py:10-16). Catalyst has no iteration, so the loop lives in the
driver (SURVEY.md §4 — orchestration, not a relational op); every per-round
step IS relational: fetch (mapInPandas), admission filter, link extraction,
classification, and the visited anti-join (the reference's dedup sets).

Scale notes: `visited` is re-materialized per round (localCheckpoint) so the
union lineage doesn't grow unboundedly; the frontier is repartitioned to the
fetch-concurrency; every round's dedup is `dropDuplicates` within the round
plus one `left_anti` join against visited (broadcast while small, SMJ when
large — Catalyst/AQE decide).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import (
    admission_filter,
    article_fields,
    articles_only,
    classify_link,
    extract_links,
    resolve_url,
)
from .fetcher import FetchFn, fetch_stage


@dataclass
class CrawlResult:
    articles: DataFrame
    visited: DataFrame
    downloads: DataFrame  # wanted-doc links encountered (url, found_on)
    rejected: DataFrame  # junk/offsite links (the reference's regurgited_pages)
    stats: dict[str, int] = field(default_factory=dict)
    # op 30 — the journal as a relational sink (reference index.py:215-235
    # writes a per-event log file via the 'journal' logger): one row per
    # crawl event, (event, url, round, ts). Events mirror the reference's
    # messages: tries / fetch_error / rejected / will_explore / regurgitate
    # / caught_doc.
    journal: DataFrame | None = None


def crawl(
    spark: SparkSession,
    seeds: list[str],
    fetch: FetchFn,
    base_url: str,
    max_depth: int = 3,
    fetch_partitions: int = 4,
    accept_regex: str | None = None,
    robust_extract: bool = False,
) -> CrawlResult:
    """BFS crawl from ``seeds``, following same-site links up to
    ``max_depth`` rounds (``max_depth=1`` == the reference's --single-page,
    index.py:141-142). ``accept_regex`` narrows followed links
    (--accept, index.py:55-58). ``robust_extract`` switches the article
    stage from the regex fast path to the stdlib-HTML-parser mapInPandas
    path (real-world markup tolerance)."""
    frontier = spark.createDataFrame([(u,) for u in seeds], "url string").dropDuplicates(["url"])
    visited = frontier.limit(0)
    pages_acc: list[DataFrame] = []
    links_acc: list[DataFrame] = []
    journal_acc: list[DataFrame] = []

    def _journal(df: DataFrame, event: str, rnd: int, url_col: str = "url") -> DataFrame:
        return df.select(
            F.lit(event).alias("event"),
            F.col(url_col).alias("url"),
            F.lit(rnd).alias("round"),
            F.current_timestamp().alias("ts"),
        )

    depth = 0
    while depth < max_depth:
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        journal_acc.append(_journal(frontier, "tries", depth))  # 'tries page X'
        fetched = fetch_stage(
            frontier.repartition(min(fetch_partitions, max(n_frontier, 1))), fetch
        ).localCheckpoint()
        visited = visited.unionByName(frontier).dropDuplicates(["url"]).localCheckpoint()
        pages_acc.append(fetched)

        ok_pages_round = fetched.filter(F.col("ok"))
        journal_acc.append(_journal(fetched.filter(~F.col("ok")), "fetch_error", depth))
        explorable = admission_filter(ok_pages_round)
        # 'status code of X / content-type of X' debug lines: ok fetches
        # that fail admission
        journal_acc.append(
            _journal(ok_pages_round.join(explorable.select("url"), "url", "left_anti"),
                     "rejected", depth)
        )
        links = extract_links(explorable).withColumn(
            "link", resolve_url(F.col("page_url"), F.col("link"))
        )
        links = links.withColumn("link_class", classify_link(F.col("link"), base_url))
        links_acc.append(links.localCheckpoint())
        journal_acc.append(
            _journal(links.filter(F.col("link_class").isin("junk", "offsite"))
                     .select(F.col("link")).dropDuplicates(["link"]),
                     "regurgitate", depth, url_col="link")
        )
        journal_acc.append(
            _journal(links.filter(F.col("link_class") == "wanted_doc")
                     .select(F.col("link")).dropDuplicates(["link"]),
                     "caught_doc", depth, url_col="link")
        )

        next_links = links.filter(F.col("link_class") == "next_page")
        if accept_regex:
            next_links = next_links.filter(F.col("link").rlike(accept_regex))
        frontier = (
            next_links.select(F.col("link").alias("url"))
            .dropDuplicates(["url"])
            .join(visited, "url", "left_anti")  # the dedup-set op, index.py:166-169
        )
        journal_acc.append(_journal(frontier, "will_explore", depth))
        depth += 1

    pages = pages_acc[0] if pages_acc else None
    for extra in pages_acc[1:]:
        pages = pages.unionByName(extra)
    all_links = links_acc[0] if links_acc else None
    for extra in links_acc[1:]:
        all_links = all_links.unionByName(extra)

    if pages is None:
        empty_pages = spark.createDataFrame([], "url string, status int, content_type string, html string, ok boolean, error string")
        pages = empty_pages
    if all_links is None:
        all_links = spark.createDataFrame([], "page_url string, link string, link_class string")

    ok_pages = pages.filter(F.col("ok"))
    if robust_extract:
        from .extract import extract_articles_robust

        articles = extract_articles_robust(ok_pages)
    else:
        articles = article_fields(articles_only(ok_pages))
    downloads = (
        all_links.filter(F.col("link_class") == "wanted_doc")
        .select(F.col("link").alias("url"), F.col("page_url").alias("found_on"))
        .dropDuplicates(["url"])  # caught_docs set, index.py:163
    )
    rejected = all_links.filter(F.col("link_class").isin("junk", "offsite")).select(
        F.col("link").alias("url"), "link_class"
    ).dropDuplicates(["url"])

    if journal_acc:
        journal = journal_acc[0]
        for extra in journal_acc[1:]:
            journal = journal.unionByName(extra)
    else:
        journal = spark.createDataFrame([], "event string, url string, round int, ts timestamp")

    stats = {
        "pages_found": visited.count(),  # 'found N pages' report, index.py:144
        "docs_found": downloads.count(),
        "fetch_failures": pages.filter(~F.col("ok")).count(),
        "articles": articles.count(),
        "depth_reached": depth,
    }
    return CrawlResult(articles=articles, visited=visited, downloads=downloads,
                       rejected=rejected, stats=stats, journal=journal)
