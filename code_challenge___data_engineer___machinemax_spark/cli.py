"""CLI driver — the reference's config surface (index.py:18-89) mapped
onto engine parameters: --accept / --single-page / --wait /
--no-random-wait as crawl flags, --download as the crawl's document sink,
--verbose as the crawl's journal emitter, and --download-file /
--download-files as the standalone ``download`` subcommand — plus the
search API entry point (api.py:11-12's route as a subcommand) and
engine-native sql / explain / run subcommands.

Thin argparse over public engine functions; no logic lives here.
"""

from __future__ import annotations

import argparse
import json
import sys

from .crawl.fetcher import (
    FetchFn,
    dict_fetcher,
    fetch_stage,
    http_fetcher,
    urls_from_file,
)
from .crawl.ingest import ArticleStore
from .crawl.orchestrator import crawl
from .session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ccdem-spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="BFS crawl from a seed URL (index.py:92-144)")
    c.add_argument("url", help="seed URL (scheme defaulted to http:// if missing)")
    c.add_argument("--accept", default=None, help="only follow links matching this regex")
    c.add_argument("--single-page", action="store_true", help="fetch only the seed (depth 1)")
    c.add_argument("--depth", type=int, default=3, help="max crawl rounds")
    c.add_argument("--wait", type=float, default=5.0, help="politeness delay ceiling (s)")
    c.add_argument("--no-random-wait", action="store_true", help="fixed instead of random 1..wait")
    c.add_argument("--store", default=None, help="parquet dir to append extracted articles")
    c.add_argument("--fixture", default=None, help="JSON file {url: [status, ctype, html]} served instead of HTTP (tests)")
    c.add_argument("--seeds-file", default=None, help="file of seed URLs, one per line (newsspider.py:24-27)")
    c.add_argument("--robust-extract", action="store_true",
                   help="html.parser extraction instead of the regex fast path")
    c.add_argument("--download", default=None, metavar="OUT_DIR",
                   help="also download the matched documents into OUT_DIR "
                        "(index.py:55-56 --download; adds downloaded_ok/"
                        "downloaded_total to the report)")
    c.add_argument("--verbose", action="store_true",
                   help="emit the crawl journal as JSON lines on stderr "
                        "(index.py:59-60 --verbose; index.py:215-235 journal)")

    d = sub.add_parser(
        "download",
        help="download documents without crawling (index.py:71-84 "
             "--download-file / --download-files)",
    )
    grp = d.add_mutually_exclusive_group(required=True)
    grp.add_argument("--url", default=None, help="one document URL (--download-file)")
    grp.add_argument("--url-file", default=None,
                     help="file of URLs, one per line (--download-files)")
    d.add_argument("--out-dir", required=True, help="directory for the document bodies")
    d.add_argument("--wait", type=float, default=5.0, help="politeness delay ceiling (s)")
    d.add_argument("--no-random-wait", action="store_true", help="fixed instead of random 1..wait")
    d.add_argument("--fixture", default=None, help="JSON file {url: [status, ctype, html]} served instead of HTTP (tests)")

    s = sub.add_parser("search", help="keyword search over a store (api.py:11-39)")
    s.add_argument("keyword")
    s.add_argument("--store", required=True)
    s.add_argument("--rank", choices=["none", "bm25", "tfidf"], default="none",
                   help="order results by relevance (reference returns an unordered cursor)")
    s.add_argument("--limit", type=int, default=10, help="top-k when ranking")

    q = sub.add_parser("sql", help="ad-hoc Spark SQL over the standard tables")
    q.add_argument("statement", help="SQL; the standard tables are registered as views")
    q.add_argument("--tables-dir", required=True,
                   help="parquet dir holding the standard tables (TESTDATA.md layout)")
    q.add_argument("--limit", type=int, default=0, help="cap output rows (0 = no cap)")

    e = sub.add_parser("explain", help="print a registered query's physical plan")
    e.add_argument("name", help="queries() key")
    e.add_argument("--tables-dir", required=True, help="parquet dir (TESTDATA.md layout)")
    e.add_argument("--mode", default="formatted",
                   choices=["simple", "extended", "formatted", "cost", "codegen"])

    r = sub.add_parser("run", help="run a registered engine query by name")
    r.add_argument("name", nargs="?", default=None, help="queries() key; omit with --list")
    r.add_argument("--tables-dir", default=None, help="parquet dir (TESTDATA.md layout)")
    r.add_argument("--list", action="store_true", help="print registered query names")
    r.add_argument("--limit", type=int, default=0, help="cap output rows (0 = no cap)")

    return p


def _fetcher(args: argparse.Namespace) -> FetchFn:
    if args.fixture:
        with open(args.fixture) as f:
            pages = {u: tuple(v) for u, v in json.load(f).items()}
        return dict_fetcher(pages)
    return http_fetcher(wait=args.wait, random_wait=not args.no_random_wait)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark("ccdem-cli")

    if args.cmd == "crawl":
        url = args.url if args.url.startswith(("http://", "https://")) else f"http://{args.url}/"
        seeds = [url]
        if args.seeds_file:
            seeds += [r.url for r in urls_from_file(spark, args.seeds_file).collect()]
        base = url.split("/", 3)[0] + "//" + url.split("/", 3)[2]
        res = crawl(
            spark,
            seeds,
            _fetcher(args),
            base_url=base,
            max_depth=1 if args.single_page else args.depth,
            accept_regex=args.accept,
            robust_extract=args.robust_extract,
        )
        if args.store:
            ArticleStore(spark, args.store).append(res.articles)
        stats = dict(res.stats)
        if args.download:
            # --download (index.py:55-56): fetch the matched document URLs
            # and sink their bodies; 'downloaded m / n' joins the report
            from .crawl.ingest import download_fetched, download_report

            ledger = download_fetched(
                fetch_stage(res.downloads.select("url"), _fetcher(args)),
                args.download,
            )
            ok_n, total = download_report(ledger)
            stats["downloaded_ok"], stats["downloaded_total"] = ok_n, total
        if args.verbose and res.journal is not None:
            # --verbose (index.py:59-60): the journal, one JSON line per
            # crawl event, on stderr — stdout stays the machine report
            for line in res.journal.toJSON().collect():
                print(line, file=sys.stderr)
        # the reference's run report (index.py:144,212)
        print(json.dumps(stats))
        return 0

    if args.cmd == "download":
        from .crawl.ingest import download_fetched, download_report

        if args.url is not None:
            frontier = spark.createDataFrame([(args.url,)], "url string")
        else:
            frontier = urls_from_file(spark, args.url_file)
        ledger = download_fetched(
            fetch_stage(frontier, _fetcher(args)), args.out_dir
        )
        ok_n, total = download_report(ledger)
        print(json.dumps({"downloaded_ok": ok_n, "downloaded_total": total}))
        return 0

    if args.cmd == "sql":
        from .tables import TABLES, load_table

        for t in TABLES:
            load_table(spark, args.tables_dir, t).createOrReplaceTempView(t)
        df = spark.sql(args.statement)
        if args.limit:
            df = df.limit(args.limit)
        for line in df.toJSON().collect():
            print(line)
        return 0

    if args.cmd == "explain":
        from . import plans

        queries = plans.all_queries()
        if args.name not in queries:
            print(f"explain: unknown query {args.name!r} (see run --list)", file=sys.stderr)
            return 2
        queries[args.name](spark, args.tables_dir).explain(args.mode)
        return 0

    if args.cmd == "run":
        from . import plans

        queries = plans.all_queries()
        if args.list:
            for name in queries:
                print(name)
            return 0
        if args.name is None or args.tables_dir is None:
            print("run: NAME and --tables-dir required (or use --list)", file=sys.stderr)
            return 2
        if args.name not in queries:
            print(f"run: unknown query {args.name!r} (see --list)", file=sys.stderr)
            return 2
        df = queries[args.name](spark, args.tables_dir)
        if args.limit:
            df = df.limit(args.limit)
        for line in df.toJSON().collect():
            print(line)
        return 0

    if args.cmd == "search":
        store = ArticleStore(spark, args.store)
        if args.rank != "none":
            rows = store.search_ranked(args.keyword, ranker=args.rank, k=args.limit)
            for line in rows.toJSON().collect():
                print(line)
        else:
            for line in store.search_json(args.keyword):
                print(line)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
