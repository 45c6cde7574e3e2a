"""Queries mirroring the reference system's own operators (SURVEY.md §2.1-2.3),
exercised over the driver-provided `documents` table (the article-corpus
stand-in, FIXTURES.md §5). Where an operator needs crawl-shaped inputs (URLs,
HTML, download ledgers) the query synthesizes them deterministically from
`documents` columns inside the query itself — identically in the Spark plan
and the DuckDB oracle — so both engines see the same input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import (
    tokenize,
    tokenize_analyzed_sql,
    tokenize_folded_sql,
    tokenize_sql,
    tokenize_stemmed_sql,
)
from ..operators.search import (
    build_inverted_index,
    indexed_keyword_search,
    keyword_search,
    keyword_search_stemmed,
)
from ..tables import load_table
from .registry import query

_SEARCH_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


# --- op 14/15/27: keyword full-text search (the reference's core query,
#     api.py:22-26; semantics pinned by api-test:45-60) ----------------------

@query(
    "keyword_search_hit",
    oracle=f"""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE list_has_any({tokenize_sql('text')}, ['spark', 'window'])
    """,
)
def keyword_search_hit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword OR-search 'spark window' + 7-field-style projection
    (reference api.py:26-35)."""
    d = load_table(spark, sf_dir, "documents")
    return keyword_search(d, "spark window").select(*_SEARCH_COLS)


@query(
    "keyword_search_miss",
    oracle=f"""
    SELECT doc_id, text FROM documents
    WHERE list_has_any({tokenize_sql('text')}, ['qqzzxynotaword'])
    """,
)
def keyword_search_miss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unknown keyword -> empty result, not an error (api-test:40-43)."""
    d = load_table(spark, sf_dir, "documents")
    return keyword_search(d, "qqzzxynotaword").select("doc_id", "text")


@query(
    "keyword_search_stemmed",
    oracle=f"""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE list_has_any({tokenize_stemmed_sql('text')}, ['query', 'join'])
    """,
)
def keyword_search_stemmed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stemmed search 'queries joins' -> matches docs containing 'query' /
    'join'. Closes the documented stemming deviation from Mongo $text's
    English analyzer (api.py:22-26): the S-stemmer runs identically as a
    codegen'd CASE in Spark and plain SQL in the oracle. The unstemmed
    engine returns ZERO rows for this query — the delta is the analyzer."""
    d = load_table(spark, sf_dir, "documents")
    return keyword_search_stemmed(d, "queries joins").select(*_SEARCH_COLS)


@query(
    "keyword_search_folded",
    oracle=f"""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE list_has_any({tokenize_folded_sql('text')}, ['spark', 'window'])
    """,
)
def keyword_search_folded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diacritic-insensitive search — the second analyzer-parity half of
    Mongo $text (it folds diacritics by default; keyword_search_stemmed
    covers stemming). The synthetic corpus happens to be accent-free, so
    this returns the same hit set as the plain search — the oracle still
    value-checks the folded tokenizer end-to-end, and the accent-bearing
    semantics are pinned by tests/test_text.py on crafted data."""
    from ..operators.search import keyword_search_folded

    d = load_table(spark, sf_dir, "documents")
    return keyword_search_folded(d, "spark window").select(*_SEARCH_COLS)


@query(
    "keyword_search_analyzed",
    oracle=f"""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE list_has_any({tokenize_analyzed_sql('text')}, ['query', 'join'])
    """,
)
def keyword_search_analyzed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL Mongo $text analyzer parity in one predicate: lowercase +
    diacritic fold + S-stem on both sides ('cafés' matches 'cafe', 'CAFÉ',
    'cafes' — pinned on crafted accents in tests/test_text.py; the
    accent-free synthetic corpus makes this row equal the stemmed search,
    which the oracle still value-checks through the composed analyzer)."""
    from ..operators.search import keyword_search_analyzed

    d = load_table(spark, sf_dir, "documents")
    return keyword_search_analyzed(d, "queries joins").select(*_SEARCH_COLS)


@query(
    "keyword_search_indexed",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE list_has_any({tokenize_sql('text')}, ['merge', 'vector'])
    """,
)
def keyword_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same search semantics via the materialized inverted index (the scale
    path replacing Mongo's text index, api.py:22): probe postings on the
    query tokens -> distinct ids -> semi-join back."""
    d = load_table(spark, sf_dir, "documents")
    idx = build_inverted_index(d, "doc_id")
    return indexed_keyword_search(d, idx, "doc_id", "merge vector").select(
        "doc_id", "lang", "source"
    )


@query(
    "keyword_search_stored_index",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE list_has_any({tokenize_sql('text')}, ['merge', 'vector'])
    """,
)
def keyword_search_stored_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 14 on the PERSISTED L2 index (DEPLOY.md L2; the twin of
    `keyword_search_indexed`, which builds its postings in-plan): the probe
    reads only the query tokens' bucket partitions with the token equality
    pushed into parquet — Mongo's B-tree walk as partition pruning — then
    broadcast-semi-joins back to the corpus. Index materialization is
    ingest-time work (primed once per store signature)."""
    from ..operators.search import search_with_materialized_index
    from ..stores import ensure_inverted_index_store

    path = ensure_inverted_index_store(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    return search_with_materialized_index(
        spark, d, path, "doc_id", "merge vector"
    ).select("doc_id", "lang", "source")


@query(
    "term_frequencies",
    oracle=f"""
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest({tokenize_sql('text')}) AS token FROM documents)
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 25
    """,
)
def term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequencies: tokenize -> explode -> agg
    (op 14 generalized to an analyzer building block)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(25)
    )


# --- ops 9/10/11/12: the spider's full extraction pipeline ------------------

_PAGE_HTML_SQL = """
        '<html><head>'
        || '<meta property="og:type" content="'
        || CASE WHEN doc_id % 5 = 0 THEN 'website' ELSE 'article' END || '">'
        || '<meta property="og:title" content="'
        || CASE WHEN doc_id % 4 = 0 THEN '' ELSE 'Title ' || source END || '">'
        || CASE WHEN doc_id % 3 = 0
                THEN '<meta property="og:description" content="About ' || lang || '">'
                ELSE '' END
        || '<meta property="article:section" content="' || source || '">'
        || '</head><body>'
        || '<h1 itemprop="headline">Head <b>' || doc_id || '</b></h1>'
        || CASE WHEN doc_id % 7 = 0
                THEN '<div itemprop="articleBody"></div>'
                ELSE '<div itemprop="articleBody"><p>' || substr(text, 1, 60)
                     || '</p><p>tail <i>bit</i></p></div>' END
        || '</body></html>'
"""


@query(
    "article_field_extraction",
    oracle=f"""
    WITH pages AS (
        SELECT 'http://news.site/' || doc_id AS url, {_PAGE_HTML_SQL} AS html
        FROM documents
    ), fields AS (
        SELECT url, html,
               nullif(regexp_extract(html, '<meta property="og:type" content="([^"]*)"', 1), '') AS og_type,
               nullif(regexp_extract(html, '<meta property="og:title" content="([^"]*)"', 1), '') AS og_title,
               nullif(trim(regexp_replace(
                   regexp_extract(html, '<h1[^>]*itemprop="headline"[^>]*>(.*?)</h1>', 1),
                   '<[^>]*>', '', 'g')), '') AS h1_title,
               nullif(regexp_extract(html, '<meta property="og:description" content="([^"]*)"', 1), '') AS description,
               nullif(regexp_extract(html, '<meta property="article:section" content="([^"]*)"', 1), '') AS section,
               regexp_extract_all(
                   regexp_extract(html, '<div[^>]*itemprop="articleBody"[^>]*>(.*?)</div>', 1),
                   '<p[^>]*>(.*?)</p>', 1) AS paragraphs
        FROM pages
    )
    SELECT url,
           coalesce(og_title, h1_title) AS title,
           description, section,
           CASE WHEN len(paragraphs) = 0 THEN NULL
                ELSE trim(regexp_replace(array_to_string(paragraphs, ' '),
                                         '<[^>]*>', '', 'g')) END AS text
    FROM fields
    WHERE og_type = 'article'
    """,
)
def article_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spider's extraction pipeline end to end, oracle-checked:
    admission filter on og:type (op 11, newsspider.py:36-38), og:title ->
    h1 fallback with '' falling through (op 10, newsspider.py:41-42), meta
    projections (op 9), paragraph join + tag strip with NULL-iff-no-
    paragraphs (op 12, newsspider.py:48-49). HTML synthesized from
    `documents` so both engines see identical pages, exercising every
    branch: missing og:title (doc_id%4=0), non-article pages (%5=0),
    missing description (%3!=0), empty body (%7=0)."""
    from ..crawl.extract import article_fields, articles_only

    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><meta property="og:type" content="'),
        F.when(F.col("doc_id") % 5 == 0, "website").otherwise("article"),
        F.lit('"><meta property="og:title" content="'),
        F.when(F.col("doc_id") % 4 == 0, "").otherwise(F.concat(F.lit("Title "), F.col("source"))),
        F.lit('">'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit('<meta property="og:description" content="About '), F.col("lang"), F.lit('">')),
        ).otherwise(F.lit("")),
        F.lit('<meta property="article:section" content="'),
        F.col("source"),
        F.lit('"></head><body><h1 itemprop="headline">Head <b>'),
        F.col("doc_id"),
        F.lit("</b></h1>"),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit('<div itemprop="articleBody"></div>')
        ).otherwise(
            F.concat(
                F.lit('<div itemprop="articleBody"><p>'),
                F.substring("text", 1, 60),
                F.lit("</p><p>tail <i>bit</i></p></div>"),
            )
        ),
        F.lit("</body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("http://news.site/"), F.col("doc_id")).alias("url"),
        html.alias("html"),
    )
    return article_fields(articles_only(pages)).select("url", "title", "description", "section", "text")


# --- op 16: point lookup by key (apitestmongo.py:38) ------------------------

@query(
    "point_lookup_document",
    oracle="SELECT doc_id, text, lang FROM documents WHERE doc_id = 42",
)
def point_lookup_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find_one-by-id equivalent."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") == 42).select("doc_id", "text", "lang")


# --- op 12: HTML tag strip cleanse (newsspider.py:48-49) --------------------

@query(
    "cleanse_html_strip",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
               '<div class="body"><p>' || text || '</p><br/><span>' || source || '</span></div>',
               '<[^>]*>', '', 'g')) AS cleaned
    FROM documents
    """,
)
def cleanse_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete all <...> tags and trim (the article-body cleanse). HTML is
    synthesized from the row so Spark and the oracle see identical input."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div class="body"><p>'),
        F.col("text"),
        F.lit("</p><br/><span>"),
        F.col("source"),
        F.lit("</span></div>"),
    )
    return d.select(
        "doc_id", F.trim(F.regexp_replace(html, r"<[^>]*>", "")).alias("cleaned")
    )


# --- op 10: Python-`or` coalesce fallback (newsspider.py:41-42) -------------

@query(
    "coalesce_fallback",
    oracle="""
    SELECT doc_id,
           coalesce(nullif(CASE WHEN lang = 'en' THEN '' ELSE lang END, ''), source) AS title
    FROM documents
    """,
)
def coalesce_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`a or b` fallback: empty string falls through like NULL (the og:title
    -> h1 fallback). Blanks synthesized for lang='en' rows."""
    d = load_table(spark, sf_dir, "documents")
    primary = F.when(F.col("lang") == "en", F.lit("")).otherwise(F.col("lang"))
    return d.select(
        "doc_id", F.coalesce(F.nullif(primary, F.lit("")), F.col("source")).alias("title")
    )


# --- ops 17, 21, 22: URL normalization (index.py:160-161, newsspider.py:27-32)

_URL_SYNTH_SQL = """
        CASE WHEN doc_id % 3 = 0 THEN 'www.' || source || '.com/p/' || doc_id
             WHEN doc_id % 3 = 1 THEN 'http://' || source || '.org/a/' || doc_id
             ELSE 'https://sub.' || source || '.net/x/' || doc_id END
"""


@query(
    "url_normalize",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_URL_SYNTH_SQL} AS raw_url FROM documents),
    fixed AS (
        SELECT doc_id, raw_url,
               CASE WHEN NOT regexp_matches(raw_url, '^https?://')
                    THEN 'http://' || raw_url || '/' ELSE raw_url END AS url
        FROM raw
    )
    SELECT doc_id, raw_url, url,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1), '^www\\.', '') AS domain
    FROM fixed
    """,
)
def url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scheme defaulting (op 21), hostname extraction (op 22) and the
    intended www-prefix strip (fixing the reference's lstrip bug,
    newsspider.py:27,32 — SURVEY.md §0.2)."""
    d = load_table(spark, sf_dir, "documents")
    raw_url = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("www."), F.col("source"), F.lit(".com/p/"), F.col("doc_id")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("http://"), F.col("source"), F.lit(".org/a/"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("https://sub."), F.col("source"), F.lit(".net/x/"), F.col("doc_id")))
    )
    url = F.when(
        ~raw_url.rlike("^https?://"), F.concat(F.lit("http://"), raw_url, F.lit("/"))
    ).otherwise(raw_url)
    host = F.regexp_extract(url, "^https?://([^/]+)", 1)
    return d.select(
        "doc_id",
        raw_url.alias("raw_url"),
        url.alias("url"),
        host.alias("host"),
        F.regexp_replace(host, r"^www\.", "").alias("domain"),
    )


# --- ops 3, 11, 18, 19, 20: admission filters + link classification ---------

_LINK_SYNTH_SQL = """
        CASE WHEN doc_id % 5 = 0 THEN 'http://site.com/files/report_' || doc_id || '.pdf'
             WHEN doc_id % 5 = 1 THEN 'http://site.com/img/pic_' || doc_id || '.jpg'
             WHEN doc_id % 5 = 2 THEN 'http://site.com/news/story_' || doc_id
             WHEN doc_id % 5 = 3 THEN 'http://other.org/page_' || doc_id
             ELSE 'http://site.com/data/table_' || doc_id || '.csv' END
"""

_WANTED_EXT = r"(?i)\.(pdf|docx?|xlsx?|pptx?|o(d|t)[cgmpst]|csv|rtf|zip|rar|t?gz|xz)$"
_BIN_EXT = r"(?i)\.(jpe?g|png|gif|bmp|svg|ico|webp|mp[34]|avi|mov|mkv|woff2?|ttf|js|exe)$"


@query(
    "link_classify",
    oracle=f"""
    WITH links AS (SELECT doc_id, {_LINK_SYNTH_SQL} AS link FROM documents)
    SELECT doc_id, link,
           CASE WHEN regexp_matches(link, '(?i)\\.(pdf|docx?|xlsx?|pptx?|o(d|t)[cgmpst]|csv|rtf|zip|rar|t?gz|xz)$')
                    THEN 'wanted_doc'
                WHEN regexp_matches(link, '(?i)\\.(jpe?g|png|gif|bmp|svg|ico|webp|mp[34]|avi|mov|mkv|woff2?|ttf|js|exe)$')
                    THEN 'junk'
                WHEN link LIKE '%site.com%' THEN 'next_page'
                ELSE 'offsite' END AS link_class
    FROM links
    """,
)
def link_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way link classification from the crawler (index.py:162-172):
    wanted-document extensions (index.py:10), binary junk (index.py:11-12),
    same-site next pages (index.py:165), else offsite."""
    d = load_table(spark, sf_dir, "documents")
    link = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("http://site.com/files/report_"), F.col("doc_id"), F.lit(".pdf")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("http://site.com/img/pic_"), F.col("doc_id"), F.lit(".jpg")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("http://site.com/news/story_"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("http://other.org/page_"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("http://site.com/data/table_"), F.col("doc_id"), F.lit(".csv")))
    )
    link_class = (
        F.when(link.rlike(_WANTED_EXT), "wanted_doc")
        .when(link.rlike(_BIN_EXT), "junk")
        .when(link.contains("site.com"), "next_page")
        .otherwise("offsite")
    )
    return d.select("doc_id", link.alias("link"), link_class.alias("link_class"))


# --- op 13: link extraction (index.py:158-159, regex at index.py:13) --------

@query(
    "link_extraction",
    oracle="""
    WITH pages AS (
        SELECT doc_id,
               '<a href="/p/' || doc_id || '">x</a><img src="/i/' || doc_id
                   || '.png"><a href="http://ext.org/' || source || '">y</a>' AS html
        FROM documents
    )
    SELECT doc_id, unnest(regexp_extract_all(html, '(href|src)="([^"]*)"', 2)) AS link
    FROM pages
    """,
)
def link_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find all href/src targets in a page and explode one row per link."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<a href="/p/'), F.col("doc_id"), F.lit('">x</a><img src="/i/'),
        F.col("doc_id"), F.lit('.png"><a href="http://ext.org/'), F.col("source"), F.lit('">y</a>'),
    )
    return d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(html, F.lit(r'(href|src)="([^"]*)"'), 2)).alias("link"),
    )


# --- op 24: frontier dedup via anti-join (index.py:117-119,162-172) ---------

@query(
    "frontier_dedup",
    oracle="""
    WITH frontier AS (SELECT doc_id, 'http://site.com/p/' || (doc_id % 80) AS url
                      FROM documents WHERE doc_id < 120),
    dedup AS (SELECT url, MIN(doc_id) AS first_seen FROM frontier GROUP BY url),
    visited AS (SELECT 'http://site.com/p/' || doc_id AS url FROM documents WHERE doc_id % 2 = 0)
    SELECT d.url, d.first_seen FROM dedup d
    WHERE NOT EXISTS (SELECT 1 FROM visited v WHERE v.url = d.url)
    """,
)
def frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One crawl round of frontier maintenance: in-round dedup (min-id wins)
    then anti-join against the visited set — the reference's
    found_pages_set/caught_docs logic as relational ops."""
    d = load_table(spark, sf_dir, "documents")
    frontier = d.filter(F.col("doc_id") < 120).select(
        "doc_id", F.concat(F.lit("http://site.com/p/"), F.col("doc_id") % 80).alias("url")
    )
    dedup = frontier.groupBy("url").agg(F.min("doc_id").alias("first_seen"))
    visited = d.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("http://site.com/p/"), F.col("doc_id")).alias("url")
    )
    return dedup.join(visited, "url", "left_anti")


# --- op 7: update-by-key / latest-wins upsert (apitestmongo.py:53) ----------

@query(
    "upsert_latest_wins",
    oracle="""
    WITH versions AS (
        SELECT doc_id, 1 AS version, text FROM documents
        UNION ALL
        SELECT doc_id, 2 AS version, 'updated: ' || substr(text, 1, 40) AS text
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id, version, text FROM versions
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY version DESC) = 1
    """,
)
def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-Parquet upsert: append updated rows, read back latest-per-key
    via row_number (the engine's answer to Mongo update_one)."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.select("doc_id", F.lit(1).alias("version"), "text")
    v2 = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.lit(2).alias("version"),
        F.concat(F.lit("updated: "), F.substring("text", 1, 40)).alias("text"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("version"))
    return (
        v1.unionByName(v2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- ops 5, 26, 28: download ledger report (index.py:199-212) ---------------

@query(
    "download_report",
    oracle="""
    WITH ledger AS (
        SELECT doc_id, 'http://site.com/f/' || doc_id AS url,
               (doc_id % 7 <> 0) AS ok,
               CASE WHEN doc_id % 7 = 0 THEN 'HTTPError' END AS error
        FROM documents
    )
    SELECT CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok, COUNT(*) AS n_total
    FROM ledger
    """,
)
def download_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'downloaded m / n' report: error rows are data (dead-letter columns),
    not exceptions (index.py:207-212) — aggregate over the ledger."""
    d = load_table(spark, sf_dir, "documents")
    ledger = d.select(
        "doc_id",
        (F.col("doc_id") % 7 != 0).alias("ok"),
        F.when(F.col("doc_id") % 7 == 0, "HTTPError").alias("error"),
    )
    return ledger.agg(
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
        F.count("*").alias("n_total"),
    )


@query(
    "upsert_time_travel",
    oracle="""
    WITH versions AS (
        SELECT doc_id, 1 AS version, text FROM documents
        UNION ALL
        SELECT doc_id, 2 AS version, 'updated: ' || substr(text, 1, 40) AS text
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id, 3 AS version, 'tombstone' AS text
        FROM documents WHERE doc_id % 20 = 0
    ), snapshots AS (SELECT unnest([1, 2, 3]) AS as_of)
    SELECT s.as_of,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN v.version > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_modified,
           CAST(SUM(length(v.text)) AS BIGINT) AS total_chars
    FROM snapshots s
    JOIN (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, sn.as_of2
                                     ORDER BY version DESC) AS rn
        FROM versions, (SELECT unnest([1, 2, 3]) AS as_of2) sn
        WHERE version <= sn.as_of2
    ) v ON v.as_of2 = s.as_of AND v.rn = 1
    WHERE v.text <> 'tombstone'
    GROUP BY s.as_of
    """,
)
def upsert_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the versioned plain-Parquet store — the
    generalization of upsert_latest_wins that the Roadmap maps to Delta's
    `VERSION AS OF`: reconstruct the store's state at EACH historical
    version (latest-wins among rows with version <= as_of, tombstones
    excluded) and report per-snapshot document counts / modified counts /
    content size. Version 3 deletes every 20th doc via a tombstone row, so
    the three snapshots show the store growing THEN shrinking — the audit
    view an append-only versioned store gives for free.

    Scale: the snapshot dimension (3 rows) BROADCASTS onto the version
    log; latest-wins windows partition by (doc_id, as_of) — per-key
    partitions bounded by the version-chain length; one narrow final
    rollup. At a real deployment the version log is partition-pruned by
    version ranges, so an as-of read touches only files with version <=
    as_of (DEPLOY L5's bucketing note applies to the key dimension)."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.select("doc_id", F.lit(1).alias("version"), "text")
    v2 = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.lit(2).alias("version"),
        F.concat(F.lit("updated: "), F.substring("text", 1, 40)).alias("text"),
    )
    v3 = d.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id", F.lit(3).alias("version"), F.lit("tombstone").alias("text")
    )
    versions = v1.unionByName(v2).unionByName(v3)
    snapshots = spark.range(1, 4).select(F.col("id").cast("int").alias("as_of"))
    w = W.partitionBy("doc_id", "as_of").orderBy(F.desc("version"))
    state = (
        versions.join(F.broadcast(snapshots), F.col("version") <= F.col("as_of"))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("text") != "tombstone"))
    )
    return state.groupBy("as_of").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("version") > 1).cast("int")).cast("bigint").alias("n_modified"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )
