"""Keyword full-text search — the reference system's core query.

Reference: Mongo ``$text`` search over the ``text`` field (api.py:22-26),
semantics pinned by its API tests (api-test:45-60): tokenized,
case-insensitive, OR across query terms; unknown token -> empty result (not
an error, api-test:40-43). Stemming is a documented deviation (Mongo's
analyzer-dependent stemming is not reproduced; the reference tests only
exercise exact-token match).

Two execution strategies:
- ``keyword_search``: brute-force tokenize + ``arrays_overlap`` scan.
  Catalyst-native, whole-stage codegen, perfect at test scale.
- ``build_inverted_index`` + ``indexed_keyword_search``: the 100 TB path —
  materialize ``(token, doc_id)`` once at ingest (replacing Mongo's text
  index, which the reference re-creates per request, api.py:22), then a
  keyword query becomes a semi-join: probe the index on the (few) query
  tokens, distinct doc_ids, join back to the corpus. With the index table
  partitioned/bucketed by token, the probe is a pruned scan, not a full
  corpus pass.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import s_stem_py, tokenize, tokenize_stemmed


def query_tokens(keyword: str) -> list[str]:
    """Tokenize the query string driver-side (same rules as the data side).

    The data side splits on ``[^\\p{L}\\p{N}]+`` — underscore is a
    SEPARATOR there. ``[\\W_]+`` reproduces that in Python (``\\W`` alone
    would keep '_' inside tokens, producing query tokens like 'foo_bar'
    that can never match any data token)."""
    return [t for t in re.split(r"[\W_]+", keyword.lower(), flags=re.UNICODE) if t]


def keyword_search(df: DataFrame, keyword: str, text_col: str = "text") -> DataFrame:
    """Rows whose ``text_col`` contains any query token (OR semantics).

    A token match implies a substring match, so a cheap ``contains`` guard
    runs first: it's a simple predicate (pushable to the scan / evaluated in
    codegen) that short-circuits the expensive tokenize+overlap filter for
    the vast majority of non-matching rows.
    """
    toks = query_tokens(keyword)
    if not toks:
        return df.limit(0)
    guard = F.lower(F.col(text_col)).contains(toks[0])
    for t in toks[1:]:
        guard = guard | F.lower(F.col(text_col)).contains(t)
    return df.filter(guard).filter(
        F.arrays_overlap(tokenize(text_col), F.array(*[F.lit(t) for t in toks]))
    )


def keyword_search_stemmed(df: DataFrame, keyword: str, text_col: str = "text") -> DataFrame:
    """Stemmed keyword search: S-stem both the query tokens and the data
    tokens, then OR-overlap — analyzer parity with Mongo ``$text``'s English
    stemming (the one semantic the plain :func:`keyword_search` documents as
    a deviation; reference api.py:22-26). 'queries joins' matches documents
    containing 'query' or 'join'.

    No ``contains`` pre-guard here: a stem ('fly' from 'flies') need not be
    a substring of the original text, so the guard would drop true hits.
    """
    toks = sorted({s_stem_py(t) for t in query_tokens(keyword)})
    if not toks:
        return df.limit(0)
    return df.filter(
        F.arrays_overlap(tokenize_stemmed(text_col), F.array(*[F.lit(t) for t in toks]))
    )


def keyword_search_folded(df: DataFrame, keyword: str, text_col: str = "text") -> DataFrame:
    """Diacritic-insensitive keyword search: fold accents on both the query
    tokens (driver-side) and the data tokens, then OR-overlap — the second
    half of Mongo ``$text`` analyzer parity ($text is diacritic-insensitive
    by default; s_stem covers the stemming half). 'cafe' matches 'café' and
    vice versa. No ``contains`` pre-guard: the folded token need not be a
    substring of the raw text."""
    from ..functions.text import fold_accents_py, tokenize_folded

    toks = sorted({fold_accents_py(t) for t in query_tokens(keyword)})
    if not toks:
        return df.limit(0)
    return df.filter(
        F.arrays_overlap(tokenize_folded(text_col), F.array(*[F.lit(t) for t in toks]))
    )


def build_inverted_index(
    df: DataFrame, key_col: str, text_col: str = "text", stemmed: bool = False
) -> DataFrame:
    """(token, key) posting table: explode distinct tokens per document.

    ``stemmed=True`` builds the analyzer-parity posting list (S-stemmed
    tokens — the ingest-time twin of :func:`keyword_search_stemmed`, so the
    per-query cost of stemming is zero at scale). Probe it with stemmed
    query tokens.

    At scale: write partitioned/bucketed by ``token`` so a keyword probe
    prunes to the query tokens' buckets.
    """
    toks = tokenize_stemmed(text_col) if stemmed else tokenize(text_col)
    return df.select(
        F.col(key_col), F.explode(F.array_distinct(toks)).alias("token")
    )


def _token_bucket(token) -> "F.Column":
    """Partition key for the posting table: the token's first character
    (letters/digits), '_' otherwise. Driver-computable for pruning."""
    first = F.substring(token, 1, 1)
    return F.when(first.rlike("[a-z0-9]"), first).otherwise(F.lit("_"))


def materialize_inverted_index(
    df: DataFrame, key_col: str, path: str, text_col: str = "text", stemmed: bool = False
) -> None:
    """Persist the posting table partitioned by token prefix.

    This replaces the reference's per-request index creation (api.py:22)
    with ingest-time materialization. A keyword probe then reads only the
    query tokens' partitions — partition pruning does the work of Mongo's
    B-tree walk. Incremental ingest appends to the same layout.
    ``stemmed=True`` persists the analyzer-parity (S-stemmed) layout.
    """
    (
        build_inverted_index(df, key_col, text_col, stemmed=stemmed)
        .withColumn("bucket", _token_bucket(F.col("token")))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def append_to_inverted_index(
    df: DataFrame, key_col: str, path: str, text_col: str = "text"
) -> None:
    """Incremental index maintenance: append postings for newly ingested
    documents into the same partition layout (REFRESH semantics for op 14's
    index — the reference recreated its index per request, api.py:22)."""
    (
        build_inverted_index(df, key_col, text_col)
        .withColumn("bucket", _token_bucket(F.col("token")))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path)
    )


def search_with_materialized_index(
    spark, df: DataFrame, index_path: str, key_col: str, keyword: str,
    stemmed: bool = False,
) -> DataFrame:
    """Probe the persisted index: partition pruning on the token prefix +
    token equality (both pushed to the scan) -> distinct keys -> broadcast
    semi-join back to the corpus. ``stemmed=True`` stems the query tokens
    to probe a ``stemmed=True``-materialized layout."""
    toks = query_tokens(keyword)
    if stemmed:
        toks = sorted({s_stem_py(t) for t in toks})
    if not toks:
        return df.limit(0)
    # EXACTLY the column-side _token_bucket rule: ASCII [a-z0-9] keeps its
    # first char, everything else (incl. non-ASCII letters: 'über', '日本')
    # buckets under '_'. Python's Unicode-aware isalnum() here would probe
    # bucket 'ü' while the postings live under '_' — silent zero hits.
    prefixes = sorted(
        {t[0] if t[0] in "0123456789abcdefghijklmnopqrstuvwxyz" else "_" for t in toks}
    )
    index = spark.read.parquet(index_path)
    hits = (
        index.filter(F.col("bucket").isin(prefixes) & F.col("token").isin(toks))
        .select(key_col)
        .distinct()
    )
    return df.join(F.broadcast(hits), key_col, "left_semi")


def indexed_keyword_search(df: DataFrame, index: DataFrame, key_col: str, keyword: str) -> DataFrame:
    """Semi-join search: probe the posting table, join back to the corpus.

    The probe side after ``distinct`` is tiny (bounded by matching doc
    count), so Catalyst/AQE broadcasts it — no full-corpus tokenize pass.
    """
    toks = query_tokens(keyword)
    if not toks:
        return df.limit(0)
    hits = index.filter(F.col("token").isin(toks)).select(key_col).distinct()
    return df.join(F.broadcast(hits), key_col, "left_semi")


def materialize_bm25_index(
    df: DataFrame, key_col: str, path: str, text_col: str = "text"
) -> None:
    """Persist the BM25-scored posting layout (DEPLOY.md L2 + the
    'BM25 per-doc lengths' entry of the ingest-time materialization list):

    - ``postings/``: one ``(token, key, tf, dl)`` row per (document, token),
      partitioned by token first-char bucket and sorted by token within
      partitions — a probe prunes to the query tokens' partitions and
      row-groups exactly like the plain keyword index.
    - ``stats/``: ONE row ``(n_docs, avgdl)`` — the corpus scalars BM25
      needs, computed once at ingest instead of a full corpus pass per
      query (the cost `bm25_rank` pays self-contained).

    df-per-token is NOT persisted: it is derivable exactly from the pruned
    probe output (distinct keys per probed token), so it stays correct
    under `append`-style incremental ingest of new documents without a
    stats rebuild; only the tiny stats row needs refreshing on ingest.
    """
    import os as _os

    with_dl = df.select(F.col(key_col), tokenize(text_col).alias("__toks")).withColumn(
        "dl", F.size("__toks")
    )
    tf = (
        with_dl.select(F.col(key_col), "dl", F.explode("__toks").alias("token"))
        .groupBy(key_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    (
        tf.withColumn("bucket", _token_bucket(F.col("token")))
        .repartition("bucket")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(_os.path.join(path, "postings"))
    )
    (
        with_dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
        .write.mode("overwrite")
        .parquet(_os.path.join(path, "stats"))
    )


def bm25_rank_from_index(
    spark,
    index_path: str,
    keyword: str,
    key_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over the persisted posting layout — the production read path.

    Candidate generation is the pruned index probe (`PartitionFilters` on
    the token bucket + `PushedFilters EqualTo(token, ...)`, exactly like
    `search_with_materialized_index`); tf and dl ride the probed rows, df
    is an exact aggregate OF the probed rows, and (n_docs, avgdl) is the
    one-row stats table — so the whole query touches only the query
    tokens' postings, never the corpus. Scores are identical to
    :func:`bm25_rank` (same formula, same doubles).
    """
    import os as _os

    toks = query_tokens(keyword)
    if not toks:
        return spark.range(0).select(
            F.col("id").alias(key_col), F.lit(0.0).alias("bm25")
        )
    prefixes = sorted(
        {t[0] if t[0] in "0123456789abcdefghijklmnopqrstuvwxyz" else "_" for t in toks}
    )
    postings = spark.read.parquet(_os.path.join(index_path, "postings")).filter(
        F.col("bucket").isin(prefixes) & F.col("token").isin(toks)
    )
    stats = spark.read.parquet(_os.path.join(index_path, "stats"))
    # the layout holds exactly ONE row per (document, token) — see
    # materialize_bm25_index's groupBy — so count(*) IS the distinct doc
    # frequency, without countDistinct's two-phase expand over the probe
    dfreq = postings.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        postings.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(key_col)
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(key_col))
        .limit(k)
    )


def bm25_batch_rank_from_index(
    spark,
    index_path: str,
    keywords: list[str],
    key_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batched BM25 over the persisted posting layout: N keyword queries
    share ONE pruned index probe — the serving shape of a search service
    (or a bulk offline relevance-labeling stage), where per-query cost
    must amortize to probe/|batch|.

    The probe covers the UNION of all queries' tokens (still planning
    metadata: PartitionFilters on the token buckets + token IN (...) at
    the scan); per-token df/idf and per-(doc, token) term scores are
    computed ONCE from the probed rows and shared across queries; a
    broadcast (qid, token) map then fans each term score out to exactly
    the queries containing that token, and the per-query top-k is a
    window PARTITIONED BY qid. Scores are bit-identical to N separate
    :func:`bm25_rank_from_index` calls (same formula, same doubles).
    Returns (qid, key, bm25, rk)."""
    import os as _os

    # dedupe tokens WITHIN each query (order-preserving): the single-query
    # path scores each posting row once regardless of how many times the
    # keyword repeats a token, so a duplicate (qid, token) row here would
    # double-count term_score and break the bit-identical claim (ADVICE r8)
    qmap_rows = [
        (qid, t)
        for qid, kw in enumerate(keywords)
        for t in dict.fromkeys(query_tokens(kw))
    ]
    toks = sorted({t for _, t in qmap_rows})
    if not toks:
        return spark.range(0).select(
            F.col("id").cast("int").alias("qid"),
            F.col("id").alias(key_col),
            F.lit(0.0).alias("bm25"),
            F.col("id").cast("int").alias("rk"),
        )
    prefixes = sorted(
        {t[0] if t[0] in "0123456789abcdefghijklmnopqrstuvwxyz" else "_" for t in toks}
    )
    postings = spark.read.parquet(_os.path.join(index_path, "postings")).filter(
        F.col("bucket").isin(prefixes) & F.col("token").isin(toks)
    )
    stats = spark.read.parquet(_os.path.join(index_path, "stats"))
    # one row per (doc, token) in the layout => count(*) IS the doc freq
    dfreq = postings.groupBy("token").agg(F.count("*").alias("df"))
    term = (
        postings.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    qmap = spark.createDataFrame(qmap_rows, "qid int, token string")
    scored = (
        term.join(F.broadcast(qmap), "token")
        .groupBy("qid", key_col)
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("qid").orderBy(F.desc("bm25"), F.asc(key_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", key_col, "bm25", "rk")
    )


def bm25_rank(
    df: DataFrame,
    key_col: str,
    keyword: str,
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked keyword search (the relevance upgrade over the
    reference's unordered Mongo cursor, api.py:26-35).

    Plan shape: explode tokens once -> per-(doc, token) tf for query tokens
    only -> join tiny (token, df) and scalar (N, avgdl) aggregates, both
    broadcast -> score + top-k. Scale: the posting explode is the same work
    as index construction; everything after operates on matched rows only.
    """
    toks = query_tokens(keyword)
    if not toks:
        return df.limit(0)

    # doc length is a per-row array size — never explode the full corpus
    # just to count it (the explode+groupBy costs a corpus-sized shuffle);
    # and filter the token array BEFORE explode so only query-token
    # occurrences generate rows (~|toks|/|vocab| of the corpus).
    with_dl = df.select(F.col(key_col), tokenize(text_col).alias("__toks")).withColumn(
        "dl", F.size("__toks")
    )
    # pin the two with_dl projections: doc_len (two int columns per doc)
    # and the match-bounded tf — un-pinned, corpus stats / dfreq /
    # doc_len_matched each re-ran the tokenize scan (the plan is a tree;
    # 5 scans measured). Materializing 16-byte doc rows once beats
    # re-tokenizing the corpus per branch; the production path is
    # bm25_rank_from_index, which stores these tables outright.
    # Executor-loss caveat: localCheckpoint blocks are non-replicated and
    # non-recomputable — see dedup.lsh_candidate_pairs's availability
    # note for the multi-executor alternative (persist + action).
    doc_len = with_dl.select(key_col, "dl").localCheckpoint()
    corpus = doc_len.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))

    matched = with_dl.select(
        F.col(key_col),
        F.explode(F.filter("__toks", lambda t: t.isin(toks))).alias("token"),
    )
    tf = matched.groupBy(key_col, "token").agg(F.count("*").alias("tf")).localCheckpoint()
    dfreq = tf.groupBy("token").agg(F.countDistinct(key_col).alias("df"))

    # restrict doc lengths to MATCHED docs before joining: unrestricted,
    # Catalyst broadcasts the corpus-sized doc_len on local size estimates
    # (the SCALE.md estimate trap) — semi-joined it is match-bounded at any
    # scale. No broadcast hint on the matched-id side: a high-df query token
    # makes the matched set itself corpus-scale, so forcing the broadcast
    # reintroduces the OOM hazard; AQE picks broadcast when the runtime size
    # is actually small (round-2 advice).
    doc_len_matched = doc_len.join(tf.select(key_col).distinct(), key_col, "left_semi")

    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(doc_len_matched, key_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(key_col)
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(key_col))
        .limit(k)
    )


def tfidf_rank(
    df: DataFrame,
    key_col: str,
    keyword: str,
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """TF-IDF-ranked keyword search: score = Σ_t (tf_t / dl) · idf_t with
    the smoothed idf = ln((1+N)/(1+df_t)) + 1 (sklearn's convention — no
    division-by-zero, never negative). The linear sibling of bm25_rank
    (same plan shape: one token explode, tiny broadcast aggregates, top-k);
    BM25 saturates tf, TF-IDF stays proportional.
    """
    toks = query_tokens(keyword)
    if not toks:
        return df.limit(0)

    # same no-full-explode shape as bm25_rank: per-row dl, pre-filtered
    # token explode
    with_dl = df.select(F.col(key_col), tokenize(text_col).alias("__toks")).withColumn(
        "dl", F.size("__toks")
    )
    # same doc_len/tf pins as bm25_rank (tree re-tokenization)
    doc_len = with_dl.select(key_col, "dl").localCheckpoint()
    corpus = doc_len.agg(F.count("*").alias("n_docs"))

    matched = with_dl.select(
        F.col(key_col),
        F.explode(F.filter("__toks", lambda t: t.isin(toks))).alias("token"),
    )
    tf = matched.groupBy(key_col, "token").agg(F.count("*").alias("tf")).localCheckpoint()
    dfreq = tf.groupBy("token").agg(F.countDistinct(key_col).alias("df"))

    # match-bounded doc lengths, no forced broadcast (same rationale as
    # bm25_rank: the matched set is unbounded for high-df tokens; let AQE
    # decide from the runtime size)
    doc_len_matched = doc_len.join(tf.select(key_col).distinct(), key_col, "left_semi")

    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(doc_len_matched, key_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "term_score",
            (F.col("tf") / F.col("dl"))
            * (F.log((1 + F.col("n_docs")) / (1 + F.col("df"))) + 1.0),
        )
    )
    return (
        scored.groupBy(key_col)
        .agg(F.round(F.sum("term_score"), 6).alias("tfidf"))
        .orderBy(F.desc("tfidf"), F.asc(key_col))
        .limit(k)
    )


def keyword_search_analyzed(df: DataFrame, keyword: str, text_col: str = "text") -> DataFrame:
    """Full-analyzer keyword search: diacritic folding + S-stemming on both
    sides (the composition of :func:`keyword_search_folded` and
    :func:`keyword_search_stemmed`) — complete Mongo ``$text`` analyzer
    parity in one predicate. 'cafés' matches 'cafe', 'CAFÉ', 'cafes'."""
    from ..functions.text import analyze_token_py, tokenize_analyzed

    toks = sorted({analyze_token_py(t) for t in query_tokens(keyword)})
    if not toks:
        return df.limit(0)
    return df.filter(
        F.arrays_overlap(tokenize_analyzed(text_col), F.array(*[F.lit(t) for t in toks]))
    )


def phrase_search(
    df: DataFrame, key_col: str, phrase: str, text_col: str = "text"
) -> DataFrame:
    """Exact-phrase search via a positional posting join: documents where
    the phrase's tokens occur CONSECUTIVELY, with the match count per
    document — Mongo $text (the reference's search, api.py:22-26) treats a
    quoted string as a phrase; this is that semantic, engine-side.

    The positional posting table (key, pos, token) is filtered to each
    query token BEFORE any join — at scale the postings live in the
    token-bucketed L2 index layout (materialize_inverted_index), so each
    filter is a partition-pruned probe, and the n-1 self-joins are
    equi-joins on (key, pos+i) over only the probed slices (selectivity
    of the rarest token bounds all of them). No window, no cartesian.
    """
    toks = query_tokens(phrase)
    if not toks:
        return df.limit(0).select(
            F.col(key_col), F.lit(0).cast("bigint").alias("n_occurrences")
        )
    postings = df.select(
        F.col(key_col), F.posexplode(tokenize(text_col)).alias("pos", "token")
    )
    anchor = (
        postings.filter(F.col("token") == toks[0])
        .select(key_col, F.col("pos").alias("p0"))
    )
    for i, t in enumerate(toks[1:], start=1):
        nxt = postings.filter(F.col("token") == t).select(
            F.col(key_col), (F.col("pos") - i).alias("p0")
        )
        anchor = anchor.join(nxt, [key_col, "p0"])
    return anchor.groupBy(key_col).agg(F.count("*").alias("n_occurrences"))
