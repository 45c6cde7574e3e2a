"""Reproducible sampling / corpus-mixing queries.

Training-data pipelines need samples that are (a) reproducible across runs
and engines, (b) stratified per source, (c) weight-mixable. RNG-based
``df.sample`` is engine-specific; the engine's canonical sampling primitive
is hash-ordering: rank rows by md5(key) within a stratum and keep the top
n — a uniform pseudo-random but fully deterministic choice that any engine
reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql
from ..tables import load_table
from .registry import query


@query(
    "stratified_sample_per_source",
    oracle="""
    SELECT source, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
)
def stratified_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 docs per source, chosen by hash order — reproducible
    stratified sampling (the rank shuffles only (source, hash))."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars")
    )


@query(
    "weighted_corpus_mix",
    oracle="""
    WITH ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT lang, doc_id FROM ranked
    WHERE rn <= CAST(ceil(n_lang * CASE lang WHEN 'en' THEN 0.8
                                             WHEN 'de' THEN 0.5
                                             ELSE 0.2 END) AS BIGINT)
    """,
)
def weighted_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling: keep 80% of English, 50% of German, 20% of the
    rest — per-language quotas filled in hash order (deterministic data
    mixing for training-corpus composition)."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    wl = W.partitionBy("lang")
    quota = F.ceil(
        F.count(F.lit(1)).over(wl)
        * F.when(F.col("lang") == "en", 0.8).when(F.col("lang") == "de", 0.5).otherwise(0.2)
    ).cast("bigint")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("quota", quota)
        .filter(F.col("rn") <= F.col("quota"))
        .select("lang", "doc_id")
    )


@query("bernoulli_sample_stats", oracle=None)
def bernoulli_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native seeded Bernoulli sample (df.sample) — rows-only (RNG
    streams are engine-specific); tests pin determinism-under-seed and the
    sampling fraction tolerance."""
    d = load_table(spark, sf_dir, "documents")
    s = d.sample(fraction=0.2, seed=42)
    return s.groupBy("lang").agg(F.count("*").alias("n_sampled"))


@query(
    "token_budget_apportionment",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(SUM(len({tokenize_sql('text')})) AS BIGINT) AS tokens
        FROM documents WHERE text IS NOT NULL GROUP BY source
    ), tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM counts),
    q AS (
        SELECT source, tokens,
               (1000000 * tokens) // total AS qf,
               (1000000 * tokens) % total AS rem
        FROM counts CROSS JOIN tot
    ), s AS (SELECT CAST(1000000 - SUM(qf) AS BIGINT) AS leftover FROM q)
    SELECT source, tokens,
           CAST(qf + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                               <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM q CROSS JOIN s
    """,
)
def token_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apportion a 1M-token training budget across sources proportionally
    to their token mass with the largest-remainder (Hamilton) method: each
    source gets floor(budget * tokens / total), and the leftover seats go
    to the largest fractional remainders (tie-break source asc). Quotas are
    exact integers that sum to the budget exactly — the materialized
    sampling plan a mixture loader executes, with no float weights to
    drift. (source_mixture_weights is the temperature-weighted float
    cousin; this is the exact-integer contract.)

    Scale: per-source token counts are a partial+final agg over per-doc
    token sizes (no explode); everything after operates on the per-source
    frame — bounded by the source-catalog domain (tens to thousands of
    rows), so the remainder ranking's unpartitioned window is over that
    tiny post-agg frame, the monthly_revenue_running precedent, never over
    corpus-sized data. All arithmetic is int64 (budget*tokens at 100 TB:
    1e6 * ~1e13 overflows int64 — at that mass switch the multiply to
    DECIMAL(38,0); documented here so the cap is explicit)."""
    budget = 1_000_000
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counts = (
        d.select("source", F.size(tokenize("text")).alias("__n"))
        .groupBy("source")
        .agg(F.sum("__n").cast("bigint").alias("tokens"))
    )
    tot = counts.agg(F.sum("tokens").cast("bigint").alias("total"))
    q = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        F.expr(f"({budget} * tokens) DIV total").alias("__qf"),
        ((F.lit(budget) * F.col("tokens")) % F.col("total")).alias("__rem"),
    )
    leftover = q.agg((F.lit(budget) - F.sum("__qf")).cast("bigint").alias("leftover"))
    w = W.orderBy(F.desc("__rem"), F.asc("source"))
    return (
        q.crossJoin(F.broadcast(leftover))
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "source",
            "tokens",
            (
                F.col("__qf")
                + F.when(F.col("__rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("bigint").alias("quota"),
        )
    )


@query(
    "stratified_kfold_counts",
    oracle="""
    WITH assigned AS (
        SELECT source,
               CAST((ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                     - 1) % 5 AS INT) AS fold
        FROM documents
    )
    SELECT source, fold, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned GROUP BY source, fold
    """,
)
def stratified_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold cross-validation assignment (k=5): within each
    source stratum, documents are ordered by a deterministic hash
    (md5 of the id — pseudorandom but reproducible anywhere, the
    engine-wide hash-order sampling discipline) and dealt round-robin
    into folds, so every (stratum, fold) cell is balanced to within one
    document BY CONSTRUCTION — the property the test pins, and what
    hash_split_assignment's independent Bernoulli-style split cannot
    guarantee. Emitted as the (source, fold) count matrix an evaluation
    harness consumes.

    Scale: one window per source stratum (bounded by stratum size) and a
    tiny rollup; the md5 order key is computed in the scan projection."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    assigned = d.select(
        "source",
        ((F.row_number().over(w) - 1) % 5).cast("int").alias("fold"),
    )
    return assigned.groupBy("source", "fold").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


# Efraimidis–Spirakis A-Res key: u = (h + 1) / 2^60 from a 60-bit md5
# hash (u in (0, 1], never ln(0)), key = ln(u) / w — taking the LARGEST
# keys is exactly weighted sampling without replacement with inclusion
# probability proportional to w. One shared IEEE tree over the exact
# int hash; trunc toward zero on both engines (key is negative: Spark
# CAST and DuckDB trunc() both go toward zero).
_ES_KEY = (
    "ln((CAST({h} AS DOUBLE) + 1) / 1152921504606846976)"
    " / CAST(n_chars AS DOUBLE) * 1e9"
)
_ES_KEY_DUCK = _ES_KEY.format(
    h="CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)
_ES_KEY_SPARK = _ES_KEY.format(
    h="CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT)"
)


@query(
    "weighted_priority_sample",
    oracle=f"""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(trunc({_ES_KEY_DUCK}) AS BIGINT) AS key_e9
    FROM documents
    WHERE n_chars > 0
    ORDER BY key_e9 DESC, doc_id
    LIMIT 200
    """,
)
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample (Efraimidis-Spirakis A-Res) of 200
    documents with inclusion probability proportional to document length —
    the deterministic weighted companion to `priority_sample_docs`
    (uniform) and `weighted_corpus_mix` (quota-based): longer documents
    are proportionally more likely to win, yet the draw is a pure
    function of doc_id, so it is reproducible across engines, runs, and
    partitionings.

    The per-row key is ln(u)/w with u derived from a 60-bit md5 hash —
    no RNG state, no driver coordination; taking the top-k keys IS the
    weighted sample (Efraimidis & Spirakis 2006). Scale: one fact-sized
    projection (codegen: md5 + ln per row) followed by
    TakeOrderedAndProject — per-partition top-200 then a 200-row merge
    on the driver, never a global sort. Keys are trunc-scaled to int64
    with doc_id tiebreak, so the boundary is exact cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.expr(_ES_KEY_SPARK).cast("bigint").alias("key_e9"),
        )
        .orderBy(F.desc("key_e9"), "doc_id")
        .limit(200)
    )


# --- purged / embargoed time-series split ----------------------------------
_EMB_CUTOFF = "DATE '2000-06-01'"
_EMB_DAYS = 30


@query(
    "embargo_split_report",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ), test AS (
        SELECT o_custkey, d AS td FROM base WHERE d >= {_EMB_CUTOFF}
    ), arms AS (
        SELECT 'embargo30' AS arm,
               {_EMB_CUTOFF} - INTERVAL {_EMB_DAYS} DAY AS train_end
        UNION ALL
        SELECT 'naive', {_EMB_CUTOFF}
    ), tr AS (
        SELECT a.arm, b.o_custkey, b.d
        FROM arms a JOIN base b ON b.d < a.train_end
    ), stats AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_train FROM tr GROUP BY arm
    ), dropped AS (
        SELECT a.arm, CAST(COUNT(b.d) AS BIGINT) AS n_dropped
        FROM arms a LEFT JOIN base b
          ON b.d >= a.train_end AND b.d < {_EMB_CUTOFF}
        GROUP BY a.arm
    ), leaky AS (
        SELECT t.arm, CAST(COUNT(*) AS BIGINT) AS n_leaky_pairs
        FROM tr t JOIN test s
          ON s.o_custkey = t.o_custkey
         AND s.td <= t.d + INTERVAL {_EMB_DAYS} DAY
        GROUP BY t.arm
    )
    SELECT s.arm, s.n_train,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM test) AS n_test,
           d.n_dropped,
           COALESCE(l.n_leaky_pairs, 0) AS n_leaky_pairs
    FROM stats s
    JOIN dropped d ON d.arm = s.arm
    LEFT JOIN leaky l ON l.arm = s.arm
    ORDER BY s.arm
    """,
)
def embargo_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged/embargoed time-series split (the Lopez de Prado backtest
    discipline) vs the naive temporal split, as checked data: train ends
    either AT the cutoff (naive) or an embargo window before it; a
    'leaky pair' is a same-customer train order within the embargo
    horizon of a test order — the serially-correlated neighbor a naive
    split lets the model memorize. Emits, per arm, the split sizes, the
    rows the embargo sacrifices, and the realized leaky-pair count — the
    embargo arm's count must be ZERO by construction (train ends 30 days
    early and leakage reaches exactly 30 days), which the value gate and
    a test both pin; the naive arm's nonzero count is the measured
    leakage a 'just split by date' pipeline silently trains on.

    Scale: one fact scan fanned across the 2-row broadcast arm spine
    (literal-bounded nested loop, the audited allowed shape); the leaky
    join is a narrow equi-join on the customer key with per-customer
    fan-out bounded by order frequency within a 30-day horizon; output
    is 2 rows."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
    cutoff = F.expr(_EMB_CUTOFF)
    test = base.filter(F.col("d") >= cutoff).select(
        F.col("o_custkey"), F.col("d").alias("td")
    )
    arms = spark.range(1).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("embargo30").alias("arm"),
                    F.expr(
                        f"{_EMB_CUTOFF} - INTERVAL {_EMB_DAYS} DAY"
                    ).cast("date").alias("train_end"),
                ),
                F.struct(
                    F.lit("naive").alias("arm"),
                    F.expr(_EMB_CUTOFF).cast("date").alias("train_end"),
                ),
            )
        ).alias("a")
    ).select("a.arm", "a.train_end")
    tr = base.crossJoin(F.broadcast(arms)).filter(F.col("d") < F.col("train_end"))
    stats = tr.groupBy("arm").agg(F.count("*").cast("bigint").alias("n_train"))
    dropped = (
        base.crossJoin(F.broadcast(arms))
        .groupBy("arm")
        .agg(
            F.sum(
                F.when(
                    (F.col("d") >= F.col("train_end")) & (F.col("d") < cutoff), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dropped")
        )
    )
    leaky = (
        tr.join(test, "o_custkey")
        .filter(F.col("td") <= F.date_add(F.col("d"), _EMB_DAYS))
        .groupBy("arm")
        .agg(F.count("*").cast("bigint").alias("n_leaky_pairs"))
    )
    n_test = test.agg(F.count("*").cast("bigint").alias("n_test"))
    return (
        stats.join(dropped, "arm")
        .crossJoin(F.broadcast(n_test))
        .join(leaky, "arm", "left")
        .select(
            "arm",
            "n_train",
            "n_test",
            "n_dropped",
            F.coalesce("n_leaky_pairs", F.lit(0)).cast("bigint").alias(
                "n_leaky_pairs"
            ),
        )
        .orderBy("arm")
    )


# --- popularity-weighted negative sampling ---------------------------------
_NEG_SLICES = 8
_NEG_K = 4
_NEG_KEY = (
    "ln((CAST({h} AS DOUBLE) + 1) / 1152921504606846976)"
    " / CAST(pop AS DOUBLE) * 1e9"
)
_NEG_H_DUCK = (
    "CAST(('0x' || substring(md5(CAST(usr AS VARCHAR) || ':' ||"
    " CAST(item AS VARCHAR)), 1, 15)) AS BIGINT)"
)
_NEG_H_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(usr AS STRING), ':',"
    " CAST(item AS STRING))), 1, 15), 16, 10) AS BIGINT)"
)


@query(
    "negative_sampling_report",
    oracle=f"""
    WITH inter AS (
        SELECT DISTINCT o_custkey AS usr, l_partkey AS item
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), items AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS pop,
               CAST(('0x' || substring(md5(CAST(item AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_NEG_SLICES} AS islice
        FROM inter GROUP BY item
    ), quart AS (
        SELECT item, pop, islice,
               CAST(ntile(4) OVER (ORDER BY pop, item) AS INT) AS quartile
        FROM items
    ), users AS (
        SELECT usr,
               CAST(('0x' || substring(md5(CAST(usr AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_NEG_SLICES} AS uslice
        FROM (SELECT DISTINCT usr FROM inter)
    ), cand AS (
        SELECT u.usr, q.item, q.pop, q.quartile
        FROM users u JOIN quart q ON q.islice = u.uslice
        WHERE NOT EXISTS (SELECT 1 FROM inter i
                          WHERE i.usr = u.usr AND i.item = q.item)
    ), keyed AS (
        SELECT usr, item, quartile,
               CAST(trunc({_NEG_KEY.format(h=_NEG_H_DUCK)}) AS BIGINT) AS key_e9
        FROM cand
    ), picked AS (
        SELECT usr, item, quartile FROM (
            SELECT usr, item, quartile,
                   ROW_NUMBER() OVER (PARTITION BY usr
                                      ORDER BY key_e9 DESC, item) AS rn
            FROM keyed) WHERE rn <= {_NEG_K}
    )
    SELECT q.quartile,
           CAST(COUNT(DISTINCT q.item) AS BIGINT) AS n_items,
           CAST(COUNT(p.item) AS BIGINT) AS n_sampled
    FROM quart q LEFT JOIN picked p ON p.quartile = q.quartile
                                   AND p.item = q.item
    GROUP BY q.quartile
    ORDER BY q.quartile
    """,
)
def negative_sampling_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity-weighted negative sampling for contrastive training
    (word2vec / two-tower recsys): each user draws {_NEG_K} non-
    interacted items with inclusion probability proportional to item
    popularity (the A-Res key of `weighted_priority_sample`, keyed on
    (user, item)), from a deterministic 1/{_NEG_SLICES} catalog slice —
    the sharded-negatives trick that keeps per-user candidate cost
    CONSTANT as the catalog grows (production scales the slice count
    with the catalog; in-batch negatives shard the same way). The
    companion to `hard_negative_mining` (similarity-ranked) on the
    random-negatives side. Output: items and sampled counts per
    popularity quartile — the popularity-bias readout that decides the
    weighting exponent before a training run.

    Exactness: pure integer/md5 derivations plus the shared-IEEE A-Res
    key (trunc-scaled int64); quartiles are ntile over the item
    dimension; one LEFT JOIN aggregation emits 4 rows.

    Scale: candidate generation is users x catalog/slices via an
    equi-join on the slice id (never users x catalog); positives drop
    out with a narrow (user, item) anti-join; the per-user top-k window
    partitions on the user key. Every frame is dimension- or
    slice-bounded."""
    from ..operators.ranking import scalable_ntile

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    inter = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("usr"), F.col("l_partkey").alias("item"))
        .distinct()
        .localCheckpoint()
    )
    slice_of = lambda c: (
        F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % _NEG_SLICES
    )
    items = inter.groupBy("item").agg(F.count("*").cast("bigint").alias("pop"))
    quart = scalable_ntile(
        items.withColumn("islice", slice_of("item")),
        4,
        [F.asc("pop"), F.asc("item")],
        tile_col="quartile",
    )
    users = inter.select("usr").distinct().withColumn("uslice", slice_of("usr"))
    cand = users.join(
        quart, quart.islice == users.uslice
    ).join(inter, ["usr", "item"], "left_anti")
    keyed = cand.select(
        "usr",
        "item",
        "quartile",
        F.expr(_NEG_KEY.format(h=_NEG_H_SPARK)).cast("bigint").alias("key_e9"),
    )
    w = W.partitionBy("usr").orderBy(F.desc("key_e9"), F.asc("item"))
    picked = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _NEG_K)
        .select("item", "quartile")
    )
    return (
        quart.select("quartile", "item")
        .join(picked.withColumnRenamed("quartile", "pq"), "item", "left")
        .groupBy("quartile")
        .agg(
            F.count_distinct("item").cast("bigint").alias("n_items"),
            F.count("pq").cast("bigint").alias("n_sampled"),
        )
        .orderBy("quartile")
    )
