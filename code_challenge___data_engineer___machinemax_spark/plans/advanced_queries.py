"""Advanced relational shapes + training-data pipeline extensions.

Relational: correlated EXISTS (TPC-H Q4 shape), correlated scalar subquery
decorrelated to agg+join (Q17 shape), group-HAVING semi join (Q18 shape),
conditional-aggregation ratios (Q12/Q14 shapes), interval range join,
full-outer reconciliation, min_by/max_by.

Training-data ops (north-star surface, SURVEY.md §2.4): fixed-size token
chunking with stride, PII scrubbing, n-gram benchmark-contamination check.

These generalize the reference's filter/count surface (index.py:130-131,
index.py:144,199-212; api.py:22-26) to the query shapes a 100 TB training-
data pipeline actually runs. Every query here is DuckDB-oracle-checked.

Determinism notes (see also relational.py): money sums accumulate in
DECIMAL; derived float ratios are emitted as trunc-scaled BIGINTs (round()
halves diverge across engines); min_by/max_by ordering keys are fixed-width
strings because composite (struct) ordering keys aren't portable to DuckDB
arg_max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql
from ..tables import load_table
from .registry import query


def _dsum(col) -> F.Column:
    return F.sum(col.cast("decimal(20,4)")).cast("double")


# ---------------------------------------------------------------------------
# Correlated subquery shapes
# ---------------------------------------------------------------------------

@query(
    "orders_with_late_lineitems",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def orders_with_late_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi correlation
    predicate (any lineitem shipped after the order date), decorrelated to a
    left-semi join.

    Scale: the semi join shuffles only (orderkey, date) pairs, never payload
    columns; the date filter prunes orders at the scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "below_avg_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS low_qty_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE l_quantity < 0.5::DOUBLE * avg_qty
    GROUP BY p_brand
    """,
)
def below_avg_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + self-join; revenue of lines
    ordering below half their part's average.

    Scale: the per-part agg and the probe shuffle on the same key
    (l_partkey) so AQE can co-locate them; `part` broadcasts. The 0.5 factor
    is exact in binary, so the comparison is bit-identical cross-engine.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_avg = (
        l.groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg((_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"))
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        # part_avg is dim-bounded (one row per part) — broadcast it like
        # `part` itself; without the hint Catalyst shuffles all of lineitem
        # on l_partkey a second time (measured 3× at the 10× replica)
        .join(F.broadcast(part_avg), F.col("pa_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            _dsum(F.col("l_extendedprice")).alias("low_qty_revenue"),
        )
    )


@query(
    "large_quantity_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate, CAST(o_totalprice AS DOUBLE) AS total_price, sum_qty
    FROM orders JOIN (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 180
    ) big ON o_orderkey = big.l_orderkey
    ORDER BY sum_qty DESC, o_orderkey
    LIMIT 100
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over GROUP BY ... HAVING, expressed as
    agg + join carrying the aggregate out; top-100 with key tie-break.

    Scale: the HAVING filter runs inside the agg (post-partial), so only
    qualifying orderkeys reach the join; top-k is TakeOrderedAndProject.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("qsum"))
        .filter(F.col("qsum") > 180)
        .select("l_orderkey", F.col("qsum").cast("double").alias("sum_qty"))
    )
    return (
        # shuffle-hash on the post-HAVING side: local file-size estimates
        # otherwise tempt Catalyst into broadcasting ORDERS — a fact table —
        # which is exactly backwards at scale (measured 9× at the 10×
        # replica). The hash join shuffles only qualifying orderkeys.
        o.join(big.hint("shuffle_hash"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Conditional aggregation
# ---------------------------------------------------------------------------

@query(
    "priority_line_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_linestatus
    """,
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-sum conditional counts per group."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "promo_revenue_by_month",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
           CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END AS DECIMAL(20,4))) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE)
               AS total_revenue,
           CAST(trunc(
               CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END AS DECIMAL(20,4))) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE)
               * 1e8) AS BIGINT) AS promo_share_e8
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def promo_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share per month (conditional
    numerator / total denominator). The share is emitted as a trunc-scaled
    BIGINT (identical doubles truncate identically; round() halves don't).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    promo_sum = _dsum(promo)
    total_sum = _dsum(rev)
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            promo_sum.alias("promo_revenue"),
            total_sum.alias("total_revenue"),
            (promo_sum / total_sum * F.lit(1e8))
            .cast("bigint")
            .alias("promo_share_e8"),
        )
    )


# ---------------------------------------------------------------------------
# Range join / full outer / min_by-max_by
# ---------------------------------------------------------------------------

@query(
    "views_preceding_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(v.event_id) AS n_recent_views
    FROM events p LEFT JOIN events v
      ON p.user_id = v.user_id AND v.event_type = 'view'
     AND v.ts > p.ts - INTERVAL 10 MINUTE AND v.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def views_preceding_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: for every purchase, count the same user's views
    in the preceding 10 minutes (the *all-matches* sibling of the as-of
    join's nearest-match, operators/asof.py).

    Scale: the equi key (user_id) keeps this a hash/sort-merge join — the
    range predicate is a post-probe filter, never a cartesian. Skewed users
    are AQE's problem (or salting, operators/skew.py).
    """
    e = load_table(spark, sf_dir, "events")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"))
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("v_ts") <= F.col("p_ts")),
            "left",
        )
        .groupBy("purchase_id", "user_id")
        .agg(F.count("view_id").alias("n_recent_views"))
    )


@query(
    "user_activity_reconciliation",
    oracle="""
    WITH eu AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
         oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT COALESCE(user_id, o_custkey) AS id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(n_orders, 0) AS n_orders,
           CASE WHEN user_id IS NULL THEN 'orders_only'
                WHEN o_custkey IS NULL THEN 'events_only'
                ELSE 'both' END AS presence
    FROM eu FULL OUTER JOIN oc ON user_id = o_custkey
    """,
)
def user_activity_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two activity ledgers (event users vs
    ordering customers) with presence classification — the canonical
    'compare two systems' audit query."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    eu = e.groupBy("user_id").agg(F.count("*").alias("n_events"))
    oc = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        eu.join(oc, F.col("user_id") == F.col("o_custkey"), "full_outer")
        .select(
            F.coalesce("user_id", "o_custkey").alias("id"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.when(F.col("user_id").isNull(), "orders_only")
            .when(F.col("o_custkey").isNull(), "events_only")
            .otherwise("both")
            .alias("presence"),
        )
    )


@query(
    "best_order_per_segment",
    oracle="""
    SELECT c_mktsegment,
           MAX(o_totalprice) AS max_price,
           arg_max(o_orderkey,
                   printf('%018d|%010d', CAST(trunc(o_totalprice * 100) AS BIGINT),
                          o_orderkey)) AS best_orderkey,
           arg_min(o_orderkey,
                   printf('%018d|%010d', CAST(trunc(o_totalprice * 100) AS BIGINT),
                          o_orderkey)) AS cheapest_orderkey
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def best_order_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) per group — single-pass 'row achieving
    the extreme', no window + filter round-trip. The ordering key is a
    fixed-width '<cents>|<orderkey>' string: unique (tie-broken by key) and
    portable — DuckDB's arg_max can't take a composite struct key, and both
    engines truncate the same double identically."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ord_key = F.format_string(
        "%018d|%010d",
        (F.col("o_totalprice") * 100).cast("bigint"),
        F.col("o_orderkey"),
    )
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.max("o_totalprice").alias("max_price"),
            F.max_by("o_orderkey", ord_key).alias("best_orderkey"),
            F.min_by("o_orderkey", ord_key).alias("cheapest_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline extensions
# ---------------------------------------------------------------------------

@query(
    "document_chunks",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents),
    chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) // 24 AS chunk_id,
               toks[i + 1 : i + 32] AS chunk_toks
        FROM toks, unnest(generate_series(0, len(toks) - 1, 24)) AS u(i)
        WHERE len(toks) > 0
    )
    SELECT doc_id, chunk_id, len(chunk_toks) AS n_tokens,
           md5(array_to_string(chunk_toks, ' ')) AS chunk_digest
    FROM chunks
    """,
)
def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (size 32, stride 24) — the
    standard LLM-pretraining windowing op. Emits per-chunk token count and
    content digest (not the text: at 100 TB the digest is what dedup and
    shard-assignment consume).

    Scale: pure narrow ops (split + sequence + explode + slice) — no
    shuffle at all until a downstream consumer groups by digest.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize("text").alias("toks")).filter(F.size("toks") > 0)
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(24))
    chunked = (
        toks.select("doc_id", "toks", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            (F.col("i") / 24).cast("bigint").alias("chunk_id"),
            F.slice(F.col("toks"), F.col("i") + 1, F.lit(32)).alias("chunk_toks"),
        )
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size("chunk_toks").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "chunk_toks")).alias("chunk_digest"),
    )


# Email, then (after emails are gone) phone-number runs. Same RE2/Java-regex
# subset on both sides; Spark's regexp_replace is global by default, DuckDB
# needs the 'g' flag.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d[\d-]{5,}\d"


@query(
    "pii_redaction",
    oracle=rf"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-01' || CAST(doc_id % 100 AS VARCHAR)
                    || ' now' AS seeded_text
        FROM documents
    ), scrubbed AS (
        SELECT doc_id, seeded_text,
               regexp_replace(seeded_text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS no_email
        FROM seeded
    )
    SELECT doc_id,
           len(regexp_extract_all(seeded_text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(no_email, '{_PHONE_RE}')) AS n_phones,
           length(regexp_replace(no_email, '{_PHONE_RE}', '<PHONE>', 'g')) AS n_chars_redacted,
           md5(regexp_replace(no_email, '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_digest
    FROM scrubbed
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex-redact emails then phone numbers, reporting
    match counts and the redacted digest. The corpus is synthetic word soup,
    so deterministic PII is injected inline first (doc_id-derived email +
    phone) — the scrub expressions are exactly what runs on real text.

    Scale: per-row regex in whole-stage codegen; no shuffle, no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-01"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" now"),
    )
    df = d.select("doc_id", seeded.alias("seeded_text")).withColumn(
        "no_email", F.regexp_replace("seeded_text", _EMAIL_RE, "<EMAIL>")
    )
    redacted = F.regexp_replace("no_email", _PHONE_RE, "<PHONE>")
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all("seeded_text", F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("no_email", F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.length(redacted).alias("n_chars_redacted"),
        F.md5(redacted).alias("redacted_digest"),
    )


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(toks[i : i + 2], ' ')), 1, 15))::BIGINT
                   AS gram
        FROM toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
    ),
    bench AS (SELECT doc_id, gram FROM grams WHERE doc_id % 10 = 0),
    rest  AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 <> 0)
    SELECT bench.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN rest.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(trunc(CAST(SUM(CASE WHEN rest.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*) * 1e6) AS BIGINT) AS contamination_e6
    FROM bench LEFT JOIN rest USING (gram)
    GROUP BY bench.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each held-out document's
    distinct word n-grams (n=3 here — the corpus is short synthetic text;
    production uses 8-13) that appear anywhere in the training split
    (doc_id % 10 partitions the corpus into 10% benchmark / 90% train).

    Scale: contamination is a semi-join on the gram (hash it to 8 bytes at
    real scale); distinct-per-doc keeps the gram table sub-linear in corpus
    size. No O(bench × train) pair comparison anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    # <3-token docs have no trigrams; filter BEFORE sequence() — Spark's
    # sequence(1, n-2) flips to a descending [1, 0] when n-2 < 1.
    toks = d.select("doc_id", tokenize("text").alias("toks")).filter(F.size("toks") >= 3)
    idx = F.sequence(F.lit(1), F.size("toks") - 2)
    # shuffle 8-byte gram hashes, not gram strings: the distincts and the
    # contamination semi-join move 60-bit md5-prefix ints (identical in
    # both engines — counts are unchanged, collisions are ~2^-60)
    gram_hash = F.conv(
        F.substring(F.md5(F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(3)))), 1, 15),
        16, 10,
    ).cast("bigint")
    grams = (
        toks.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select("doc_id", gram_hash.alias("gram"))
        .distinct()
    )
    bench = grams.filter(F.col("doc_id") % 10 == 0)
    rest = grams.filter(F.col("doc_id") % 10 != 0).select("gram").distinct()
    hit = F.when(F.col("hit_gram").isNotNull(), 1).otherwise(0)
    # shuffle_hash, not broadcast: Catalyst's local estimate broadcasts the
    # train-split gram set, which is corpus-scale in production; both sides
    # are already hash-partitioned by gram from their distincts, so the
    # shuffle join reuses those exchanges (A/B'd equal-or-faster locally,
    # SCALE.md round 2)
    return (
        bench.join(rest.select(F.col("gram").alias("hit_gram")).hint("shuffle_hash"),
                   F.col("gram") == F.col("hit_gram"), "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(hit).alias("n_contaminated"),
            (F.sum(hit).cast("double") / F.count("*") * 1e6)
            .cast("bigint")
            .alias("contamination_e6"),
        )
    )


@query(
    "decontaminated_corpus",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 15))::BIGINT AS gram
        FROM toks, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) t(i)
        WHERE len(toks) >= 3
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
    train AS (SELECT doc_id, gram FROM grams WHERE doc_id % 10 <> 0),
    scored AS (
        SELECT train.doc_id,
               COUNT(*) AS n_grams,
               CAST(trunc(CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                    / COUNT(*) * 1e6) AS BIGINT) AS contamination_e6
        FROM train LEFT JOIN bench ON train.gram = bench.gram
        GROUP BY train.doc_id
    )
    SELECT doc_id, n_grams, contamination_e6
    FROM scored WHERE contamination_e6 <= 200000
    """,
)
def decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACT half of contamination checking: keep the training-split
    documents whose trigram overlap with the benchmark split is <= 20%
    (drop the leaked ones). benchmark_contamination measures bench->train
    leakage; this filters train->bench — together they are the full
    decontamination loop of an LLM data pipeline.

    Scale shape is identical to benchmark_contamination (distinct 60-bit
    gram hashes, shuffle_hash join — the bench gram set is the SMALL side
    here but still corpus-derived, so no local-estimate broadcast), plus
    one per-doc ratio filter. The ratio is scaled-int (one terminal
    division) for cross-engine exactness."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize("text").alias("toks")).filter(F.size("toks") >= 3)
    idx = F.sequence(F.lit(1), F.size("toks") - 2)
    gram_hash = F.conv(
        F.substring(F.md5(F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(3)))), 1, 15),
        16, 10,
    ).cast("bigint")
    grams = (
        toks.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select("doc_id", gram_hash.alias("gram"))
        .distinct()
    )
    bench = grams.filter(F.col("doc_id") % 10 == 0).select("gram").distinct()
    train = grams.filter(F.col("doc_id") % 10 != 0)
    hit = F.when(F.col("hit_gram").isNotNull(), 1).otherwise(0)
    return (
        train.join(
            bench.select(F.col("gram").alias("hit_gram")).hint("shuffle_hash"),
            F.col("gram") == F.col("hit_gram"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            (F.sum(hit).cast("double") / F.count("*") * 1e6)
            .cast("bigint")
            .alias("contamination_e6"),
        )
        .filter(F.col("contamination_e6") <= 200_000)
    )


@query(
    "fuzzy_adjacent_titles",
    oracle="""
    SELECT a.doc_id AS doc_id,
           levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS edit_distance,
           length(substr(a.text, 1, 40)) AS a_len,
           length(substr(b.text, 1, 40)) AS b_len
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def fuzzy_adjacent_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via Levenshtein edit distance (adjacent-doc
    prefix pairs) — the character-level sibling of token-Jaccard dedup.
    Bounded to 40-char prefixes: edit distance is O(len²) per pair; at scale
    you band by length/prefix first and only run it inside candidate pairs
    (exactly like minhash banding)."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id"), F.substring("text", 1, 40).alias("a_pfx"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.substring("text", 1, 40).alias("b_pfx"))
    return (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            F.levenshtein("a_pfx", "b_pfx").alias("edit_distance"),
            F.length("a_pfx").alias("a_len"),
            F.length("b_pfx").alias("b_len"),
        )
    )


@query(
    "embedding_quantization",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS amax,
               list_transform(embedding,
                   v -> CAST(trunc(CAST(v AS DOUBLE)
                        / nullif(list_max(list_transform(embedding, v2 -> abs(CAST(v2 AS DOUBLE)))), 0)
                        * 127) AS TINYINT)) AS qvec
        FROM embeddings
    )
    SELECT vec_id, len(qvec) AS n_dims,
           -- comma-joined string, not a list: list cells are unhashable in
           -- the driver's pandas canonicalizer
           array_to_string(list_transform(qvec[1:8], v -> CAST(v AS VARCHAR)), ',') AS q_head,
           CAST(trunc(amax * 1e7) AS BIGINT) AS amax_e7
    FROM q
    """,
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (scale = max|v| / 127) — the
    standard embedding-storage compression (4x smaller, dot products in
    int arithmetic). Truncating quantizer: double->int8 casts truncate
    identically in both engines; round() halves don't.

    Scale: a narrow per-row transform, no shuffle; at 100 TB this runs at
    ingest and the float column is dropped from the hot layout.
    """
    e = load_table(spark, sf_dir, "embeddings")
    amax = F.array_max(F.transform("embedding", lambda v: F.abs(v.cast("double"))))
    qvec = F.transform(
        "embedding",
        lambda v: (v.cast("double") / F.nullif(F.col("amax"), F.lit(0.0)) * 127).cast("tinyint"),
    )
    return (
        e.withColumn("amax", amax)
        .withColumn("qvec", qvec)
        .select(
            "vec_id",
            F.size("qvec").alias("n_dims"),
            F.concat_ws(
                ",", F.transform(F.slice("qvec", 1, 8), lambda v: v.cast("string"))
            ).alias("q_head"),
            (F.col("amax") * 1e7).cast("bigint").alias("amax_e7"),
        )
    )


@query(
    "tfidf_keyword_ranking",
    oracle=f"""
    WITH tokens AS (
        SELECT doc_id, unnest({tokenize_sql('text')}) AS token FROM documents
    ), doc_len AS (
        SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id
    ), corpus AS (SELECT COUNT(*) AS n_docs FROM doc_len),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tokens
        WHERE token IN ('hash', 'batch') GROUP BY doc_id, token
    ), dfreq AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
    )
    SELECT tf.doc_id AS doc_id,
           ROUND(SUM((CAST(tf.tf AS DOUBLE) / doc_len.dl)
                     * (ln((1.0::DOUBLE + corpus.n_docs) / (1 + dfreq.df)) + 1.0::DOUBLE)), 6)
               AS tfidf
    FROM tf JOIN dfreq USING (token) JOIN doc_len ON tf.doc_id = doc_len.doc_id, corpus
    GROUP BY tf.doc_id
    ORDER BY tfidf DESC, tf.doc_id
    LIMIT 10
    """,
)
def tfidf_keyword_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-10 for a two-term query — the linear-relevance twin of
    bm25_keyword_ranking (same plan: one explode, broadcast df/N, top-k).
    Two query terms keep the per-doc float sum associativity-safe for the
    cross-engine hash compare."""
    from ..operators.search import tfidf_rank

    d = load_table(spark, sf_dir, "documents")
    return tfidf_rank(d, "doc_id", "hash batch", k=10)


@query(
    "order_value_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS bin_low,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS bin_total
    FROM orders
    GROUP BY 1, 2
    """,
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (50k bins) over order values — the binned
    profiling aggregation (Spark floor()->LONG vs DuckDB floor()->DOUBLE:
    cast both to BIGINT). Scale: one narrow-key hash agg, ~20 groups."""
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 50000).cast("bigint")
    return (
        o.groupBy(bin_.alias("bin"), (bin_ * 50000).alias("bin_low"))
        .agg(F.count("*").alias("n"), _dsum(F.col("o_totalprice")).alias("bin_total"))
    )


@query(
    "salted_event_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase (salted) aggregation, oracle-proven equal to the
    plain GROUP BY: event_type has only a handful of hot values — exactly
    the shape where one reducer owns a hot key at 100 TB. The salt spreads
    phase 1 across 16 reducers per key; phase 2 merges 16 partials per key.
    All aggregates here are algebraic, so the two-phase split is exact
    (the decimal accumulator keeps the sum order-independent too).
    """
    from ..operators.skew import salted_aggregate

    e = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        e,
        ["event_type"],
        {
            "n": ("sum", F.count("*")),
            "total_value": ("sum", F.sum(F.col("value").cast("decimal(20,6)"))),
            "max_value": ("max", F.max("value")),
        },
    ).withColumn("total_value", F.col("total_value").cast("double"))


@query(
    "salted_user_segment_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(trunc(e.value * 1000000) AS BIGINT)) AS BIGINT) AS v_e6
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    """,
)
def salted_user_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted equi-join, oracle-proven equal to the plain join:
    events' user_id is the hot-key side (a viral user at 100 TB), customer
    the small side — salted_broadcast_left spreads each hot key over 8
    (key, salt) partitions and replicates the dim side once per salt, so no
    single reducer owns a hot user in the downstream aggregation. The salt
    never changes join semantics (oracle = unsalted join + GROUP BY);
    the per-segment sums are exact scaled-ints."""
    from ..operators.skew import salted_broadcast_left

    e = load_table(spark, sf_dir, "events").withColumnRenamed("user_id", "c_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_broadcast_left(e, c, "c_custkey", salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.expr("CAST(value * 1e6 AS BIGINT)")).cast("bigint").alias("v_e6"),
    )


@query("approx_order_percentiles", oracle=None)
def approx_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile / KLL-style, accuracy
    10000 ≈ 0.01 rank error) per order status — the single-pass mergeable
    alternative to the exact interpolated `order_value_percentiles` when a
    full sort-per-group is too expensive at 100 TB. Rows-only: sketches are
    engine-specific; tests pin the rank-error bound against the exact
    percentiles instead."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        *[
            F.percentile_approx("o_totalprice", q, 10000).alias(f"p{int(q*100)}")
            for q in (0.25, 0.50, 0.75, 0.90)
        ]
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH slid AS (
        SELECT event_type, value, ts,
               date_trunc('hour', ts)
                 + (CAST(floor(extract(minute FROM ts) / 15) AS INT) - 3 + u.i)
                   * INTERVAL 15 MINUTE AS win_start
        FROM events, unnest(generate_series(0, 3)) AS u(i)
    )
    SELECT win_start, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM slid
    WHERE ts >= win_start AND ts < win_start + INTERVAL 60 MINUTE
    GROUP BY 1, 2
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1-hour windows every 15 minutes): each
    event contributes to 4 overlapping windows — the hopping twin of the
    tumbling `events_hourly` (and of the streaming watermarked version).
    The oracle reconstructs Spark's epoch-aligned window assignment with an
    explicit 4-way unnest."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )


@query(
    "array_function_showcase",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, v -> CAST(v AS DOUBLE) > 0)) AS n_positive,
           CAST(trunc(list_sum(list_transform(embedding,
                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) * 1e6) AS BIGINT) AS sum_sq_e6,
           CAST(trunc(list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) * 1e6)
                AS BIGINT) AS max_abs_e6,
           array_to_string(list_transform(embedding[1:4],
               v -> CAST(CAST(trunc(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS VARCHAR)), ',')
               AS head_milli
    FROM embeddings
    """,
)
def array_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions in one pass — filter (count positive
    dims), transform+aggregate (sum of squares, accumulated in list order so
    both engines associate identically), array_max, slice+transform. All
    JVM-side lambda expressions; float-derived scalars exported as
    trunc-scaled ints."""
    e = load_table(spark, sf_dir, "embeddings")
    as_d = lambda v: v.cast("double")
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda v: as_d(v) > 0)).alias("n_positive"),
        (
            F.aggregate(
                F.transform("embedding", lambda v: as_d(v) * as_d(v)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * 1e6
        ).cast("bigint").alias("sum_sq_e6"),
        (F.array_max(F.transform("embedding", lambda v: F.abs(as_d(v)))) * 1e6)
        .cast("bigint")
        .alias("max_abs_e6"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 4),
                lambda v: (as_d(v) * 1000).cast("bigint").cast("string"),
            ),
        ).alias("head_milli"),
    )


@query(
    "excess_view_counts_bag",
    oracle="""
    SELECT user_id, COUNT(*) AS excess_views
    FROM (
        SELECT user_id FROM events WHERE event_type = 'view'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    GROUP BY user_id
    """,
)
def excess_view_counts_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) set-op semantics: EXCEPT ALL keeps max(views −
    purchases, 0) copies per user — the per-occurrence difference that the
    DISTINCT set ops (viewers_never_purchased) throw away. Aggregated to
    (user, excess) for a compact result."""
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    return v.exceptAll(p).groupBy("user_id").agg(F.count("*").alias("excess_views"))


@query(
    "null_ordering_top_values",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
    FROM events
    ORDER BY v DESC NULLS LAST, event_id
    LIMIT 50
    """,
)
def null_ordering_top_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL ordering: error events get a NULL metric, ranking must
    push them last. The explicitness is the point — Spark defaults ASC to
    NULLS FIRST / DESC to NULLS LAST while DuckDB defaults NULLS LAST
    everywhere, so any cross-engine ORDER BY over nullable keys that leaves
    null placement implicit is a latent divergence."""
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    return (
        e.select("event_id", "user_id", v.alias("v"))
        .orderBy(F.desc_nulls_last("v"), F.asc("event_id"))
        .limit(50)
    )


@query(
    "k_anonymity_release",
    oracle="""
    SELECT c.c_nationkey, c.c_mktsegment,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders,
           COUNT(*) >= 10 AS released,
           CASE WHEN COUNT(*) >= 10
                THEN CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
           END AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_nationkey, c.c_mktsegment, order_year
    """,
)
def k_anonymity_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression (Sweeney 2002) for releasing aggregate
    statistics from a training-data pipeline: group on the quasi-identifier
    tuple (nation, market segment, order year) and release per-group
    revenue ONLY where the group holds >= k=10 individuals' orders — the
    re-identification guard applied before exporting per-cohort stats next
    to pii_redaction's content scrubbing. Suppressed groups stay visible as
    (count, released=false, revenue NULL) so the release is auditable.

    Scale: one shuffle on the (small-domain) QI tuple after a broadcast
    customer join at oracle SF (at 100 TB the customer join shuffles on
    custkey and the QI agg stays a partial+final hash agg); money in
    DECIMAL per the engine-wide discipline; the released gate is a
    projection over the finished aggregate, never a second pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    k = 10
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("__rev"),
        )
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "order_year",
        "n_orders",
        (F.col("n_orders") >= k).alias("released"),
        F.when(F.col("n_orders") >= k, F.col("__rev")).alias("revenue"),
    )


@query(
    "pipeline_funnel_report",
    oracle=f"""
    WITH s1 AS (
        SELECT doc_id, lang, {tokenize_sql('text')} AS toks,
               md5(trim(regexp_replace(lower(text), '[^\\p{{L}}\\p{{N}}]+', ' ', 'g'))) AS digest
        FROM documents
    ),
    s2 AS (SELECT * FROM s1 WHERE toks IS NOT NULL AND len(toks) >= 5),
    s3 AS (SELECT * FROM s2 WHERE lang = 'en'),
    s4 AS (
        SELECT doc_id, toks FROM (
            SELECT doc_id, toks,
                   ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
            FROM s3)
        WHERE rn = 1
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 15))::BIGINT AS gram
        FROM s4, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) t(i)
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
    train AS (SELECT doc_id, gram FROM grams WHERE doc_id % 10 <> 0),
    scored AS (
        SELECT train.doc_id,
               CAST(trunc(CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                    / COUNT(*) * 1e6) AS BIGINT) AS c_e6
        FROM train LEFT JOIN bench ON train.gram = bench.gram
        GROUP BY train.doc_id
    ),
    s5 AS (SELECT s4.doc_id, s4.toks FROM s4 JOIN scored USING (doc_id)
           WHERE c_e6 <= 200000)
    SELECT * FROM (
        SELECT 1 AS stage, 'raw' AS stage_name, COUNT(*) AS n_docs,
               CAST(SUM(COALESCE(len(toks), 0)) AS BIGINT) AS n_tokens FROM s1
        UNION ALL
        SELECT 2, 'admitted', COUNT(*), CAST(SUM(len(toks)) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'lang_en', COUNT(*), CAST(SUM(len(toks)) AS BIGINT) FROM s3
        UNION ALL
        SELECT 4, 'exact_dedup', COUNT(*), CAST(SUM(len(toks)) AS BIGINT) FROM s4
        UNION ALL
        SELECT 5, 'decontaminated', COUNT(*), CAST(SUM(len(toks)) AS BIGINT) FROM s5
    )
    """,
)
def pipeline_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline as ONE DAG with per-stage
    accounting — the funnel report a data-curation run publishes: raw ->
    admitted (non-null, >=5 tokens) -> language gate (en) -> exact dedup
    (min-doc_id survivor per normalized digest) -> decontamination (drop
    train docs with >20% trigram overlap vs the doc_id%10 benchmark split,
    bench grams drawn from the SURVIVING corpus so the stages genuinely
    compose). Each stage reuses the registered operator's exact semantics
    (dedup_exact_groups, decontaminated_corpus), so this query is the
    integration test that the operators compose into a pipeline, and the
    per-stage (docs, tokens) deltas are the curation yield numbers.

    Scale: one tokenize pass feeds every stage (toks carried, text
    dropped) — s1 and the post-dedup s4 are localCheckpoint'd, since the
    five stage aggregates plus the gram branches would otherwise each
    re-tokenize the corpus (7 parquet scans in the un-pinned plan); dedup
    windows per digest; contamination shuffles 60-bit gram
    ints; the five stage aggregates are partial+final counts unioned as
    one-row frames — the funnel adds no corpus-sized stage beyond its
    component operators."""
    d = load_table(spark, sf_dir, "documents")
    from ..operators.dedup import text_digest

    s1 = d.select(
        "doc_id",
        "lang",
        tokenize("text").alias("toks"),
        text_digest("text").alias("digest"),
    ).localCheckpoint()
    s2 = s1.filter(F.col("toks").isNotNull() & (F.size("toks") >= 5))
    s3 = s2.filter(F.col("lang") == "en")
    w = W.partitionBy("digest").orderBy("doc_id")
    s4 = (
        s3.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "toks")
        .localCheckpoint()
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size("toks") - 2, F.lit(0)))
    gram_hash = F.conv(
        F.substring(F.md5(F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(3)))), 1, 15),
        16, 10,
    ).cast("bigint")
    grams = (
        s4.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select("doc_id", gram_hash.alias("gram"))
        .distinct()
    )
    bench = grams.filter(F.col("doc_id") % 10 == 0).select("gram").distinct()
    train = grams.filter(F.col("doc_id") % 10 != 0)
    scored = (
        train.join(bench.hint("shuffle_hash").withColumn("__hit", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double")
                / F.count("*") * 1e6
            ).cast("bigint").alias("c_e6")
        )
    )
    s5 = s4.join(scored, "doc_id").filter(F.col("c_e6") <= 200000).select("doc_id", "toks")

    def _stage(df: DataFrame, stage: int, name: str, raw: bool = False) -> DataFrame:
        tokens = (
            F.coalesce(F.size("toks"), F.lit(0)) if raw
            else F.size("toks")
        )
        return df.agg(
            F.lit(stage).cast("int").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count("*").alias("n_docs"),
            F.sum(tokens).cast("bigint").alias("n_tokens"),
        )

    return (
        _stage(s1, 1, "raw", raw=True)
        .unionAll(_stage(s2, 2, "admitted"))
        .unionAll(_stage(s3, 3, "lang_en"))
        .unionAll(_stage(s4, 4, "exact_dedup"))
        .unionAll(_stage(s5, 5, "decontaminated"))
    )


@query(
    "table_stats_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           MIN(o_totalprice), MAX(o_totalprice), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           CAST(epoch_us(MIN(o_orderdate)) AS DOUBLE),
           CAST(epoch_us(MAX(o_orderdate)) AS DOUBLE), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           NULL, NULL, MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for the orders table — rows, nulls,
    exact NDV, min/max per column (numerics and timestamps as doubles/epoch
    micros, strings as strings) — the statistics a cost-based optimizer
    ingests and a pipeline's data-quality monitor diffs between snapshots.

    Exact NDV on every column in one aggregate forces Spark's Expand (one
    scan replicated per distinct aggregate) — acceptable at gate scale and
    what the oracle needs; the production path at 100 TB is
    approx_count_distinct (HLL, single pass, mergeable — the engine's
    hll_user_registers pins that sketch math) or one pass per column.
    Min/max/null counts stay single-pass partial aggregates either way.
    Timestamps are profiled as exact integer epoch micros, never formatted
    strings (cross-engine timestamp rendering differs)."""
    o = load_table(spark, sf_dir, "orders")
    num = lambda c: F.col(c).cast("double")  # noqa: E731
    agg = o.agg(
        F.count("*").alias("n_rows"),
        *[
            x
            for c in ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
            for x in (
                (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
                F.countDistinct(c).alias(f"{c}__nd"),
            )
        ],
        (F.count("*") - F.count("o_orderdate")).alias("o_orderdate__nulls"),
        F.countDistinct("o_orderdate").alias("o_orderdate__nd"),
        F.min(num("o_orderkey")).alias("o_orderkey__min"),
        F.max(num("o_orderkey")).alias("o_orderkey__max"),
        F.min(num("o_custkey")).alias("o_custkey__min"),
        F.max(num("o_custkey")).alias("o_custkey__max"),
        F.min(num("o_totalprice")).alias("o_totalprice__min"),
        F.max(num("o_totalprice")).alias("o_totalprice__max"),
        F.min(F.unix_micros("o_orderdate").cast("double")).alias("o_orderdate__min"),
        F.max(F.unix_micros("o_orderdate").cast("double")).alias("o_orderdate__max"),
        F.min("o_orderstatus").alias("o_orderstatus__smin"),
        F.max("o_orderstatus").alias("o_orderstatus__smax"),
        F.min("o_orderpriority").alias("o_orderpriority__smin"),
        F.max("o_orderpriority").alias("o_orderpriority__smax"),
    )
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")

    def _row(name: str, numeric: bool) -> F.Column:
        return F.struct(
            F.lit(name).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{name}__nulls").alias("n_nulls"),
            F.col(f"{name}__nd").alias("n_distinct"),
            (F.col(f"{name}__min") if numeric else null_d).alias("min_num"),
            (F.col(f"{name}__max") if numeric else null_d).alias("max_num"),
            (null_s if numeric else F.col(f"{name}__smin")).alias("min_str"),
            (null_s if numeric else F.col(f"{name}__smax")).alias("max_str"),
        )

    rows = F.array(
        _row("o_orderkey", True),
        _row("o_custkey", True),
        _row("o_totalprice", True),
        _row("o_orderdate", True),
        _row("o_orderstatus", False),
        _row("o_orderpriority", False),
    )
    return agg.select(F.explode(rows).alias("s")).select("s.*")


@query(
    "cdc_merge_apply",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
    ins AS (SELECT * FROM orders WHERE o_orderkey % 10 = 0),
    upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice, o_orderdate, o_orderpriority
        FROM base WHERE o_orderkey % 7 = 0
    ),
    del AS (SELECT o_orderkey FROM base
            WHERE o_orderkey % 13 = 0 AND o_orderkey % 7 <> 0),
    touched AS (SELECT o_orderkey FROM upd UNION ALL SELECT o_orderkey FROM del),
    merged AS (
        SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM touched)
        UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM ins
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM merged GROUP BY o_orderstatus
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture MERGE on plain parquet — the generalization of
    the reference's single-record upsert (apitestmongo.py:53 update_one /
    SURVEY op 7) to a full insert/update/delete batch, expressed as the
    anti-join + union plan a production pipeline runs when no
    transactional table format (Delta/Iceberg MERGE INTO) is available:
    survivors = base ANTI-JOIN touched-keys, then UNION the updated and
    inserted rows. The CDC delta here is derived deterministically from
    the orders table (keys %10=0 insert, %7=0 update +10.00, %13=0 and
    not updated delete) so the oracle is closed-form; output is the
    post-merge per-status rowcount + DECIMAL revenue.

    Scale: one shuffle family on o_orderkey — the anti-join's key set is
    the delta (small vs base, broadcast it); unions are free (no
    exchange); partition-bucket the base by key hash (DEPLOY.md L5) and
    the rewrite touches only buckets holding delta keys — the same
    bounded-IO story as the streaming state store."""
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = o.filter(key % 10 != 0)
    ins = o.filter(key % 10 == 0)
    upd = base.filter(key % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(10.0)
    )
    dele = base.filter((key % 13 == 0) & (key % 7 != 0)).select("o_orderkey")
    touched = upd.select("o_orderkey").unionAll(dele)
    merged = (
        base.join(F.broadcast(touched), "o_orderkey", "left_anti")
        .unionByName(upd)
        .unionByName(ins)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        _dsum(F.col("o_totalprice")).alias("revenue"),
    )


@query(
    "snapshot_diff",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
    ins AS (SELECT * FROM orders WHERE o_orderkey % 10 = 0),
    upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice, o_orderdate, o_orderpriority
        FROM base WHERE o_orderkey % 7 = 0
    ),
    del AS (SELECT o_orderkey FROM base
            WHERE o_orderkey % 13 = 0 AND o_orderkey % 7 <> 0),
    merged AS (
        SELECT * FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM ins
    )
    SELECT CAST(SUM(CASE WHEN b.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN m.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN b.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
                          AND b.o_totalprice <> m.o_totalprice THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(CASE WHEN b.o_orderkey IS NOT NULL AND m.o_orderkey IS NOT NULL
                          AND b.o_totalprice = m.o_totalprice THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM base b FULL OUTER JOIN merged m USING (o_orderkey)
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot reconciliation — the audit companion to
    cdc_merge_apply: full-outer join the pre- and post-merge snapshots on
    the key and classify every key as added / removed / changed /
    unchanged. This is the diff a pipeline publishes alongside a merge
    (and the check that a CDC feed applied exactly: the counts must equal
    the delta's I/U/D cardinalities, which the crafted test pins).

    Scale: ONE full-outer sort-merge join on the key, then a single
    partial+final conditional-count aggregate — the canonical two-snapshot
    diff plan; with both snapshots bucketed by key (DEPLOY L1/L5) the
    exchange disappears entirely."""
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = o.filter(key % 10 != 0)
    ins = o.filter(key % 10 == 0)
    upd = base.filter(key % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(10.0)
    )
    dele = base.filter((key % 13 == 0) & (key % 7 != 0)).select("o_orderkey")
    touched = upd.select("o_orderkey").unionAll(dele)
    merged = (
        base.join(F.broadcast(touched), "o_orderkey", "left_anti")
        .unionByName(upd)
        .unionByName(ins)
    )
    b = base.select("o_orderkey", F.col("o_totalprice").alias("__bp"))
    m = merged.select("o_orderkey", F.col("o_totalprice").alias("__mp"))
    j = b.join(m, "o_orderkey", "full_outer")
    return j.agg(
        F.sum(F.col("__bp").isNull().cast("int")).cast("bigint").alias("n_added"),
        F.sum(F.col("__mp").isNull().cast("int")).cast("bigint").alias("n_removed"),
        F.sum(
            (F.col("__bp").isNotNull() & F.col("__mp").isNotNull()
             & (F.col("__bp") != F.col("__mp"))).cast("int")
        ).cast("bigint").alias("n_changed"),
        F.sum(
            (F.col("__bp").isNotNull() & F.col("__mp").isNotNull()
             & (F.col("__bp") == F.col("__mp"))).cast("int")
        ).cast("bigint").alias("n_unchanged"),
    )


@query(
    "join_skew_report",
    oracle="""
    WITH freq AS (
        SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(MAX(c) AS BIGINT) AS max_per_key
        FROM freq
    ), top AS (
        SELECT l_orderkey, c,
               ROW_NUMBER() OVER (ORDER BY c DESC, l_orderkey) AS rk
        FROM freq
    )
    SELECT t.l_orderkey AS hot_key, CAST(t.c AS BIGINT) AS key_rows,
           s.n_keys, s.n_rows, s.max_per_key,
           CAST(trunc(CAST(s.max_per_key * s.n_keys AS DOUBLE) / s.n_rows * 1e6)
                AS BIGINT) AS skew_factor_e6
    FROM top t CROSS JOIN stats s
    WHERE t.rk <= 5
    """,
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the profiling query behind every salting
    / AQE-skew decision in this repo (operators/skew.py): per-key row
    counts on the lineitem join key, the 5 heaviest keys, and the skew
    factor max/mean (trunc-scaled). A factor near 1e6 means uniform; large
    factors say 'salt this join or let AQE split it'.

    Scale: the frequency table is a partial+final count on the join key
    (the same shuffle the join itself would do); the top-5 is
    TakeOrdered; the stats row broadcasts. Nothing touches row payloads —
    keys and counts only."""
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    stats = freq.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_per_key"),
    )
    top = freq.orderBy(F.desc("c"), F.asc("l_orderkey")).limit(5)
    skew = (
        (F.col("max_per_key") * F.col("n_keys")).cast("double")
        / F.col("n_rows") * 1e6
    ).cast("bigint")
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            F.col("l_orderkey").alias("hot_key"),
            F.col("c").cast("bigint").alias("key_rows"),
            "n_keys", "n_rows", "max_per_key",
            skew.alias("skew_factor_e6"),
        )
    )


@query(
    "ols_by_segment",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) AS s_x,
           CAST(SUM(p) AS BIGINT) AS s_y,
           CAST(SUM(d * d) AS BIGINT) AS s_xx,
           CAST(SUM(d * p) AS BIGINT) AS s_xy
    FROM (
        SELECT o_custkey,
               CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
               CAST(trunc(o_totalprice * 100) AS BIGINT) AS p
        FROM orders
    ) f JOIN customer c ON c.c_custkey = f.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def ols_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped linear-trend training: per market segment, the exact
    integer sufficient statistics (n, Sx, Sy, Sxx, Sxy) for regressing
    order value (cents) on order date (epoch days) — the grouped
    generalization of ols_training_moments: same one-pass map-side-
    combined contract, but one model per group, which is how a pipeline
    fits thousands of per-cohort trend lines in a single job. The slope /
    intercept solve is two scalar ops per group (the unit test does it
    and sanity-checks the fit); the emitted moments stay integer-exact so
    the driver gate is bit-for-bit.

    Scale: one shuffle on custkey for the dimension join (broadcast at
    oracle SF), then a partial+final agg keyed by the tiny segment
    domain; int64 holds to ~1e18 cell sums — beyond that the moment
    columns move to DECIMAL(38,0), same note as the apportionment."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d = F.expr("unix_micros(o_orderdate) DIV 86400000000").cast("bigint")
    p = (F.col("o_totalprice") * 100).cast("bigint")
    f = o.select("o_custkey", d.alias("d"), p.alias("p"))
    return (
        f.join(c, f.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum("d").cast("bigint").alias("s_x"),
            F.sum("p").cast("bigint").alias("s_y"),
            F.sum(F.col("d") * F.col("d")).cast("bigint").alias("s_xx"),
            F.sum(F.col("d") * F.col("p")).cast("bigint").alias("s_xy"),
        )
    )


@query(
    "data_quality_report",
    oracle="""
    SELECT 'customer' AS table_name, 'c_custkey_unique' AS constraint_name,
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS violations,
           CAST(COUNT(*) AS BIGINT) AS total,
           COUNT(*) = COUNT(DISTINCT c_custkey) AS passed
    FROM customer
    UNION ALL
    SELECT 'orders', 'o_custkey_in_customer',
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders', 'o_totalprice_positive',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                    THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'lineitem', 'l_quantity_in_1_50',
           CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                         OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                    OR l_quantity > 50 THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'l_orderkey_in_orders',
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'documents', 'text_nonempty',
           CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN text IS NULL OR length(text) = 0
                    THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'events', 'ts_nonnull',
           CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) = 0
    FROM events
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint verification: one row per declared constraint
    with its violation count, row total, and PASS verdict — uniqueness of
    the customer key, referential integrity orders->customer and
    lineitem->orders, value-range and positivity rules, non-empty text,
    non-null event timestamps. This is the admission gate a production
    pipeline runs before a snapshot is published (the generalization of the
    reference's status/content-type admission check, index.py:130-131, from
    per-page to per-dataset).

    Scale: every column rule is a single-pass partial aggregate over its
    own scan (conditional sums — no distinct explosion; uniqueness uses
    count vs count(distinct) which Spark plans as one partial_count +
    partial-distinct agg, not a self-join). The two referential checks are
    the only shuffles, each keyed on the join key it validates, and the
    dimension side broadcasts when small. Output is one row per rule —
    metadata-sized however large the tables — so the report can run on
    every ingest batch."""
    return data_quality_rules(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "events"),
    )


def data_quality_rules(
    c: DataFrame, o: DataFrame, li: DataFrame, d: DataFrame, e: DataFrame
) -> DataFrame:
    """The constraint battery behind `data_quality_report`, on caller-
    supplied frames — separable so tests can feed crafted violating data
    and assert the rules actually count (the report over the clean fixture
    alone would be vacuously green)."""

    def report(table: str, name: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(table).alias("table_name"),
            F.lit(name).alias("constraint_name"),
            F.col("violations").cast("bigint").alias("violations"),
            F.col("total").cast("bigint").alias("total"),
            (F.col("violations") == 0).alias("passed"),
        )

    def rule(df: DataFrame, bad: F.Column) -> DataFrame:
        return df.agg(
            F.sum(bad.cast("bigint")).alias("violations"),
            F.count("*").alias("total"),
        )

    uniq = c.agg(
        (F.count("*") - F.countDistinct("c_custkey")).alias("violations"),
        F.count("*").alias("total"),
    )
    o_ref = rule(
        o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == c.c_custkey, "left"),
        F.col("c_custkey").isNull(),
    )
    l_ref = rule(
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left"),
        F.col("o_orderkey").isNull(),
    )
    return (
        report("customer", "c_custkey_unique", uniq)
        .unionByName(report("orders", "o_custkey_in_customer", o_ref))
        .unionByName(
            report(
                "orders",
                "o_totalprice_positive",
                rule(o, F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)),
            )
        )
        .unionByName(
            report(
                "lineitem",
                "l_quantity_in_1_50",
                rule(
                    li,
                    F.col("l_quantity").isNull()
                    | (F.col("l_quantity") < 1)
                    | (F.col("l_quantity") > 50),
                ),
            )
        )
        .unionByName(report("lineitem", "l_orderkey_in_orders", l_ref))
        .unionByName(
            report(
                "documents",
                "text_nonempty",
                rule(d, F.col("text").isNull() | (F.length("text") == 0)),
            )
        )
        .unionByName(
            report("events", "ts_nonnull", rule(e, F.col("ts").isNull()))
        )
    )


from .registry import get as _get_registered  # noqa: E402  (needs prior defs)

# Bloom prefilter sizing for the contamination join: 2^17 bits, 2 xxhash64
# probes. Spark-side only — the filter never changes the RESULT (no false
# negatives), so the oracle is the exact join's, verbatim.
_DECON_BLOOM_M, _DECON_BLOOM_K = 1 << 17, 2


@query(
    "bloom_prefilter_contamination",
    oracle=_get_registered("benchmark_contamination").oracle,
)
def bloom_prefilter_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`benchmark_contamination` with the production 100 TB join strategy:
    a Bloom filter built over the benchmark grams fronts the exact join, so
    the train-split gram table — the corpus-scale side — is pruned MAP-SIDE
    before any shuffle. Each of the k=2 bit probes is a broadcast semi-join
    against the <= m-row set-bit table (xxhash64 positions; Spark-side only,
    so no cross-engine hash constraint), i.e. the whole membership test
    runs inside the scan stage; only bloom-positive train grams (true hits
    + the bounded FP leakage) reach the exchange. Because a Bloom filter
    has no false negatives, every train gram that matches a benchmark gram
    survives the prefilter — the final LEFT JOIN result is bit-identical
    to the exact query, which is why this reuses benchmark_contamination's
    oracle verbatim. tests assert the plan shape (broadcast probes feeding
    the exchange) and the realized pruning ratio."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize("text").alias("toks")).filter(F.size("toks") >= 3)
    idx = F.sequence(F.lit(1), F.size("toks") - 2)
    gram_hash = F.conv(
        F.substring(F.md5(F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(3)))), 1, 15),
        16, 10,
    ).cast("bigint")
    grams = (
        toks.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select("doc_id", gram_hash.alias("gram"))
        .distinct()
    )
    bench = grams.filter(F.col("doc_id") % 10 == 0)
    train = grams.filter(F.col("doc_id") % 10 != 0).select("gram")

    def bit(i: int, col) -> F.Column:
        return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(_DECON_BLOOM_M))

    # the filter state: distinct set bits of the benchmark grams (<= m rows)
    bits = [
        bench.select(bit(i, F.col("gram")).alias(f"__b{i}")).distinct()
        for i in range(_DECON_BLOOM_K)
    ]
    # k map-side membership probes: broadcast semi-join per bit position —
    # no shuffle of the train side anywhere before the final exact join
    survivors = train
    for i, b in enumerate(bits):
        survivors = survivors.join(
            F.broadcast(b), bit(i, F.col("gram")) == F.col(f"__b{i}"), "left_semi"
        )
    rest = survivors.distinct()
    hit = F.when(F.col("hit_gram").isNotNull(), 1).otherwise(0)
    return (
        bench.join(
            rest.select(F.col("gram").alias("hit_gram")).hint("shuffle_hash"),
            F.col("gram") == F.col("hit_gram"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(hit).alias("n_contaminated"),
            (F.sum(hit).cast("double") / F.count("*") * 1e6)
            .cast("bigint")
            .alias("contamination_e6"),
        )
    )


@query(
    "skyline_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM orders d
        WHERE d.o_totalprice >= o.o_totalprice
          AND d.o_orderdate >= o.o_orderdate
          AND (d.o_totalprice > o.o_totalprice
               OR d.o_orderdate > o.o_orderdate)
    )
    """,
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of orders maximizing BOTH total price
    and recency: an order survives iff no other order is at least as
    expensive AND at least as recent with one strict — the multi-objective
    shortlist query (Borzsony/Kossmann/Stocker, ICDE 2001).

    The oracle states the semantics as the naive quadratic NOT EXISTS; the
    engine computes it linearly: per-date maxima (one partial-agg shuffle;
    at most one candidate per distinct date survives), then a running
    max over LATER dates via one window over the per-date frame — whose
    size is bounded by the calendar, not the table (~2.4k rows here, still
    ~2.4k at 100 TB; the audited-tiny-frame convention, cf. EXPLAIN.md).
    A point is on the skyline iff it is its date's max price and strictly
    beats every later date's max. Ties on both dimensions are mutually
    non-dominating, so the date-max JOIN back keeps all tied rows."""
    o = load_table(spark, sf_dir, "orders")
    per_date = o.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("__pmax")
    )
    w = (
        W.orderBy(F.desc("o_orderdate"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    frontier_dates = (
        per_date.withColumn("__later_max", F.max("__pmax").over(w))
        .filter(
            F.col("__later_max").isNull()
            | (F.col("__pmax") > F.col("__later_max"))
        )
        # fresh column names break the self-join lineage ambiguity
        .select(
            F.col("o_orderdate").alias("__fd_date"),
            F.col("__pmax").alias("__fd_pmax"),
        )
    )
    return (
        o.join(
            F.broadcast(frontier_dates),
            (F.col("o_orderdate") == F.col("__fd_date"))
            & (F.col("o_totalprice") == F.col("__fd_pmax")),
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "l_diversity_release",
    oracle="""
    SELECT c.c_nationkey, c.c_mktsegment,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS n_sensitive,
           COUNT(*) >= 10 AND COUNT(DISTINCT o.o_orderpriority) >= 3
               AS released,
           CASE WHEN COUNT(*) >= 10
                 AND COUNT(DISTINCT o.o_orderpriority) >= 3
                THEN CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
           END AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_nationkey, c.c_mktsegment, order_year
    """,
)
def l_diversity_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity suppression (Machanavajjhala et al. 2007), the guard
    k-anonymity misses: a QI group where every member shares the same
    sensitive value leaks it even at k>=10 (the homogeneity attack). A
    group releases only if it holds >= k=10 orders AND >= l=3 distinct
    order priorities; suppressed groups stay visible as (counts,
    released=false, revenue NULL) for auditability — the direct extension
    of k_anonymity_release one shelf over.

    Scale: identical plan shape to k_anonymity_release — broadcast
    customer join, one partial+final agg on the small QI domain; the
    distinct-sensitive count rides the same shuffle (Spark expands
    distinct aggregates in the single grouping pass). The release gate is
    a projection over the finished aggregate, never a second pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    k, l = 10, 3
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_orderpriority").cast("bigint").alias("n_sensitive"),
            _dsum(F.col("o_totalprice")).alias("__rev"),
        )
    )
    released = (F.col("n_orders") >= k) & (F.col("n_sensitive") >= l)
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "order_year",
        "n_orders",
        "n_sensitive",
        released.alias("released"),
        F.when(released, F.col("__rev")).alias("revenue"),
    )


@query(
    "incremental_rollup_merge",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, reduced to its algebraic core: the
    monthly revenue rollup is computed as the MERGE of two independently
    aggregated partitions of the fact (early-month days 1-15 vs late-month
    16+) — partial aggregate, union, re-aggregate — while the oracle
    computes the rollup directly in one pass. Equality IS the proof that
    the aggregate state merges associatively, which is the property every
    incremental pipeline (per-hour partials folded into daily, daily into
    monthly; late-arriving partition re-merge) silently relies on.

    The decimal money sum makes the merge exact (decimal addition is
    associative where double addition is not — merging float partials is
    the classic silent-drift bug this query exists to catch). Scale: this
    is the map-side-combine contract made explicit — each partial is a
    partition-local aggregate, the merge shuffles only group-sized rows;
    at 100 TB the partials are yesterday's materialized rollup plus
    today's delta, and only the merge re-runs."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.dayofmonth("o_orderdate").alias("dom"),
        "o_totalprice",
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("__rev"),
        )

    early = partial(o.filter(F.col("dom") <= 15))
    late = partial(o.filter(F.col("dom") > 15))
    return (
        early.unionByName(late)
        .groupBy("month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("__rev").cast("double").alias("revenue"),
        )
    )
