"""Scalar-function surface + specialty operators: JSON extraction, string/
date/math functions, unpivot, BPE-ish tokenization, as-of join, embedding
near-dup flags, approximate distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.similarity import cosine
from ..tables import load_table
from .registry import get as _get_registered, query


@query(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column handling: extract a field from the props JSON string and
    aggregate it (the engine's JSON surface — reference touches JSON only at
    the serialization boundary, api.py:38)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(k).alias("k_sum"), F.max(k).alias("k_max")
    )


@query(
    "scalar_function_showcase",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           reverse(c_name) AS name_rev,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           substr(c_mktsegment, 1, 4) AS seg4,
           length(c_name) AS name_len,
           abs(c_acctbal) AS bal_abs,
           ROUND(sqrt(abs(c_acctbal)), 6) AS bal_sqrt,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(sign(c_acctbal) AS DOUBLE) AS bal_sign,
           mod(c_custkey, 7) AS key_mod7,
           ROUND(power(1.05, mod(c_custkey, 10)), 6) AS growth
    FROM customer
    """,
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + math scalar-function surface, value-exact across engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.reverse("c_name").alias("name_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.substring("c_mktsegment", 1, 4).alias("seg4"),
        F.length("c_name").alias("name_len"),
        F.abs("c_acctbal").alias("bal_abs"),
        F.round(F.sqrt(F.abs("c_acctbal")), 6).alias("bal_sqrt"),
        F.ceil("c_acctbal").cast("bigint").alias("bal_ceil"),
        F.floor("c_acctbal").cast("bigint").alias("bal_floor"),
        F.signum("c_acctbal").alias("bal_sign"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
        F.round(F.pow(F.lit(1.05), F.col("c_custkey") % 10), 6).alias("growth"),
    )


@query(
    "date_function_showcase",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS INT) AS yr,
           CAST(extract(month FROM o_orderdate) AS INT) AS mon,
           CAST(extract(day FROM o_orderdate) AS INT) AS dom,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def date_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface on the order timeline."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@query(
    "unpivot_monthly_metrics",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(COUNT(*) AS DOUBLE) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
        FROM orders GROUP BY 1
    )
    SELECT month, metric, value
    FROM monthly UNPIVOT (value FOR metric IN (n_orders, total_price))
    """,
)
def unpivot_monthly_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot via stack() (the pivot inverse)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double").alias("total_price"),
    )
    return monthly.selectExpr(
        "month",
        "stack(2, 'n_orders', n_orders, 'total_price', total_price) AS (metric, value)",
    )


@query(
    "bpe_token_counts",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|\d+|[^\sa-zA-Z\d]+', 0)) AS n_bpe_tokens,
           len(regexp_extract_all(text, '\S+', 0)) AS n_ws_tokens
    FROM documents
    """,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish pre-tokenizer
    regex (letter runs / capitalized pieces / digit runs / punct runs) — the
    budget signal for LLM training-data pipelines."""
    d = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(r"[a-z]+|[A-Z][a-z]*|\d+|[^\sa-zA-Z\d]+"), 0)
    ws = F.regexp_extract_all("text", F.lit(r"\S+"), 0)
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
    )


@query(
    "asof_purchase_to_view",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, ts AS vts, event_id AS view_event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
    )
    SELECT p.user_id, p.ts, p.event_id,
           v.view_event_id, v.vts AS matched_ts
    FROM purchases p
    ASOF LEFT JOIN (SELECT user_id, vts, view_event_id FROM views WHERE rn = 1) v
      ON p.user_id = v.user_id AND p.ts >= v.vts
    """,
)
def asof_purchase_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior
    view (attribution). Spark has no native as-of join — composed from a
    union-tag + running last(ignorenulls) window (operators/asof.py), the
    same one-shuffle cost as a sort-merge join."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["view_event_id"],
        right_seq="view_event_id",
    )


@query(
    "asof_purchase_to_view_pandas",
    # same oracle as asof_purchase_to_view: the two registered variants are
    # alternative PHYSICAL strategies for the operator Spark lacks natively,
    # and must agree bit-for-bit
    oracle=_get_registered("asof_purchase_to_view").oracle,
)
def asof_purchase_to_view_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join's second physical strategy: applyInPandas +
    pd.merge_asof per user group (operators/asof.py::asof_join_pandas) —
    the Arrow-batched escape hatch the union-window rewrite replaces in
    the hot path. Registered next to asof_purchase_to_view with the SAME
    oracle so the driver pins both strategies to identical results; the
    equivalence is also unit-tested (test_operators.py).

    Scale trade vs the union-window twin: one groupBy-key shuffle either
    way, but this variant crosses the JVM<->Python Arrow boundary and
    materializes each user's full (purchases + views) frame in pandas —
    right choice only when per-key frames are small and the logic outgrows
    SQL expressions; wrong choice for skewed keys (one hot user = one hot
    pandas task). That trade-off is the point of keeping both registered."""
    from ..operators.asof import asof_join_pandas

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    return asof_join_pandas(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["view_event_id"],
        right_seq="view_event_id",
    )


@query(
    "embedding_near_dups",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(
                 list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
                 6) AS cosine
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    )
    SELECT id_a, id_b, cosine, (cosine >= 0.9) AS is_near_dup FROM pairs
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup flags over a deterministic candidate set
    (adjacent ids; production candidates come from SRP-LSH buckets,
    operators/similarity.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1).select(
        "id_a", "id_b", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cosine")
    )
    return pairs.withColumn("is_near_dup", F.col("cosine") >= 0.9)


@query(
    "map_function_showcase",
    oracle="""
    WITH per AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus,
           COALESCE(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN n END), 0) AS urgent,
           COALESCE(MAX(CASE WHEN o_orderpriority = '5-LOW' THEN n END), 0) AS low,
           COUNT(*) AS n_priorities
    FROM per GROUP BY o_orderstatus
    """,
)
def map_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns in the plan: per status build a priority->count
    map (map_from_entries over collected structs), look up entries with
    element_at, count keys with size. The map is intermediate — outputs are
    scalars so the oracle compare stays deterministic (map key order is
    engine-specific)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    mapped = per.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderpriority", "n")))
        ).alias("prio_counts")
    )
    return mapped.select(
        "o_orderstatus",
        F.coalesce(F.element_at("prio_counts", "1-URGENT"), F.lit(0)).alias("urgent"),
        F.coalesce(F.element_at("prio_counts", "5-LOW"), F.lit(0)).alias("low"),
        F.size("prio_counts").alias("n_priorities"),
    )


@query("approx_distinct_users", oracle=None)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct per event_type (rows-only: HLL
    estimates are engine-specific; tests/test_operators.py bounds the
    error against the exact count)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@query(
    "variant_props_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           CAST(MAX(user_id) AS BIGINT) AS u_max
    FROM events GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT type for semi-structured data: build a nested
    JSON document per event, parse it to a variant (`parse_json` — the
    binary-encoded type, not string re-parsing per access), and extract
    typed paths with `variant_get` ('$.meta.type', '$.id', '$.meta.u').
    The oracle aggregates the RAW columns — so the check certifies the
    variant round-trip (encode -> shred -> typed extract) preserved every
    value exactly; any loss or coercion in the variant path shifts the
    sums. This is the open-schema ingest shape (logs/telemetry with
    evolving payloads) where VARIANT replaces brittle per-field
    get_json_object string re-parsing (`json_props_stats` pins that older
    surface).

    Scale: parse_json is a per-row JVM expression, variant_get is
    O(path) over the binary encoding; no shuffle beyond the final small
    groupBy — at 100 TB the win over JSON strings is decode-once +
    columnar-friendly binary layout."""
    e = load_table(spark, sf_dir, "events")
    # to_json(struct(...)), not string concat: correct escaping for any
    # event_type content and per-field null handling for free
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(
                F.col("event_type").alias("type"), F.col("user_id").alias("u")
            ).alias("meta"),
        )
    )
    v = F.parse_json(doc)
    ex = e.select(
        F.variant_get(v, "$.meta.type", "string").alias("event_type"),
        F.variant_get(v, "$.id", "bigint").alias("id"),
        F.variant_get(v, "$.meta.u", "bigint").alias("u"),
    )
    return ex.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("id").cast("bigint").alias("id_sum"),
        F.max("u").cast("bigint").alias("u_max"),
    )
