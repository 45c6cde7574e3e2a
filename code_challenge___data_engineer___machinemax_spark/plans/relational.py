"""Generalized relational surface (SURVEY.md §2.4): joins, group-by aggs,
windows, set ops, rollup/cube/pivot, sort/limit/top-k, percentiles.

These generalize the reference's operators (frontier anti-join dedup
index.py:117-119; whole-set count aggregations index.py:144,199-212; point
lookup apitestmongo.py:38) to the full batch-analytics surface over the
TPC-H-ish testdata tables.

Determinism rules for the DuckDB oracle gate:
- Money sums aggregate in DECIMAL(20,4) (exact, order-independent) and cast
  the result to DOUBLE — bit-identical across engines regardless of
  partitioning / aggregation order.
- Every LIMIT query carries a total deterministic ORDER BY (tie-break on a
  key column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.ranking import scalable_ntile
from ..tables import load_table
from .registry import query


def _dsum(col) -> F.Column:
    """Exact order-independent money sum: decimal accumulate, double out."""
    return F.sum(col.cast("decimal(20,4)")).cast("double")


def _dsum6(col) -> F.Column:
    """Like _dsum but scale-6, for PRODUCTS of money columns.

    price*(1-disc)*(1+tax) has exactly 6 decimal digits (2+2+2), so the
    double product is a scale-6 lattice point and casting to DECIMAL(24,6)
    never rounds — no HALF_UP (Spark) vs half-even (DuckDB) tie can occur.
    Casting the same product to scale 4 DOES round and diverges on .xxxx5
    ties (319 rows at sf0.01 — CORRECTNESS_r01 q1 failure)."""
    return F.sum(col.cast("decimal(24,6)")).cast("double")


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan + filter + hash agg.

    Scale: partial (map-side) aggregation then a 2-group shuffle — the
    canonical minimal-shuffle agg; filter and the 7-column projection push
    down to the parquet scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc_price = price * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(price).alias("sum_base_price"),
            _dsum6(disc_price).alias("sum_disc_price"),
            _dsum6(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "segment_order_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + group-by with count / count-distinct / sum / derived avg.

    Scale: customer is the small side at any SF ratio that matters here —
    broadcast it; the agg then needs only the 5-group shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    tp = _dsum(F.col("o_totalprice"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            tp.alias("total_price"),
            (tp / F.count("*")).alias("avg_price"),
        )
    )


@query(
    "rollup_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status, priority) -> status -> grand total."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), _dsum(F.col("o_totalprice")).alias("total_price")
    )


@query(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "grouping_sets_order_stats",
    oracle="""
    SELECT o_orderstatus, c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment), (o_orderstatus, c_mktsegment))
    """,
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube)."""
    import uuid

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    view = f"gs_orders_cust_{uuid.uuid4().hex[:8]}"
    o.join(F.broadcast(c), o.o_custkey == c.c_custkey).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderstatus, c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment),
                                (o_orderstatus, c_mktsegment))
        """
    )


@query(
    "segment_value_arrays",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_value_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: sorted distinct collection per group (collect_set
    is unordered — always sort before comparing or storing).

    The sorted array is emitted as a comma-joined string: the driver's
    canonicalizer hashes via a pandas sort, and list cells are unhashable
    there (CORRECTNESS_r01 harness error) — a deterministic string carries
    the same information and hashes everywhere."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
            F.count("*").alias("n"),
        )
    )


@query(
    "segments_above_avg",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS seg_total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, seg_total FROM seg
    WHERE seg_total > (SELECT AVG(seg_total) FROM seg)
    """,
)
def segments_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: segments whose revenue exceeds the cross-
    segment average (computed once, broadcast into the filter)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    import uuid

    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(_dsum(F.col("o_totalprice")).alias("seg_total"))
    )
    view = f"seg_totals_{uuid.uuid4().hex[:8]}"
    seg.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c_mktsegment, seg_total FROM {view} "
        f"WHERE seg_total > (SELECT AVG(seg_total) FROM {view})"
    )


@query(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (o_orderpriority = '1-URGENT')        AS p1_urgent,
           COUNT(*) FILTER (o_orderpriority = '2-HIGH')          AS p2_high,
           COUNT(*) FILTER (o_orderpriority = '3-MEDIUM')        AS p3_medium,
           COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
           COUNT(*) FILTER (o_orderpriority = '5-LOW')           AS p5_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (priority columns per status row) with explicit pivot values —
    explicit values keep the plan single-pass (no distinct-values pre-scan)."""
    o = load_table(spark, sf_dir, "orders")
    names = {
        "1-URGENT": "p1_urgent",
        "2-HIGH": "p2_high",
        "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_not_specified",
        "5-LOW": "p5_low",
    }
    df = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(names))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    for old, new in names.items():
        df = df.withColumnRenamed(old, new)
    return df


@query(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        *[
            F.round(F.percentile(F.col("o_totalprice"), F.lit(q)), 4).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.50, 0.75, 0.90)
        ]
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join, filters on both fact sides, top-10.

    Scale: the customer filter broadcasts; orders⋈lineitem is the real
    shuffle on orderkey; top-k is a TakeOrderedAndProject (no global sort).
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
                  JOIN nation   ON c_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-table star join, local-supplier condition, agg.

    Scale: all dims (customer/supplier/nation/region) broadcast; the only
    big shuffle is orders⋈lineitem on orderkey. Region filter prunes before
    the join via broadcast-join pushdown.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "top_customers_by_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after join+agg; deterministic tie-break on key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the reference's frontier-dedup operator generalized
    (index.py:117-119,162-172: 'never process a URL twice')."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@query(
    "region_customer_counts",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def region_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain broadcast join (customer⋈nation⋈region)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), _dsum(F.col("c_acctbal")).alias("total_acctbal"))
    )


@query(
    "brand_lineitem_stats",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def brand_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim broadcast join + agg on the dim attribute."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins upsert semantics via row_number — the engine's Parquet
    equivalent of the reference's update-by-key (apitestmongo.py:53)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "monthly_revenue_running",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(20,4))) OVER (
               ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_revenue
    FROM monthly
    """,
)
def monthly_revenue_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg then cumulative window (running total over months)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(_dsum(F.col("o_totalprice")).alias("revenue"))
    )
    w = W.orderBy("month").rowsBetween(W.unboundedPreceding, W.currentRow)
    return monthly.withColumn(
        "running_revenue", F.sum(F.col("revenue").cast("decimal(20,4)")).over(w).cast("double")
    )


@query(
    "order_rank_in_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rnk <= 5
    """,
)
def order_rank_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via rank window (the scalable 'top N per key')."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
    )


@query(
    "window_function_showcase",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           NTILE(4) OVER w AS quartile,
           -- trunc(): DuckDB's double->BIGINT cast rounds, Spark's truncates
           CAST(trunc((o_totalprice
                 - CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                            OVER (PARTITION BY o_custkey) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY o_custkey)) * 100) AS BIGINT)
               AS diff_from_cust_avg_c
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/ntile + partition-wide avg in one pass (all
    share a sort => a single window exchange)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.ntile(4).over(w).alias("quartile"),
        # avg via decimal window sum (association-order-proof), then scaled
        # TRUNCATION not round(): engines round the same double differently
        # at .5 boundaries (binary value vs shortest-repr), truncation of
        # identical doubles is always identical
        (
            (
                F.col("o_totalprice")
                - F.sum(F.col("o_totalprice").cast("decimal(20,4)")).over(wp).cast("double")
                / F.count(F.lit(1)).over(wp)
            )
            * 100
        )
        .cast("bigint")
        .alias("diff_from_cust_avg_c"),
    )


@query(
    "frequent_customers",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_spent
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def frequent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), _dsum(F.col("o_totalprice")).alias("total_spent"))
        .filter(F.col("n_orders") >= 15)
    )


# ---------------------------------------------------------------------------
# Events (time-series)
# ---------------------------------------------------------------------------

@query(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window aggregation (tumbling hour) over the events table; the
    batch twin of the streaming windowed agg in streaming/events.py."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("total_value"),
        )
    )


@query(
    "event_sessions",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM gaps
    )
    SELECT user_id, session_no, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_no
    """,
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap via lag + running sum —
    the batch form of streaming session windows."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    new_session = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(run))
        .groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@query(
    "purchasers_who_errored",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def purchasers_who_errored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    x = e.filter(F.col("event_type") == "error").select("user_id")
    return p.intersect(x)


@query(
    "viewers_never_purchased",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def viewers_never_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op."""
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    return v.subtract(p)


@query(
    "all_active_users",
    oracle="""
    SELECT DISTINCT user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id FROM events WHERE event_type = 'signup'
    )
    """,
)
def all_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + DISTINCT (the crawl-round union, op 25 generalized)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    s = e.filter(F.col("event_type") == "signup").select("user_id")
    return p.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# Point lookup / sort-limit
# ---------------------------------------------------------------------------

@query(
    "point_lookup_order",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey = 421",
)
def point_lookup_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key (reference find_one by _id, apitestmongo.py:38);
    the key predicate pushes down to the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") == 421).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "most_recent_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 25
    """,
)
def most_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit -> TakeOrderedAndProject (no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Distribution / cohort shapes (round 3)
# ---------------------------------------------------------------------------

@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer via left join (customers with
    zero orders count as 0), then the distribution of those counts. Two
    cascaded aggregations; the second groups on a tiny int domain, so the
    heavy shuffle is only the first (custkey) one."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "decile_revenue_share",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT o_custkey, revenue,
               ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
        FROM rev
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(revenue AS DECIMAL(20,4))) AS DOUBLE) AS decile_revenue
    FROM ranked GROUP BY decile
    """,
)
def decile_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: per-customer revenue (exact decimal sum),
    decile assignment under a total deterministic order (revenue desc,
    custkey tie-break — ntile is only reproducible under a total order),
    then per-decile customer counts and exact revenue.

    The decile is NOT a global ``ntile(10)`` window (that pulls every
    customer onto one task — the r3 ``WindowExec: No Partition Defined``
    warning); it is ``operators.ranking.scalable_ntile``: range-repartition
    on the order keys, per-range local row_number, broadcast prefix-sum
    offsets, and exact integer NTILE arithmetic — bit-identical to the
    oracle's ntile, fully distributed."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(_dsum(F.col("o_totalprice")).alias("revenue"))
    ranked = scalable_ntile(
        rev, 10, [F.desc("revenue"), F.asc("o_custkey")], tile_col="decile"
    )
    return ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        _dsum(F.col("revenue")).alias("decile_revenue"),
    )


@query(
    "repeat_purchase_interval",
    oracle="""
    WITH gaps AS (
        SELECT c.c_mktsegment,
               epoch_us(o.o_orderdate)
                 - LAG(epoch_us(o.o_orderdate))
                     OVER (PARTITION BY o.o_custkey
                           ORDER BY o.o_orderdate, o.o_orderkey) AS gap_us
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY c_mktsegment
    """,
)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean time between consecutive orders per market segment: lag over
    (custkey, orderdate) windows -> exact integer microsecond gaps ->
    per-segment totals. Exact-sum discipline: gap sums are int64
    (order-independent); the avg is ONE double division at the end, not a
    re-associating double sum."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    us = F.unix_micros(F.col("o_orderdate"))
    gaps = (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("total_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("*")).cast("double").alias("avg_gap_us"),
    )


@query(
    "user_value_rolling_1h",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(trunc(value * 1000000) AS BIGINT)) OVER w AS BIGINT) AS v_e6_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def user_value_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour rolling totals per user at event granularity — the
    RANGE-interval window frame (value-based, not row-based: frame
    membership is `ts within the last hour`, so ties and gaps behave
    correctly where a ROWS frame would not). Ordering key is exact integer
    microseconds and the value sum is scaled-int, so frame membership and
    the checked outputs are bit-identical cross-engine.

    Scale: one hash partition by user_id; within a partition the frame is
    maintained incrementally by the window operator (no per-row rescan)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    v_e6 = F.expr("CAST(value * 1e6 AS BIGINT)")
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.sum(v_e6).over(w).cast("bigint").alias("v_e6_1h"),
    )


@query(
    "scd2_priority_history",
    oracle="""
    WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
               CASE WHEN LAG(o_orderpriority) OVER w IS DISTINCT FROM
                         o_orderpriority THEN 1 ELSE 0 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    grouped AS (
        SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM flagged
    ),
    islands AS (
        SELECT o_custkey, o_orderpriority, grp,
               MIN(o_orderdate) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM grouped
        GROUP BY o_custkey, o_orderpriority, grp
    )
    SELECT o_custkey, o_orderpriority, valid_from,
           LEAD(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY valid_from, grp) AS valid_to,
           n_orders,
           LEAD(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY valid_from, grp) IS NULL AS is_current
    FROM islands
    """,
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension reconstruction from an event log —
    the gaps-and-islands shape: consecutive orders with the same priority
    collapse into one validity interval [valid_from, valid_to), the lead
    boundary closes each interval, and the open interval is the current
    state. (The streaming twin of this discipline is the article store's
    versioned upsert; this is the warehouse-side history view.)

    Scale: two windows and one aggregation, all partitioned by the customer
    key — per-customer partitions are order-history-sized, no global window
    anywhere.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.withColumn(
        "chg",
        F.when(
            ~F.lag("o_orderpriority").over(w).eqNullSafe(F.col("o_orderpriority")), 1
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "grp", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    islands = grouped.groupBy("o_custkey", "o_orderpriority", "grp").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").alias("n_orders"),
    )
    w2 = W.partitionBy("o_custkey").orderBy("valid_from", "grp")
    return islands.select(
        "o_custkey",
        "o_orderpriority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_orders",
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


@query(
    "pit_priority_revenue",
    oracle="""
    WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
               CASE WHEN LAG(o_orderpriority) OVER w IS DISTINCT FROM
                         o_orderpriority THEN 1 ELSE 0 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    grouped AS (
        SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM flagged
    ),
    islands AS (
        SELECT o_custkey, o_orderpriority, grp,
               MIN(o_orderdate) AS valid_from
        FROM grouped
        GROUP BY o_custkey, o_orderpriority, grp
    ),
    hist AS (
        SELECT o_custkey, o_orderpriority, valid_from,
               LEAD(valid_from) OVER (PARTITION BY o_custkey
                                      ORDER BY valid_from, grp) AS valid_to
        FROM islands
    ),
    f AS (
        SELECT o.o_custkey, l.l_shipdate,
               CAST(l.l_extendedprice AS DECIMAL(20,4)) AS price
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT COALESCE(h.o_orderpriority, 'none') AS priority_at_ship,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(f.price) AS DOUBLE) AS revenue
    FROM f LEFT JOIN hist h
      ON h.o_custkey = f.o_custkey
     AND f.l_shipdate >= h.valid_from
     AND (h.valid_to IS NULL OR f.l_shipdate < h.valid_to)
    GROUP BY priority_at_ship
    """,
)
def pit_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correct dimension join — the canonical warehouse
    operation over an SCD2 history: each lineitem is attributed to the
    priority regime its CUSTOMER was in WHEN THE LINE SHIPPED (not the
    current or the order-time value), by joining the shipment date into
    the validity intervals scd2_priority_history reconstructs. A line
    shipping before the customer's first interval maps to 'none'.

    The Spark side does NOT run the oracle's interval theta-join: because
    SCD2 intervals are consecutive, interval membership == backward as-of
    match on valid_from, so the plan is operators.asof.asof_join — one
    union + per-customer running window, a sort-merge-join-shaped cost
    with no range predicate anywhere (the same rewrite discipline as
    session_peak_overlap). Degenerate zero-length islands (two priority
    changes on one date) are dropped first — they can never match an
    interval query, which also makes (custkey, valid_from) unique, the
    as-of precondition."""
    from ..operators.asof import asof_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    hist = scd2_priority_history(spark, sf_dir).filter(
        F.col("valid_to").isNull() | (F.col("valid_to") != F.col("valid_from"))
    )
    f = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_custkey",
        "l_shipdate",
        F.col("l_extendedprice").cast("decimal(20,4)").alias("price"),
    )
    pit = asof_join(
        f,
        hist.select("o_custkey", "valid_from", "o_orderpriority"),
        on="o_custkey",
        left_ts="l_shipdate",
        right_ts="valid_from",
        value_cols=["o_orderpriority"],
    )
    return pit.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("none")).alias("priority_at_ship")
    ).agg(
        F.count("*").alias("n_lines"),
        F.sum("price").cast("double").alias("revenue"),
    )


@query(
    "rfm_segment_counts",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(epoch_us(MAX(o_orderdate)) // 86400000000 AS BIGINT) AS recency_day,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT ntile(5) OVER (ORDER BY recency_day, o_custkey) AS r_tile,
               ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_tile,
               ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_tile
        FROM per_cust
    )
    SELECT r_tile, f_tile, m_tile, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r_tile, f_tile, m_tile
    """,
)
def rfm_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency / frequency / monetary quintiles per
    customer (tile 5 = most recent / most frequent / highest spend under
    ascending ntile order), rolled up to the 125-cell segment grid a
    marketing or cohort pipeline consumes. Three corpus-wide NTILEs, each
    under a total order with the custkey tie-break.

    Scale: every quintile is operators.ranking.scalable_ntile (range
    exchange + offset arithmetic) — three global rankings, ZERO
    unpartitioned windows; recency is an exact integer epoch-day and
    monetary is the DECIMAL-summed double, both engine-portable order
    keys."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.expr("unix_micros(MAX(o_orderdate)) DIV 86400000000")
        .cast("bigint").alias("recency_day"),
        F.count("*").cast("bigint").alias("frequency"),
        _dsum(F.col("o_totalprice")).alias("monetary"),
    )
    scored = scalable_ntile(
        per_cust, 5, [F.asc("recency_day"), F.asc("o_custkey")], tile_col="r_tile"
    )
    scored = scalable_ntile(
        scored, 5, [F.asc("frequency"), F.asc("o_custkey")], tile_col="f_tile"
    )
    scored = scalable_ntile(
        scored, 5, [F.asc("monetary"), F.asc("o_custkey")], tile_col="m_tile"
    )
    return scored.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )


@query(
    "churn_label_table",
    oracle="""
    WITH cutoff AS (
        SELECT MAX(o_orderdate) - INTERVAL 90 DAY AS cut FROM orders
    ),
    feats AS (
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN o.o_orderdate > cutoff.cut THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_recent
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        CROSS JOIN cutoff
        GROUP BY c.c_custkey, c.c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_orders > 0 AND n_recent = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned,
           CAST(SUM(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_never_active,
           CAST(trunc(CAST(SUM(CASE WHEN n_orders > 0 AND n_recent = 0
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) * 1e6) AS BIGINT) AS churn_rate_e6
    FROM feats GROUP BY c_mktsegment
    """,
)
def churn_label_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-label generation — the label-engineering step of a tabular-ML
    pipeline: a customer is CHURNED if they have order history but
    nothing in the 90 days before the corpus horizon (max order date);
    never-active customers are a separate class, not churn. Rolled up per
    segment as the class-balance report a trainer reads before fitting
    (the per-customer label table is the pre-rollup frame).

    Scale: the horizon is a 1-row broadcast; one left join on custkey +
    two aggregations with tiny group domains; the churn predicate is a
    pure projection over the per-customer counts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cutoff = o.agg(
        F.date_sub(F.max("o_orderdate").cast("date"), 90).alias("cut_d")
    ).select(F.col("cut_d").cast("timestamp").alias("cut"))
    feats = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .crossJoin(F.broadcast(cutoff))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
            F.sum((F.col("o_orderdate") > F.col("cut")).cast("int"))
            .cast("bigint").alias("n_recent"),
        )
        .withColumn("n_recent", F.coalesce(F.col("n_recent"), F.lit(0)))
    )
    churned = (F.col("n_orders") > 0) & (F.col("n_recent") == 0)
    return feats.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum(churned.cast("int")).cast("bigint").alias("n_churned"),
        F.sum((F.col("n_orders") == 0).cast("int")).cast("bigint").alias("n_never_active"),
        (F.sum(churned.cast("int")).cast("double") / F.count("*") * 1e6)
        .cast("bigint").alias("churn_rate_e6"),
    )


@query(
    "global_exact_quantiles",
    oracle="""
    WITH vals AS (
        SELECT CAST(trunc(l_extendedprice * 100) AS BIGINT) AS v_c
        FROM lineitem
    ),
    ranked AS (
        SELECT v_c, ROW_NUMBER() OVER (ORDER BY v_c) AS rn FROM vals
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
    ps(p) AS (VALUES (25), (50), (75), (90), (99)),
    idx AS (
        SELECT p, n,
               ((n - 1) * p) // 100 + 1 AS lo_rn,
               LEAST(((n - 1) * p) // 100 + 2, n) AS hi_rn,
               ((n - 1) * p) % 100 AS rem
        FROM ps CROSS JOIN n
    )
    SELECT idx.p, idx.n,
           CAST(lo.v_c AS BIGINT) AS v_lo_c,
           CAST(hi.v_c AS BIGINT) AS v_hi_c,
           CAST(lo.v_c * 100 + idx.rem * (hi.v_c - lo.v_c) AS BIGINT)
               AS interp_c100
    FROM idx
    JOIN ranked lo ON lo.rn = idx.lo_rn
    JOIN ranked hi ON hi.rn = idx.hi_rn
    """,
)
def global_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles (P25/50/75/90/99, type-7 linear interpolation
    like quantile_cont) over the full fact table WITHOUT the two usual
    scale-killers: Spark's ungrouped ``percentile`` aggregate buffers every
    value in one reducer, and a global ``ORDER BY`` + row_number sorts on
    one partition. Here the selection runs through ``global_row_number``
    (range-repartition, per-partition windows, driver prefix over <=P
    partition counts), the five (lo, hi) neighbor ranks are computed as
    pure integer arithmetic from n, and one filter pass extracts <=10 rows.
    Exactness: interpolation is carried as the integer
    ``v_lo*100 + ((n-1)*p mod 100) * (v_hi - v_lo)`` in cent-hundredths —
    no floating interpolation to diverge.

    This is the missing middle between order_value_percentiles (exact, but
    per-GROUP agg buffers) and approx_order_percentiles (mergeable sketch,
    bounded error): exact AND distributed, at the cost of one extra
    pass (rank then select) — the classic distributed-selection trade."""
    from ..operators.ranking import global_row_number

    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.expr("CAST(l_extendedprice * 100 AS BIGINT)").alias("v_c"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked = global_row_number(
        vals,
        [F.col("v_c"), F.col("l_orderkey"), F.col("l_linenumber")],
        rank_col="rn",
        total_col="n_total",
    )
    n = vals.count()
    ps = [25, 50, 75, 90, 99]
    need = {}
    for p in ps:
        lo = ((n - 1) * p) // 100 + 1
        hi = min(lo + 1, n)
        rem = ((n - 1) * p) % 100
        need[p] = (lo, hi, rem)
    wanted = sorted({r for lo, hi, _ in need.values() for r in (lo, hi)})
    picked = {
        r["rn"]: r["v_c"]
        for r in ranked.filter(F.col("rn").isin(wanted)).select("rn", "v_c").collect()
    }
    rows = []
    for p in ps:
        lo, hi, rem = need[p]
        v_lo, v_hi = picked[lo], picked[hi]
        rows.append((p, n, v_lo, v_hi, v_lo * 100 + rem * (v_hi - v_lo)))
    return spark.createDataFrame(
        rows, "p int, n bigint, v_lo_c bigint, v_hi_c bigint, interp_c100 bigint"
    )


@query(
    "observed_pipeline_metrics",
    oracle="""
    SELECT * FROM (
        SELECT 'raw_rows' AS metric, CAST(COUNT(*) AS BIGINT) AS value
        FROM documents
        UNION ALL
        SELECT 'admitted_rows', CAST(COUNT(*) AS BIGINT)
        FROM documents WHERE n_chars >= 200 AND lang = 'en'
        UNION ALL
        SELECT 'admitted_chars', CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
        FROM documents WHERE n_chars >= 200 AND lang = 'en'
    ) ORDER BY metric
    """,
)
def observed_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-embedded observability via Spark's ``observe()`` /
    ``Observation`` API: the admission filter's before/after counters are
    attached to the SAME job that executes the pipeline (piggybacked on
    the scan — metrics cost zero extra passes), instead of the separate
    audit scans a naive metrics layer runs. This is how a production
    curation job reports its funnel without doubling its I/O; the
    dedicated-audit twin is pipeline_funnel_report, which pays one scan
    per stage readout by design.

    The oracle recomputes the same counters relationally, pinning that
    observed metrics == a second pass's answer (Spark guarantees observe
    metrics reflect exactly the rows that flowed past the observation
    point in the action)."""
    from pyspark.sql import Observation

    d = load_table(spark, sf_dir, "documents")
    obs_raw = Observation("raw")
    obs_adm = Observation("admitted")
    staged = (
        d.observe(obs_raw, F.count(F.lit(1)).alias("raw_rows"))
        .filter((F.col("n_chars") >= 200) & (F.col("lang") == "en"))
        .observe(
            obs_adm,
            F.count(F.lit(1)).alias("admitted_rows"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("admitted_chars"),
        )
    )
    staged.write.format("noop").mode("overwrite").save()  # the real action
    rows = [
        ("raw_rows", int(obs_raw.get["raw_rows"])),
        ("admitted_rows", int(obs_adm.get["admitted_rows"])),
        ("admitted_chars", int(obs_adm.get["admitted_chars"])),
    ]
    return (
        spark.createDataFrame(rows, "metric string, value bigint")
        .orderBy("metric")
    )
