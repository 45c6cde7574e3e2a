"""ML feature-engineering shapes: leakage-free target encoding, recency-
weighted (EWMA) customer features, and a moment-based correlation matrix.

These are the tabular-feature operations a training-data pipeline runs after
the corpus-level filters: encode high-cardinality categoricals against the
label without self-leakage (leave-one-out), summarize per-entity behavior
with exponentially decayed recency weights, and profile feature redundancy
(pairwise correlation) before training. Every oracle is exact: the encodings
are carried as (numerator, denominator) integer pairs plus an integer floor
division, the EWMA uses dyadic (power-of-two) weights so the smoothed value
is itself an integer, and correlation is assembled from exact integer
moments by one shared arithmetic expression, so both engines evaluate the
identical IEEE-754 tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query


@query(
    "loo_target_encoding",
    oracle="""
    WITH joined AS (
        SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment AS segment,
               CAST(trunc(o.o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), enc AS (
        SELECT o_orderkey, c_custkey, segment, price_c,
               SUM(price_c) OVER (PARTITION BY segment) - price_c AS loo_sum_c,
               COUNT(*) OVER (PARTITION BY segment) - 1 AS loo_n
        FROM joined
    )
    SELECT o_orderkey, segment, price_c,
           CAST(loo_sum_c AS BIGINT) AS loo_sum_c,
           CAST(loo_n AS BIGINT) AS loo_n,
           CAST(loo_sum_c // loo_n AS BIGINT) AS loo_mean_c
    FROM enc WHERE c_custkey < 100
    """,
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the market segment against order
    value: each order's encoding is the mean order value of its segment
    EXCLUDING the order itself — the standard leakage guard when the
    encoded feature feeds a model trained on these same rows.

    Scale: one shuffle on the (low-cardinality) segment key computes the
    segment total and count as window aggregates over the orders x customer
    broadcast join; the per-row encoding is then pure arithmetic (total -
    self) / (n - 1) with no second pass. The encodings are emitted as exact
    integers — cent-scaled numerator, count denominator, and an integer
    floor-division mean — so the oracle compare is bit-exact. Output is
    bounded to the first 100 customers' orders; the window itself runs over
    the full table (the statistics must see every row). At 100 TB the
    segment-partitioned window is a handful of partitions — if the segment
    count were 1, the same shape becomes a single global agg broadcast back,
    which AQE already picks for the degenerate case."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(o_totalprice * 100 AS BIGINT)").alias("price_c"),
    )
    w = W.partitionBy("segment")
    enc = joined.select(
        "o_orderkey",
        "c_custkey",
        "segment",
        "price_c",
        (F.sum("price_c").over(w) - F.col("price_c")).alias("loo_sum_c"),
        (F.count("*").over(w) - F.lit(1)).alias("loo_n"),
    )
    return enc.filter(F.col("c_custkey") < 100).select(
        "o_orderkey",
        "segment",
        "price_c",
        "loo_sum_c",
        "loo_n",
        F.expr("loo_sum_c DIV loo_n").alias("loo_mean_c"),
    )


@query(
    "ewma_order_values",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               o_orderdate,
               CAST(trunc(o_totalprice * 100) AS BIGINT) AS price_c,
               LAG(CAST(trunc(o_totalprice * 100) AS BIGINT), 1)
                   OVER w AS lag1,
               LAG(CAST(trunc(o_totalprice * 100) AS BIGINT), 2)
                   OVER w AS lag2,
               LAG(CAST(trunc(o_totalprice * 100) AS BIGINT), 3)
                   OVER w AS lag3,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_desc
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey AS custkey, o_orderdate AS last_orderdate,
           CAST(8 * price_c + 4 * COALESCE(lag1, 0)
                + 2 * COALESCE(lag2, 0) + COALESCE(lag3, 0) AS BIGINT)
               AS ewma8_c
    FROM seq WHERE rn_desc = 1
    """,
)
def ewma_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted customer spend: an exponentially weighted moving
    average (decay 1/2, depth 4) over each customer's order sequence,
    evaluated at their latest order — the classic recency feature for churn
    and LTV models.

    The weights are dyadic (8x + 4x_-1 + 2x_-2 + x_-3 on cent-scaled
    integers), so the smoothed value is an exact integer — no float
    accumulation, hence bit-exact across engines. Scale: a single window
    shuffle on o_custkey produces both the lag terms and the latest-row
    rank in one pass (two frames over the same partitioning reuse the same
    exchange); output is one row per customer — dimension-sized, not
    fact-sized. Truncating the decay at depth 4 is what makes a streaming
    refresh cheap: the feature needs only the last 4 orders per key, not
    an unbounded state."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "price_c", F.expr("CAST(o_totalprice * 100 AS BIGINT)")
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_desc = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        "price_c",
        F.lag("price_c", 1).over(w).alias("lag1"),
        F.lag("price_c", 2).over(w).alias("lag2"),
        F.lag("price_c", 3).over(w).alias("lag3"),
        F.row_number().over(w_desc).alias("rn_desc"),
    )
    return seq.filter(F.col("rn_desc") == 1).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("last_orderdate"),
        (
            8 * F.col("price_c")
            + 4 * F.coalesce("lag1", F.lit(0))
            + 2 * F.coalesce("lag2", F.lit(0))
            + F.coalesce("lag3", F.lit(0))
        ).alias("ewma8_c"),
    )


_CORR_EXPR = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


@query(
    "numeric_correlation_matrix",
    oracle=f"""
    WITH base AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(trunc(l_extendedprice) AS BIGINT) AS p,
               CAST(trunc(l_discount * 100) AS BIGINT) AS d
        FROM lineitem
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(q * q) AS BIGINT) AS sqq,
               CAST(SUM(p * p) AS BIGINT) AS spp,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(q * p) AS BIGINT) AS sqp,
               CAST(SUM(q * d) AS BIGINT) AS sqd,
               CAST(SUM(p * d) AS BIGINT) AS spd
        FROM base
    ), pairs AS (
        SELECT 'quantity' AS var_x, 'price' AS var_y,
               n, sq AS sx, sp AS sy, sqq AS sxx, spp AS syy, sqp AS sxy
        FROM m
        UNION ALL
        SELECT 'quantity', 'discount', n, sq, sd, sqq, sdd, sqd FROM m
        UNION ALL
        SELECT 'price', 'discount', n, sp, sd, spp, sdd, spd FROM m
    )
    SELECT var_x, var_y, n, sxy, {_CORR_EXPR} AS corr
    FROM pairs
    """,
)
def numeric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem numeric features
    (quantity, whole-dollar price, percent discount) — the feature-
    redundancy profile computed before training.

    Rather than calling each engine's native corr() — whose streaming
    accumulation order makes the last ulp engine-dependent — the plan
    reduces the table to exact integer moments (n, Σx, Σx², Σxy per pair)
    in ONE map-side-combinable aggregate pass, then assembles every
    correlation from those integers with a single shared arithmetic
    expression: identical integer inputs + identical IEEE expression tree
    = bit-identical doubles on both engines. Scale: one scan, one partial/
    final agg to a single moments row (bytes, not rows, cross the shuffle);
    the 3x3 matrix is driver-side arithmetic on that row. Moment sums are
    int64-safe to ~10^4 x this SF on the scaled units chosen; beyond that
    the same plan swaps the sums to DECIMAL(38,0) unchanged."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        F.expr("CAST(l_extendedprice AS BIGINT)").alias("p"),
        F.expr("CAST(l_discount * 100 AS BIGINT)").alias("d"),
    )
    m = li.agg(
        F.count("*").alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum(F.expr("q * q")).alias("sqq"),
        F.sum(F.expr("p * p")).alias("spp"),
        F.sum(F.expr("d * d")).alias("sdd"),
        F.sum(F.expr("q * p")).alias("sqp"),
        F.sum(F.expr("q * d")).alias("sqd"),
        F.sum(F.expr("p * d")).alias("spd"),
    )
    pairs = (
        m.select(
            F.lit("quantity").alias("var_x"), F.lit("price").alias("var_y"),
            "n", F.col("sq").alias("sx"), F.col("sp").alias("sy"),
            F.col("sqq").alias("sxx"), F.col("spp").alias("syy"),
            F.col("sqp").alias("sxy"),
        )
        .unionByName(
            m.select(
                F.lit("quantity").alias("var_x"), F.lit("discount").alias("var_y"),
                "n", F.col("sq").alias("sx"), F.col("sd").alias("sy"),
                F.col("sqq").alias("sxx"), F.col("sdd").alias("syy"),
                F.col("sqd").alias("sxy"),
            )
        )
        .unionByName(
            m.select(
                F.lit("price").alias("var_x"), F.lit("discount").alias("var_y"),
                "n", F.col("sp").alias("sx"), F.col("sd").alias("sy"),
                F.col("spp").alias("sxx"), F.col("sdd").alias("syy"),
                F.col("spd").alias("sxy"),
            )
        )
    )
    return pairs.select("var_x", "var_y", "n", "sxy", F.expr(_CORR_EXPR).alias("corr"))
