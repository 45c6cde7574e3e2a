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


# Long-form (feature, value, label) frame shared by the feature-selection
# scores: three candidate categorical features against the binary
# "returned" label, one scan of the joined fact.
_LONG_SQL = """
    SELECT feature, value, pos, n FROM (
        SELECT feature, value,
               CAST(SUM(CASE WHEN returned THEN 1 ELSE 0 END) AS BIGINT) AS pos,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT f.feature, f.value, l.l_returnflag = 'R' AS returned
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey,
            LATERAL (VALUES ('orderpriority', o.o_orderpriority),
                            ('mktsegment', c.c_mktsegment),
                            ('linestatus', l.l_linestatus)) AS f(feature, value)
        ) GROUP BY 1, 2
    )
"""


def _long_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(feature, value, pos, n) counts for the three candidate features vs
    the returned label — one scan, stack() replays the LATERAL VALUES."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.expr(
                "stack(3, 'orderpriority', o_orderpriority,"
                " 'mktsegment', c_mktsegment,"
                " 'linestatus', l_linestatus) AS (feature, value)"
            ),
            (F.col("l_returnflag") == "R").alias("returned"),
        )
    )
    return joined.groupBy("feature", "value").agg(
        F.sum(F.when(F.col("returned"), 1).otherwise(0)).cast("bigint").alias("pos"),
        F.count("*").cast("bigint").alias("n"),
    )


@query(
    "gini_feature_scores",
    oracle=f"""
    WITH long AS ({_LONG_SQL}),
    tot AS (
        SELECT feature, CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS npos
        FROM long GROUP BY feature
    ),
    contrib AS (
        SELECT l.feature,
               CAST(trunc(CAST(2 * l.pos * (l.n - l.pos) AS DOUBLE)
                    / CAST(l.n * t.nn AS DOUBLE) * 1e9) AS BIGINT) AS c_e9
        FROM long l JOIN tot t ON l.feature = t.feature
    )
    SELECT t.feature, CAST(v.n_values AS BIGINT) AS n_values, t.npos, t.nn,
           CAST(s.gini_e9 AS BIGINT) AS gini_e9
    FROM tot t
    JOIN (SELECT feature, COUNT(*) AS n_values FROM long GROUP BY 1) v
      ON t.feature = v.feature
    JOIN (SELECT feature, SUM(c_e9) AS gini_e9 FROM contrib GROUP BY 1) s
      ON t.feature = s.feature
    ORDER BY t.feature
    """,
)
def gini_feature_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-impurity feature scoring (the CART split criterion) of three
    categorical features against the binary returned label: weighted
    impurity = sum over values of 2*pos*neg/(n_v * N) — lower = the
    feature separates the label better.

    Scale: one fact scan fans out 3x via stack() (codegen, no UDF), then
    a single groupBy on (feature, value) — cardinality = the sum of the
    features' vocabularies, a dimension-sized frame; everything after is
    arithmetic on that tiny frame. Determinism: each value's contribution
    is computed from exact int64 counts by one shared expression and
    trunc-scaled to a BIGINT BEFORE the per-feature sum, so the
    accumulation is integer — engine summation order cannot change the
    result (the same idiom as numeric_correlation_matrix, which keeps
    floats out of aggregation entirely)."""
    long = _long_frame(spark, sf_dir)
    tot = long.groupBy("feature").agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("pos").cast("bigint").alias("npos"),
        F.count("*").cast("bigint").alias("n_values"),
    )
    contrib = long.join(F.broadcast(tot), "feature").select(
        "feature",
        F.expr(
            "CAST(CAST(2 * pos * (n - pos) AS DOUBLE)"
            " / CAST(n * nn AS DOUBLE) * 1e9 AS BIGINT)"
        ).alias("c_e9"),
    )
    gini = contrib.groupBy("feature").agg(
        F.sum("c_e9").cast("bigint").alias("gini_e9")
    )
    return (
        tot.join(gini, "feature")
        .select("feature", "n_values", "npos", "nn", "gini_e9")
        .orderBy("feature")
    )


@query(
    "chi2_feature_scores",
    oracle=f"""
    WITH long AS ({_LONG_SQL}),
    tot AS (
        SELECT feature, CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS npos
        FROM long GROUP BY feature
    ),
    cells AS (
        SELECT l.feature, l.value, lab.obs, l.n AS rt, lab.ct, t.nn
        FROM long l JOIN tot t ON l.feature = t.feature,
        LATERAL (VALUES (l.pos, t.npos), (l.n - l.pos, t.nn - t.npos))
            AS lab(obs, ct)
    ),
    contrib AS (
        SELECT feature,
               CAST(trunc(pow(CAST(obs * nn - rt * ct AS DOUBLE), 2)
                    / (CAST(rt * ct AS DOUBLE) * CAST(nn AS DOUBLE)) * 1e6)
                    AS BIGINT) AS c_e6
        FROM cells
    )
    SELECT t.feature, t.npos, t.nn, CAST(s.chi2_e6 AS BIGINT) AS chi2_e6
    FROM tot t
    JOIN (SELECT feature, SUM(c_e6) AS chi2_e6 FROM contrib GROUP BY 1) s
      ON t.feature = s.feature
    ORDER BY t.feature
    """,
)
def chi2_feature_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared feature/label association (the scikit-style univariate
    selection statistic) for the same three categorical features vs the
    returned label: sum over contingency cells of (obs-exp)^2/exp, written
    as (obs*N - rt*ct)^2 / (rt*ct*N) so every input is an exact int64.

    Scale: identical skeleton to gini_feature_scores — one stacked scan,
    one (feature, value) groupBy, then arithmetic on the vocabulary-sized
    frame; the 2-cell label fan-out is stack() again. The squared term is
    evaluated in double (the difference obs*N - rt*ct is int64-exact;
    its square may exceed 2^63, the double carries it), divided by the
    exact int64 denominator, trunc-scaled per cell, and integer-summed —
    order-independent."""
    long = _long_frame(spark, sf_dir)
    tot = long.groupBy("feature").agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("pos").cast("bigint").alias("npos"),
    )
    cells = long.join(F.broadcast(tot), "feature").select(
        "feature",
        F.expr(
            "stack(2, pos, npos, n - pos, nn - npos) AS (obs, ct)"
        ),
        F.col("n").alias("rt"),
        "nn",
    )
    contrib = cells.select(
        "feature",
        F.expr(
            "CAST(pow(CAST(obs * nn - rt * ct AS DOUBLE), 2)"
            " / (CAST(rt * ct AS DOUBLE) * CAST(nn AS DOUBLE)) * 1e6"
            " AS BIGINT)"
        ).alias("c_e6"),
    )
    chi2 = contrib.groupBy("feature").agg(
        F.sum("c_e6").cast("bigint").alias("chi2_e6")
    )
    return (
        tot.join(chi2, "feature")
        .select("feature", "npos", "nn", "chi2_e6")
        .orderBy("feature")
    )


# Welch's t over exact integer moments: means and variances are derived
# inside ONE shared expression tree so both engines evaluate the identical
# IEEE-754 doubles. s_* are whole-dollar int64 sums, ss_* their squares.
_WELCH_T = (
    "(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    " / sqrt("
    "   ((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)"
    "     / CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE)) / CAST(n_a AS DOUBLE)"
    " + ((CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)"
    "     / CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE)) / CAST(n_b AS DOUBLE)"
    ") * 1e6"
)


@query(
    "ab_test_welch",
    oracle=f"""
    WITH assigned AS (
        SELECT c.c_mktsegment AS segment,
               CAST(o.o_custkey % 2 AS INT) AS arm,
               CAST(trunc(o.o_totalprice) AS BIGINT) AS price_d
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), m AS (
        SELECT segment,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN arm = 0 THEN price_d ELSE 0 END) AS BIGINT) AS s_a,
               CAST(SUM(CASE WHEN arm = 0 THEN price_d * price_d ELSE 0 END)
                    AS BIGINT) AS ss_a,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN arm = 1 THEN price_d ELSE 0 END) AS BIGINT) AS s_b,
               CAST(SUM(CASE WHEN arm = 1 THEN price_d * price_d ELSE 0 END)
                    AS BIGINT) AS ss_b
        FROM assigned GROUP BY segment
    )
    SELECT segment, n_a, n_b,
           CAST(s_a // n_a AS BIGINT) AS mean_a_d,
           CAST(s_b // n_b AS BIGINT) AS mean_b_d,
           CAST(trunc({_WELCH_T}) AS BIGINT) AS t_e6
    FROM m ORDER BY segment
    """,
)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout per market segment: customers are assigned
    to arms by key parity (the deterministic stand-in for a hash-bucket
    assignment), the metric is whole-dollar order value, and the statistic
    is Welch's unequal-variance t — the standard experimentation-platform
    report (n, means, t per stratum).

    Scale: ONE pass over the fact computes all six moments per (segment)
    via conditional aggregation — map-side combinable, no second scan, no
    window; output is strata-sized. The t statistic is assembled from the
    exact int64 moments by one shared expression tree (identical IEEE
    doubles on both engines), trunc-scaled. The metric is truncated to
    whole dollars so the sum-of-squares stays under int64 to ~10^11 rows
    per stratum (cent scaling overflows at ~10^6 rows x 10^7c values —
    caught at the 10x replica); past that the same plan swaps the ss
    columns to DECIMAL(38,0)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    assigned = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_custkey") % 2).cast("int").alias("arm"),
        F.expr("CAST(o_totalprice AS BIGINT)").alias("price_d"),
    )
    m = assigned.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("price_d")).otherwise(0))
        .cast("bigint").alias("s_a"),
        F.sum(F.when(F.col("arm") == 0, F.expr("price_d * price_d")).otherwise(0))
        .cast("bigint").alias("ss_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("price_d")).otherwise(0))
        .cast("bigint").alias("s_b"),
        F.sum(F.when(F.col("arm") == 1, F.expr("price_d * price_d")).otherwise(0))
        .cast("bigint").alias("ss_b"),
    )
    return m.select(
        "segment",
        "n_a",
        "n_b",
        F.expr("s_a DIV n_a").alias("mean_a_d"),
        F.expr("s_b DIV n_b").alias("mean_b_d"),
        F.expr(f"CAST({_WELCH_T} AS BIGINT)").alias("t_e6"),
    ).orderBy("segment")


@query(
    "winsorized_segment_stats",
    oracle="""
    WITH priced AS (
        SELECT c.c_mktsegment AS segment,
               CAST(trunc(o.o_totalprice * 100) AS BIGINT) AS price_c,
               o.o_orderkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), ranked AS (
        SELECT segment, price_c,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY price_c, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY segment) AS n
        FROM priced
    ), cuts AS (
        SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN price_c END)
                    AS BIGINT) AS p05_c,
               CAST(MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN price_c END)
                    AS BIGINT) AS p95_c
        FROM ranked GROUP BY segment
    )
    SELECT p.segment, c.n, c.p05_c, c.p95_c,
           CAST(SUM(LEAST(GREATEST(p.price_c, c.p05_c), c.p95_c)) // c.n
                AS BIGINT) AS wins_mean_c
    FROM priced p JOIN cuts c ON p.segment = c.segment
    GROUP BY p.segment, c.n, c.p05_c, c.p95_c
    ORDER BY p.segment
    """,
)
def winsorized_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) robust mean per market segment: exact
    nearest-rank P5/P95 cut points on cent-scaled order value, values
    clipped into [p05, p95], then the clipped mean — the outlier-resistant
    feature scaling step (vs value_mad_outliers' detection-only view).

    Percentiles are NEAREST-RANK (rank = ceil(p*n) computed as the integer
    (p*n + 99) DIV 100 — no float), so the cut is an actual data value and
    both engines agree exactly; ties are broken by orderkey but cannot
    change the value at a rank. Scale: one window shuffle on the segment
    key ranks each stratum (rows ordered within partition, no global
    sort); the cuts reduce to a strata-sized frame joined back broadcast;
    the clipped mean is a second pass over the same co-partitioned data.
    At 100 TB with heavy strata, swap the exact rank for the t-digest /
    approx_percentile and keep the clip-aggregate unchanged."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    priced = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(o_totalprice * 100 AS BIGINT)").alias("price_c"),
        "o_orderkey",
    )
    w = W.partitionBy("segment").orderBy("price_c", "o_orderkey")
    wn = W.partitionBy("segment")
    ranked = priced.select(
        "segment",
        "price_c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    cuts = ranked.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when(F.expr("rn = (5 * n + 99) DIV 100"), F.col("price_c"))
        ).cast("bigint").alias("p05_c"),
        F.max(
            F.when(F.expr("rn = (95 * n + 99) DIV 100"), F.col("price_c"))
        ).cast("bigint").alias("p95_c"),
    )
    return (
        priced.join(F.broadcast(cuts), "segment")
        .groupBy("segment", "n", "p05_c", "p95_c")
        .agg(
            F.expr(
                "CAST(SUM(LEAST(GREATEST(price_c, p05_c), p95_c)) DIV n"
                " AS BIGINT)"
            ).alias("wins_mean_c")
        )
        .select("segment", "n", "p05_c", "p95_c", "wins_mean_c")
        .orderBy("segment")
    )


# PSI per-bin contribution: Laplace-smoothed shares and one ln over exact
# int64 inputs in a single shared tree; trunc-scaled per bin so any
# downstream total is an integer sum. Parameterized so the batch report
# and the streaming monitor (streaming_queries.streamed_psi_monitor) stay
# provably the same expression (review finding: no hand-kept copies of a
# bit-exactness-critical tree).
def psi_contrib_sql(a: str = "n_a", b: str = "n_b",
                    ta: str = "ta", tb: str = "tb") -> str:
    return (
        f"(CAST({a} + 1 AS DOUBLE) / CAST({ta} + 10 AS DOUBLE)"
        f" - CAST({b} + 1 AS DOUBLE) / CAST({tb} + 10 AS DOUBLE))"
        f" * ln((CAST({a} + 1 AS DOUBLE) * CAST({tb} + 10 AS DOUBLE))"
        f"      / (CAST({b} + 1 AS DOUBLE) * CAST({ta} + 10 AS DOUBLE))) * 1e9"
    )


_PSI_CONTRIB = psi_contrib_sql()


@query(
    "psi_drift_report",
    oracle=f"""
    WITH binned AS (
        SELECT LEAST(CAST(trunc(o_totalprice) AS BIGINT) // 50000, 9) AS bin,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 0 ELSE 1 END AS period
        FROM orders
    ), counts AS (
        SELECT bin,
               CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM binned GROUP BY bin
    ), tot AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb
        FROM counts
    ), grid AS (SELECT CAST(unnest(range(10)) AS BIGINT) AS bin)
    SELECT g.bin,
           COALESCE(c.n_a, 0) AS n_a, COALESCE(c.n_b, 0) AS n_b,
           CAST(trunc({psi_contrib_sql('COALESCE(c.n_a, 0)',
                                        'COALESCE(c.n_b, 0)')})
                AS BIGINT) AS contrib_e9
    FROM grid g LEFT JOIN counts c ON g.bin = c.bin
    CROSS JOIN tot
    ORDER BY g.bin
    """,
)
def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index report — the standard ML-monitoring
    drift metric — comparing the order-value distribution before vs after
    1998 over 10 fixed $50k bins: per-bin contribution
    (p_a - p_b) * ln(p_a / p_b) with Laplace-smoothed shares, PSI = the
    integer sum of the contributions (>0.2 conventionally = significant
    drift; complements embedding_drift_report's vector-space view with
    the tabular-feature view).

    The bin grid is generated DENSE (0..9 literals), so an empty bin
    still reports — with smoothing it contributes the correct nonzero
    penalty instead of vanishing (the classic silent-PSI bug when a
    production value range drops out). Each contribution is one shared
    expression over exact int64 counts, trunc-scaled per bin — no float
    crosses rows. Scale: one fact scan to a 10-row frame; everything
    after is constant-size. The bin edges are fixed literals, as a
    monitoring config pins them — NOT data-derived quantiles, which would
    make the two periods' bins incomparable."""
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.expr(
            "LEAST(CAST(o_totalprice AS BIGINT) DIV 50000, 9)"
        ).alias("bin"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"),
            0,
        )
        .otherwise(1)
        .alias("period"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").cast("bigint").alias("ta"),
        F.sum("n_b").cast("bigint").alias("tb"),
    )
    grid = spark.range(10).select(F.col("id").cast("bigint").alias("bin"))
    return (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_a",
            "n_b",
            F.expr(f"CAST({_PSI_CONTRIB} AS BIGINT)").alias("contrib_e9"),
        )
        .orderBy("bin")
    )


# CUPED: theta = cov(x, y) / var(x) over pooled pre/post customer spend,
# spelled once and inlined into every consumer so both engines evaluate
# the identical IEEE tree over exact int64 moments.
_THETA = (
    "((CAST(nn AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(nn AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_DIFF = (
    "(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
)
_XDIFF = (
    "(CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
)


@query(
    "cuped_adjusted_ab",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(o_custkey % 2 AS INT) AS arm,
               CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                        THEN CAST(trunc(o_totalprice) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                        THEN CAST(trunc(o_totalprice) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM orders GROUP BY o_custkey
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nn,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
               CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
               CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
        FROM per_cust
    )
    SELECT n_a, n_b,
           CAST(trunc({_DIFF} * 1e6) AS BIGINT) AS diff_e6,
           CAST(trunc({_THETA} * 1e6) AS BIGINT) AS theta_e6,
           CAST(trunc(({_DIFF} - {_THETA} * {_XDIFF}) * 1e6) AS BIGINT)
               AS adj_diff_e6
    FROM m
    """,
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) for the A/B readout:
    each customer's post-1998 spend (the experiment metric y) is adjusted
    by their pre-1998 spend (the pre-period covariate x) with
    theta = cov(x,y)/var(x), and the treatment effect is re-estimated on
    the adjusted metric — the standard trick that cuts experiment
    runtimes by exploiting pre-experiment behavior, one shelf over from
    ab_test_welch's unadjusted t.

    Scale: ONE pass builds the per-customer (x, y) frame (conditional
    sums on the order-date split, customer-keyed groupBy), a second
    conditional aggregate collapses it to a single 11-moment row — both
    map-side combinable, nothing else touches the fact. theta, the naive
    diff, and the adjusted diff are each one shared expression over the
    exact int64 moments, trunc-scaled; whole-dollar units keep x*y
    int64-safe to ~10^6-dollar customers x 10^6 rows."""
    o = load_table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01 00:00:00").cast("timestamp")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < split, F.expr("CAST(o_totalprice AS BIGINT)"))
            .otherwise(0)
        ).cast("bigint").alias("x"),
        F.sum(
            F.when(F.col("o_orderdate") >= split, F.expr("CAST(o_totalprice AS BIGINT)"))
            .otherwise(0)
        ).cast("bigint").alias("y"),
    ).withColumn("arm", (F.col("o_custkey") % 2).cast("int"))
    m = per_cust.agg(
        F.count("*").cast("bigint").alias("nn"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
        .cast("bigint").alias("sx_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("bigint").alias("sy_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
        .cast("bigint").alias("sx_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("bigint").alias("sy_b"),
    )
    return m.select(
        "n_a",
        "n_b",
        F.expr(f"CAST({_DIFF} * 1e6 AS BIGINT)").alias("diff_e6"),
        F.expr(f"CAST({_THETA} * 1e6 AS BIGINT)").alias("theta_e6"),
        F.expr(f"CAST(({_DIFF} - {_THETA} * {_XDIFF}) * 1e6 AS BIGINT)").alias(
            "adj_diff_e6"
        ),
    )


@query(
    "kaplan_meier_churn",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(datediff('day', MIN(CAST(o_orderdate AS DATE)),
                             MAX(CAST(o_orderdate AS DATE))) // 30 AS BIGINT)
                   AS dur_m,
               CASE WHEN MAX(o_orderdate) < TIMESTAMP '2001-02-01 00:00:00'
                    THEN 1 ELSE 0 END AS churned
        FROM orders GROUP BY o_custkey
    ), per_t AS (
        SELECT dur_m AS t,
               CAST(COUNT(*) AS BIGINT) AS ending,
               CAST(SUM(churned) AS BIGINT) AS d
        FROM cust GROUP BY dur_m
    ), risk AS (
        SELECT t, d,
               CAST(SUM(ending) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_risk
        FROM per_t
    ), events AS (
        SELECT t, n_risk, d,
               CAST(trunc(ln(CAST(n_risk - d + 1 AS DOUBLE)
                             / CAST(n_risk + 1 AS DOUBLE)) * 1e9) AS BIGINT)
                   AS ln_term_e9
        FROM risk WHERE d > 0
    )
    SELECT t, n_risk, d,
           CAST(SUM(ln_term_e9) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_logsurv_e9
    FROM events ORDER BY t
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn survival curve: a customer's observed lifetime
    is first-to-last-order months, customers quiet for the final 6 months
    of the window churned (event), the rest are censored (still active) —
    and the curve is the product-limit estimator over event times,
    carried as the cumulative LOG survival so the accumulation is an
    integer sum (exp() it for S(t); the per-step ln((n-d+1)/(n+1)) is
    Laplace-guarded so a step where everyone at risk churns stays
    finite, same discipline as the PSI smoothing).

    Scale: one pass collapses orders to a customer frame (first/last
    conditional aggregates), a second collapses to per-duration counts —
    the surviving frame is bounded by the duration domain (months), so
    the at-risk reverse running sum and the cumulative hazard sum are
    calendar-bounded windows, the same benign post-aggregation pattern
    as open_orders_daily. Every term is trunc-scaled int64 BEFORE
    summation; the risk set includes censored customers exactly as the
    estimator requires."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.expr(
            "CAST(datediff(MAX(CAST(o_orderdate AS DATE)),"
            " MIN(CAST(o_orderdate AS DATE))) DIV 30 AS BIGINT)"
        ).alias("dur_m"),
        F.max(
            F.when(
                F.col("o_orderdate")
                < F.lit("2001-02-01 00:00:00").cast("timestamp"),
                0,
            ).otherwise(1)
        ).alias("active"),
    ).select("dur_m", (1 - F.col("active")).alias("churned"))
    per_t = cust.groupBy(F.col("dur_m").alias("t")).agg(
        F.count("*").cast("bigint").alias("ending"),
        F.sum("churned").cast("bigint").alias("d"),
    )
    w_desc = (
        W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = per_t.select(
        "t", "d", F.sum("ending").over(w_desc).cast("bigint").alias("n_risk")
    )
    events = risk.filter(F.col("d") > 0).withColumn(
        "ln_term_e9",
        F.expr(
            "CAST(ln(CAST(n_risk - d + 1 AS DOUBLE)"
            " / CAST(n_risk + 1 AS DOUBLE)) * 1e9 AS BIGINT)"
        ),
    )
    w_asc = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.select(
        "t",
        "n_risk",
        "d",
        F.sum("ln_term_e9").over(w_asc).cast("bigint").alias("cum_logsurv_e9"),
    ).orderBy("t")


# WOE assembly: Laplace-smoothed odds ratio as ONE ln over a ratio of two
# exact int64 products (counts are small enough that the products stay far
# inside int64); the IV cell term multiplies the share difference back in.
# Per-cell trunc-then-int-sum keeps any downstream aggregation
# order-independent (the psi_drift_report idiom).
_WOE_RATIO = (
    "CAST((n_good + 1) * (bad_tot + nb) AS DOUBLE)"
    " / CAST((n_bad + 1) * (good_tot + nb) AS DOUBLE)"
)
_WOE_SHARE_DIFF = (
    "(CAST(n_good + 1 AS DOUBLE) / CAST(good_tot + nb AS DOUBLE)"
    " - CAST(n_bad + 1 AS DOUBLE) / CAST(bad_tot + nb AS DOUBLE))"
)
_WOE_E6 = f"CAST(trunc(1e6 * ln({_WOE_RATIO})) AS BIGINT)"
_WOE_E6_SPARK = f"CAST(1e6 * ln({_WOE_RATIO}) AS BIGINT)"
_IV_E9 = f"CAST(trunc(1e9 * {_WOE_SHARE_DIFF} * ln({_WOE_RATIO})) AS BIGINT)"
_IV_E9_SPARK = f"CAST(1e9 * {_WOE_SHARE_DIFF} * ln({_WOE_RATIO}) AS BIGINT)"


@query(
    "woe_iv_encoding",
    oracle=f"""
    WITH lab AS (
        SELECT c.c_mktsegment AS seg, CAST(c.c_nationkey AS VARCHAR) AS nat,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS good
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), long AS (
        SELECT f.feature,
               CASE f.feature WHEN 'mktsegment' THEN seg ELSE nat END
                   AS bucket,
               good
        FROM lab CROSS JOIN (
            SELECT 'mktsegment' AS feature UNION ALL SELECT 'nation'
        ) f
    ), cells AS (
        SELECT feature, bucket,
               CAST(SUM(good) AS BIGINT) AS n_good,
               CAST(COUNT(*) - SUM(good) AS BIGINT) AS n_bad
        FROM long GROUP BY 1, 2
    ), tot AS (
        SELECT feature,
               CAST(SUM(n_good) AS BIGINT) AS good_tot,
               CAST(SUM(n_bad) AS BIGINT) AS bad_tot,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM cells GROUP BY 1
    )
    SELECT c.feature AS feature, c.bucket, c.n_good, c.n_bad,
           {_WOE_E6} AS woe_e6,
           {_IV_E9} AS iv_cell_e9
    FROM cells c JOIN tot t ON c.feature = t.feature
    ORDER BY feature, bucket
    """,
)
def woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + per-bucket information-value terms for
    two categorical customer features (market segment, nation) against a
    binary high-priority-order label — the credit-scoring-style categorical
    encoder that, unlike `loo_target_encoding`, produces a log-odds scale
    and a feature-ranking statistic (IV = sum of the cell terms).

    Scale: one fact-sized pass — orders broadcast-joined to the customer
    dimension, stack()-ed into (feature, bucket) long form, then a
    map-side-combined conditional-count aggregate; everything after is
    vocabulary-sized (buckets x features), with per-feature totals joined
    back broadcast. Laplace (+1 per cell, +n_buckets per total) keeps
    empty-side buckets finite. WOE is ONE ln over a ratio of exact int64
    products; the IV cell term is trunc-scaled BEFORE any summation, so a
    consumer's feature-level IV (SUM(iv_cell_e9)) is order-independent."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    lab = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("string").alias("nat"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("good"),
    )
    long = lab.select(
        F.expr(
            "stack(2, 'mktsegment', seg, 'nation', nat) AS (feature, bucket)"
        ),
        "good",
    )
    cells = long.groupBy("feature", "bucket").agg(
        F.sum("good").cast("bigint").alias("n_good"),
        (F.count("*") - F.sum("good")).cast("bigint").alias("n_bad"),
    )
    tot = cells.groupBy("feature").agg(
        F.sum("n_good").cast("bigint").alias("good_tot"),
        F.sum("n_bad").cast("bigint").alias("bad_tot"),
        F.count("*").cast("bigint").alias("nb"),
    )
    return (
        cells.join(F.broadcast(tot), "feature")
        .select(
            "feature",
            "bucket",
            "n_good",
            "n_bad",
            F.expr(_WOE_E6_SPARK).alias("woe_e6"),
            F.expr(_IV_E9_SPARK).alias("iv_cell_e9"),
        )
        .orderBy("feature", "bucket")
    )


@query(
    "did_revenue_estimate",
    oracle="""
    WITH cell AS (
        SELECT r.r_name AS region,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
               CASE WHEN o.o_orderdate >= TIMESTAMP '1997-01-01'
                    THEN 1 ELSE 0 END AS post,
               CAST(trunc(o.o_totalprice) AS BIGINT) AS price_d
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    ), m AS (
        SELECT region,
               CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
               CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN price_d ELSE 0 END) AS BIGINT) AS s_tp,
               CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
               CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN price_d ELSE 0 END) AS BIGINT) AS s_t0,
               CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
               CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN price_d ELSE 0 END) AS BIGINT) AS s_cp,
               CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
               CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN price_d ELSE 0 END) AS BIGINT) AS s_c0
        FROM cell GROUP BY region
    )
    SELECT region, n_tp, n_t0, n_cp, n_c0,
           CAST((1000000 * s_tp) // NULLIF(n_tp, 0)
                - (1000000 * s_t0) // NULLIF(n_t0, 0)
                - ((1000000 * s_cp) // NULLIF(n_cp, 0)
                   - (1000000 * s_c0) // NULLIF(n_c0, 0))
                AS BIGINT) AS did_e6
    FROM m ORDER BY region
    """,
)
def did_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout per region: treated = BUILDING-
    segment customers (the deterministic stand-in for a program cohort),
    periods split at 1997-01-01, metric = whole-dollar order value. The
    estimate is the classic 2x2: (post - pre) change for treated minus the
    same change for controls — the causal-inference companion to the
    randomized readouts (ab_test_welch, cuped_adjusted_ab), for when
    assignment is NOT randomized and a parallel-trends control is the
    identification strategy.

    Exactness: every cell mean enters as (1e6 * sum) DIV n — all four
    operands positive int64, so Spark's DIV and DuckDB's // agree (both
    floor); no doubles anywhere. Scale: ONE pass over the fact with
    conditional aggregation over broadcast dims — eight moments per
    region, map-side combinable, output region-sized."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("treated"),
            F.when(F.expr("o_orderdate >= TIMESTAMP '1997-01-01'"), 1)
            .otherwise(0)
            .alias("post"),
            F.expr("CAST(o_totalprice AS BIGINT)").alias("price_d"),
        )
    )

    def _cellagg(t: int, p: int, col: str):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        if col == "n":
            return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
        return F.sum(F.when(cond, F.col("price_d")).otherwise(0)).cast("bigint")

    m = cell.groupBy("region").agg(
        _cellagg(1, 1, "n").alias("n_tp"),
        _cellagg(1, 1, "s").alias("s_tp"),
        _cellagg(1, 0, "n").alias("n_t0"),
        _cellagg(1, 0, "s").alias("s_t0"),
        _cellagg(0, 1, "n").alias("n_cp"),
        _cellagg(0, 1, "s").alias("s_cp"),
        _cellagg(0, 0, "n").alias("n_c0"),
        _cellagg(0, 0, "s").alias("s_c0"),
    )
    return m.select(
        "region",
        "n_tp",
        "n_t0",
        "n_cp",
        "n_c0",
        # NULLIF keeps the query total: an empty 2x2 cell yields a NULL
        # estimate in BOTH engines instead of a DuckDB division error /
        # Spark NULL mismatch
        F.expr(
            "(1000000 * s_tp) DIV NULLIF(n_tp, 0)"
            " - (1000000 * s_t0) DIV NULLIF(n_t0, 0)"
            " - ((1000000 * s_cp) DIV NULLIF(n_cp, 0)"
            "    - (1000000 * s_c0) DIV NULLIF(n_c0, 0))"
        ).alias("did_e6"),
    ).orderBy("region")


@query(
    "propensity_caliper_match",
    oracle="""
    WITH cust AS (
        SELECT c.c_custkey AS ck,
               c.c_mktsegment = 'BUILDING' AS is_t,
               CAST(trunc(c.c_acctbal * 100) AS BIGINT) AS score,
               r.r_name AS region
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    ), outc AS (
        SELECT o_custkey AS ck,
               CAST(SUM(CAST(trunc(o_totalprice) AS BIGINT)) AS BIGINT) AS out_d
        FROM orders GROUP BY o_custkey
    ), full_c AS (
        SELECT cust.ck, cust.is_t, cust.score, cust.region,
               COALESCE(outc.out_d, 0) AS out_d
        FROM cust LEFT JOIN outc ON cust.ck = outc.ck
    ), ctrl1 AS (
        SELECT region, score, ck, out_d FROM (
            SELECT region, score, ck, out_d,
                   ROW_NUMBER() OVER (PARTITION BY region, score
                                      ORDER BY ck) AS rn
            FROM full_c WHERE NOT is_t
        ) WHERE rn = 1
    ), treated AS (
        SELECT region, score, ck, out_d FROM full_c WHERE is_t
    ), matched AS (
        SELECT t.region, t.ck, t.out_d AS out_t,
               m.out_d AS out_c, abs(m.score - t.score) AS gap
        FROM treated t, LATERAL (
            SELECT c.ck, c.out_d, c.score
            FROM ctrl1 c WHERE c.region = t.region
            ORDER BY abs(c.score - t.score), c.ck LIMIT 1
        ) m
        WHERE abs(m.score - t.score) <= 10000
    ), base AS (
        SELECT region, CAST(COUNT(*) AS BIGINT) AS n_treated
        FROM treated GROUP BY region
    ), agg AS (
        SELECT region, CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(out_t - out_c) AS BIGINT) AS s_diff,
               CAST(SUM(gap) AS BIGINT) AS gap_sum
        FROM matched GROUP BY region
    )
    SELECT b.region, b.n_treated,
           COALESCE(a.n_matched, 0) AS n_matched,
           COALESCE(a.gap_sum, 0) AS gap_sum,
           CAST(trunc(1e6 * CAST(a.s_diff AS DOUBLE) / a.n_matched)
                AS BIGINT) AS att_e6
    FROM base b LEFT JOIN agg a ON b.region = a.region
    ORDER BY b.region
    """,
)
def propensity_caliper_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:1 propensity-style matching with replacement, blocked exactly on
    region and nearest on the balance score within a $100 caliper: every
    BUILDING-segment (treated) customer is paired to the closest control
    by account-balance cents (ties: smaller control key), and the matched
    set yields the ATT estimate — mean(treated outcome - matched control
    outcome) in lifetime whole-dollar revenue. Completes the causal trio:
    randomized readout (ab_test_welch), variance-reduced readout
    (cuped_adjusted_ab), observational DiD (did_revenue_estimate), and
    now observational matching.

    Determinism: controls are first reduced to one representative per
    (region, score) — the smallest key — so "nearest, ties to smaller
    key" is a total order both engines replay exactly; the oracle states
    it as a LATERAL argmin, the engine as the as-of adjacency rewrite.

    Scale: the nearest-by-score match is NOT a theta join — the classic
    as-of union trick (operators/asof.py discipline): controls and
    treated union into one frame sorted per region by (score, side, key);
    two region-partitioned windows pull each treated row's floor and
    ceiling control (last/first ignorenulls over the preceding/following
    frame), and the argmin over those two candidates is the global
    nearest because the representative scores are unique per region. One
    shuffle by region, window frames bounded by partition, everything
    else conditional aggregation. At 100 TB blocking keys become
    (region, score-bucket) so no partition exceeds executor memory."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("c_custkey").alias("ck"),
            (F.col("c_mktsegment") == "BUILDING").alias("is_t"),
            F.expr("CAST(c_acctbal * 100 AS BIGINT)").alias("score"),
            F.col("r_name").alias("region"),
        )
    )
    outc = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.expr("CAST(o_totalprice AS BIGINT)")).cast("bigint").alias("out_d")
    )
    # customer-dimension sized (one row per customer) but derived from a
    # full orders-fact aggregation — pin it, because three downstream
    # frames (controls, treated matching arm, treated base counts) would
    # otherwise each re-run the fact scan (measured 3.7x wall at the 10x
    # replica before the pin)
    full_c = (
        cust.join(outc, "ck", "left")
        .withColumn("out_d", F.coalesce("out_d", F.lit(0)))
        .localCheckpoint()
    )
    ctrl1 = (
        full_c.filter(~F.col("is_t"))
        .groupBy("region", "score")
        .agg(F.min(F.struct("ck", "out_d")).alias("rep"))
        .select("region", "score", F.col("rep.ck").alias("ck"),
                F.col("rep.out_d").alias("out_d"))
    )
    treated = full_c.filter("is_t").select("region", "score", "ck", "out_d")

    both = ctrl1.select(
        "region", "score", "ck", "out_d", F.lit(0).alias("side")
    ).unionByName(
        treated.select("region", "score", "ck", "out_d", F.lit(1).alias("side"))
    )
    order = [F.asc("score"), F.asc("side"), F.asc("ck")]
    prev_w = (
        W.partitionBy("region").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    next_w = (
        W.partitionBy("region").orderBy(*order)
        .rowsBetween(1, W.unboundedFollowing)
    )
    cand = F.when(F.col("side") == 0, F.struct("score", "ck", "out_d"))
    annotated = (
        both.withColumn("prev", F.last(cand, ignorenulls=True).over(prev_w))
        .withColumn("nxt", F.first(cand, ignorenulls=True).over(next_w))
        .filter(F.col("side") == 1)
    )
    d_prev = F.col("score") - F.col("prev.score")
    d_next = F.col("nxt.score") - F.col("score")
    pick_prev = F.col("nxt").isNull() | (
        F.col("prev").isNotNull()
        & (
            (d_prev < d_next)
            | ((d_prev == d_next) & (F.col("prev.ck") < F.col("nxt.ck")))
        )
    )
    best = annotated.select(
        "region",
        "score",
        F.col("out_d").alias("out_t"),
        F.when(pick_prev, F.col("prev")).otherwise(F.col("nxt")).alias("m"),
    ).filter(F.col("m").isNotNull())
    matched = best.select(
        "region",
        "out_t",
        F.col("m.out_d").alias("out_c"),
        F.abs(F.col("m.score") - F.col("score")).alias("gap"),
    ).filter(F.col("gap") <= 10000)
    base = treated.groupBy("region").agg(
        F.count("*").cast("bigint").alias("n_treated")
    )
    agg = matched.groupBy("region").agg(
        F.count("*").cast("bigint").alias("n_matched"),
        F.sum(F.col("out_t") - F.col("out_c")).cast("bigint").alias("s_diff"),
        F.sum("gap").cast("bigint").alias("gap_sum"),
    )
    # LEFT join: a region whose treated rows all fall outside the caliper
    # (e.g. a control-free block at tiny SFs) still reports its n_treated
    # with a NULL ATT — the unmatched-block accounting a real matching
    # report needs, not a silently dropped row
    return (
        base.join(agg, "region", "left")
        .select(
            "region",
            "n_treated",
            F.coalesce("n_matched", F.lit(0)).cast("bigint").alias("n_matched"),
            F.coalesce("gap_sum", F.lit(0)).cast("bigint").alias("gap_sum"),
            F.expr(
                "CAST(1e6 * CAST(s_diff AS DOUBLE) / n_matched AS BIGINT)"
            ).alias("att_e6"),
        )
        .orderBy("region")
    )


@query(
    "uplift_qini_deciles",
    oracle="""
    WITH resp AS (
        SELECT o_custkey AS ck, MAX(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN 1 ELSE 0 END) AS responded
        FROM orders GROUP BY o_custkey
    ), pop AS (
        SELECT c.c_custkey AS ck,
               CAST(c.c_custkey % 2 AS INT) AS arm,
               CAST(trunc(c.c_acctbal * 100) AS BIGINT) AS score,
               COALESCE(r.responded, 0) AS responded
        FROM customer c LEFT JOIN resp r ON c.c_custkey = r.ck
    ), binned AS (
        SELECT arm, responded,
               NTILE(10) OVER (ORDER BY score DESC, ck) AS decile
        FROM pop
    ), cells AS (
        SELECT decile,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN arm = 1 THEN responded ELSE 0 END) AS BIGINT) AS r_t,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN arm = 0 THEN responded ELSE 0 END) AS BIGINT) AS r_c
        FROM binned GROUP BY decile
    ), cum AS (
        SELECT a.decile, a.n_t, a.r_t, a.n_c, a.r_c,
               CAST(SUM(b.n_t) AS BIGINT) AS cn_t,
               CAST(SUM(b.r_t) AS BIGINT) AS cr_t,
               CAST(SUM(b.n_c) AS BIGINT) AS cn_c,
               CAST(SUM(b.r_c) AS BIGINT) AS cr_c
        FROM cells a JOIN cells b ON b.decile <= a.decile
        GROUP BY a.decile, a.n_t, a.r_t, a.n_c, a.r_c
    )
    SELECT decile, n_t, r_t, n_c, r_c,
           CAST(cr_t * cn_c - cr_c * cn_t AS BIGINT) AS qini_num,
           CAST(cn_t * cn_c AS BIGINT) AS qini_den
    FROM cum ORDER BY decile
    """,
)
def uplift_qini_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift evaluation (Qini curve) for a targeting score under a
    randomized treatment: customers ranked by the balance score into
    deciles (best-first), and per cumulative depth the incremental
    responders attributable to treatment — cum_rt - cum_rc * cum_nt /
    cum_nc, carried as the exact integer rational (qini_num, qini_den) so
    no division ever happens. Response = placed an URGENT order; arm =
    key parity (the ab_test_welch randomization). Fourth member of the
    causal family: randomized readout, variance reduction, observational
    DiD/matching, and now heterogeneous-targeting evaluation.

    Scale: response reduces the fact to one row per customer (map-side
    combined MAX); the decile assignment is the distributed two-pass rank
    (`scalable_ntile` — no single-partition window); everything after is
    a 10-row frame with broadcast inequality prefix-joins (the isotonic
    PAV discipline)."""
    from ..operators.ranking import scalable_ntile

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    resp = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("responded")
    )
    pop = (
        c.select(
            F.col("c_custkey").alias("ck"),
            (F.col("c_custkey") % 2).cast("int").alias("arm"),
            F.expr("CAST(c_acctbal * 100 AS BIGINT)").alias("score"),
        )
        .join(resp, "ck", "left")
        .withColumn("responded", F.coalesce("responded", F.lit(0)))
    )
    binned = scalable_ntile(
        pop, 10, [F.desc("score"), F.asc("ck")], tile_col="decile"
    )
    cells = binned.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(F.col("arm") == 1, F.col("responded")).otherwise(0))
        .cast("bigint").alias("r_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("arm") == 0, F.col("responded")).otherwise(0))
        .cast("bigint").alias("r_c"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(
            F.col("a.decile").alias("decile"),
            F.col("a.n_t").alias("n_t"),
            F.col("a.r_t").alias("r_t"),
            F.col("a.n_c").alias("n_c"),
            F.col("a.r_c").alias("r_c"),
        )
        .agg(
            F.sum("b.n_t").cast("bigint").alias("cn_t"),
            F.sum("b.r_t").cast("bigint").alias("cr_t"),
            F.sum("b.n_c").cast("bigint").alias("cn_c"),
            F.sum("b.r_c").cast("bigint").alias("cr_c"),
        )
    )
    return cum.select(
        "decile",
        "n_t",
        "r_t",
        "n_c",
        "r_c",
        (F.col("cr_t") * F.col("cn_c") - F.col("cr_c") * F.col("cn_t"))
        .cast("bigint")
        .alias("qini_num"),
        (F.col("cn_t") * F.col("cn_c")).cast("bigint").alias("qini_den"),
    ).orderBy("decile")


# SPRT constants for H0: p=0.01 vs H1: p=0.03, alpha=beta=0.05 — computed
# ONCE as Python literals (trunc(ln(x)*1e6)) and shared verbatim by both
# engines, so the sequential test has no runtime libm dependency at all:
#   success increment  ln(p1/p0)           = ln(3)         -> 1098612
#   failure increment  ln((1-p1)/(1-p0))   = ln(0.97/0.99) ->  -20408
#   upper boundary     ln((1-beta)/alpha)  = ln(19)        -> 2944438
#   lower boundary     ln(beta/(1-alpha))  = -ln(19)       -> -2944438
_SPRT_INC1, _SPRT_INC0 = 1_098_612, -20_408
_SPRT_UP, _SPRT_DN = 2_944_438, -2_944_438


@query(
    "sprt_conversion_monitor",
    oracle=f"""
    WITH v AS (
        SELECT event_id AS vid, user_id, ts FROM events WHERE event_type = 'view'
    ),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    trial AS (
        SELECT v.vid, v.ts,
               CASE WHEN EXISTS (
                   SELECT 1 FROM p WHERE p.user_id = v.user_id
                    AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
               THEN 1 ELSE 0 END AS x
        FROM v
    ),
    w AS (
        SELECT x,
               CASE WHEN x = 1 THEN {_SPRT_INC1} ELSE {_SPRT_INC0} END AS inc,
               ROW_NUMBER() OVER (ORDER BY ts, vid) AS idx,
               SUM(CASE WHEN x = 1 THEN {_SPRT_INC1} ELSE {_SPRT_INC0} END)
                   OVER (ORDER BY ts, vid) AS llr
        FROM trial
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_trials,
               CAST(SUM(x) AS BIGINT) AS n_success,
               CAST(SUM(inc) AS BIGINT) AS llr_final_e6,
               MIN(idx) FILTER (llr >= {_SPRT_UP}) AS up_idx,
               MIN(idx) FILTER (llr <= {_SPRT_DN}) AS dn_idx,
               arg_min(llr, idx) FILTER (llr >= {_SPRT_UP}) AS up_llr,
               arg_min(llr, idx) FILTER (llr <= {_SPRT_DN}) AS dn_llr
        FROM w
    )
    SELECT n_trials, n_success, llr_final_e6,
           CASE WHEN up_idx IS NULL AND dn_idx IS NULL THEN 'continue'
                WHEN dn_idx IS NULL OR (up_idx IS NOT NULL AND up_idx < dn_idx)
                THEN 'accept_h1' ELSE 'accept_h0' END AS decision,
           CAST(CASE WHEN up_idx IS NULL AND dn_idx IS NULL THEN NULL
                WHEN dn_idx IS NULL OR (up_idx IS NOT NULL AND up_idx < dn_idx)
                THEN up_idx ELSE dn_idx END AS BIGINT) AS n_at_decision,
           CAST(CASE WHEN up_idx IS NULL AND dn_idx IS NULL THEN NULL
                WHEN dn_idx IS NULL OR (up_idx IS NOT NULL AND up_idx < dn_idx)
                THEN up_llr ELSE dn_llr END AS BIGINT) AS llr_at_decision_e6
    FROM agg
    """,
)
def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the event stream:
    every view is a Bernoulli trial (success = the same user purchases
    within the next hour), trials are taken in (ts, event_id) order, and
    the running log-likelihood ratio for H0: p=1% vs H1: p=3% is checked
    against the ln(19) decision boundaries (alpha = beta = 0.05). Reports
    the trial count, successes, final LLR, the decision, and WHEN the
    test first decided — the sequential-experimentation readout that
    stops an A/B test as soon as the evidence suffices instead of waiting
    for a fixed horizon. All increments/boundaries are Python-literal
    trunc(1e6*ln) integers shared by both engines: the whole sequential
    path is exact BIGINT arithmetic, no runtime transcendentals.

    Scale shape: the trial outcome is a user-keyed interval semi-join
    (bucketable by user_id, DEPLOY L1); the global trial order uses the
    engine's two-pass range-partitioned prefix machinery
    (global_row_number / global_prefix_sum — per-partition windows plus a
    <=P-row driver offset fold), never a single-partition window; the
    decision scan is one filtered aggregate over (idx, llr)."""
    from ..operators.ranking import global_prefix_sum, global_row_number

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", "ts"
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    trial = (
        v.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("pts") > F.col("ts"))
            & (F.col("pts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("vid", "ts")
        .agg(F.max(F.col("p_user").isNotNull().cast("int")).alias("x"))
        .withColumn(
            "inc",
            F.when(F.col("x") == 1, F.lit(_SPRT_INC1)).otherwise(F.lit(_SPRT_INC0)),
        )
    )
    ordered = global_row_number(trial, [F.col("ts"), F.col("vid")], rank_col="idx")
    walked = global_prefix_sum(
        ordered, [F.col("ts"), F.col("vid")], "inc", cumsum_col="llr"
    )
    agg = walked.agg(
        F.count("*").cast("bigint").alias("n_trials"),
        F.sum("x").cast("bigint").alias("n_success"),
        F.sum("inc").cast("bigint").alias("llr_final_e6"),
        F.expr(f"min(idx) FILTER (WHERE llr >= {_SPRT_UP})").alias("up_idx"),
        F.expr(f"min(idx) FILTER (WHERE llr <= {_SPRT_DN})").alias("dn_idx"),
        F.expr(f"min_by(llr, idx) FILTER (WHERE llr >= {_SPRT_UP})").alias("up_llr"),
        F.expr(f"min_by(llr, idx) FILTER (WHERE llr <= {_SPRT_DN})").alias("dn_llr"),
    )
    dec = (
        "CASE WHEN up_idx IS NULL AND dn_idx IS NULL THEN 'continue' "
        "WHEN dn_idx IS NULL OR (up_idx IS NOT NULL AND up_idx < dn_idx) "
        "THEN 'accept_h1' ELSE 'accept_h0' END"
    )
    pick = (
        "CASE WHEN up_idx IS NULL AND dn_idx IS NULL THEN NULL "
        "WHEN dn_idx IS NULL OR (up_idx IS NOT NULL AND up_idx < dn_idx) "
        "THEN {a} ELSE {b} END"
    )
    return agg.select(
        "n_trials",
        "n_success",
        "llr_final_e6",
        F.expr(dec).alias("decision"),
        F.expr(pick.format(a="up_idx", b="dn_idx")).cast("bigint").alias("n_at_decision"),
        F.expr(pick.format(a="up_llr", b="dn_llr")).cast("bigint").alias("llr_at_decision_e6"),
    )


@query(
    "conformal_interval_coverage",
    oracle="""
    WITH j AS (
        SELECT o_orderkey, c.c_mktsegment AS seg,
               CAST(trunc(o.o_totalprice * 100) AS BIGINT) AS pc
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    mu AS (
        SELECT seg, CAST(SUM(pc) // COUNT(*) AS BIGINT) AS mean_c,
               COUNT(*) AS n_tr
        FROM j WHERE o_orderkey % 3 = 0 GROUP BY seg
    ),
    calib AS (
        SELECT j.o_orderkey, ABS(j.pc - mu.mean_c) AS r
        FROM j JOIN mu USING (seg) WHERE j.o_orderkey % 3 = 1
    ),
    kq AS (
        SELECT COUNT(*) AS n_calib,
               (9 * (COUNT(*) + 1) + 9) // 10 AS k
        FROM calib
    ),
    ranked AS (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r, o_orderkey) AS rk FROM calib
    ),
    q AS (SELECT r AS q_c FROM ranked, kq WHERE rk = kq.k),
    test AS (
        SELECT ABS(j.pc - mu.mean_c) AS r
        FROM j JOIN mu USING (seg) WHERE j.o_orderkey % 3 = 2
    )
    SELECT CAST((SELECT SUM(n_tr) FROM mu) AS BIGINT) AS n_train,
           CAST(kq.n_calib AS BIGINT) AS n_calib,
           CAST(q.q_c AS BIGINT) AS q_c,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN test.r <= q.q_c THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
           CAST((1000000 * SUM(CASE WHEN test.r <= q.q_c THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS coverage_e6
    FROM test, q, kq GROUP BY kq.n_calib, q.q_c
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei et al. 2018 — the
    distribution-free uncertainty-quantification standard): a toy model
    (per-segment mean order value from the train third) gets a conformal
    radius q = the ceil(0.9*(n+1))-th smallest absolute calibration
    residual, and the held-out third reports empirical coverage of
    [prediction - q, prediction + q] — guaranteed >= 90% in expectation
    under exchangeability, whatever the model. Everything is exact: cent
    prices, floor-mean predictions, integer rank selection for the
    quantile (the k-th order statistic, tie-broken on the key), BIGINT
    coverage counts.

    Scale shape: one fact x broadcast-dim join feeds all three splits;
    the model is a segment-keyed agg; the quantile uses the two-pass
    range-partitioned global_row_number (never a single-partition
    window) and selects ONE row; coverage is a conditional aggregate
    against the broadcast 1-row radius."""
    from ..operators.ranking import global_row_number

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(o_totalprice * 100 AS BIGINT)").alias("pc"),
    )
    mu = (
        j.filter(F.col("o_orderkey") % 3 == 0)
        .groupBy("seg")
        .agg(
            F.expr("CAST(SUM(pc) DIV COUNT(*) AS BIGINT)").alias("mean_c"),
            F.count("*").alias("n_tr"),
        )
    )
    calib = (
        j.filter(F.col("o_orderkey") % 3 == 1)
        .join(F.broadcast(mu), "seg")
        .select("o_orderkey", F.abs(F.col("pc") - F.col("mean_c")).alias("r"))
    )
    kq = calib.agg(
        F.count("*").cast("bigint").alias("n_calib"),
        F.expr("(9 * (COUNT(*) + 1) + 9) DIV 10").alias("k"),
    )
    ranked = global_row_number(calib, [F.col("r"), F.col("o_orderkey")], rank_col="rk")
    q = (
        ranked.crossJoin(F.broadcast(kq))
        .filter(F.col("rk") == F.col("k"))
        .select(F.col("r").alias("q_c"), "n_calib")
    )
    test = (
        j.filter(F.col("o_orderkey") % 3 == 2)
        .join(F.broadcast(mu), "seg")
        .select(F.abs(F.col("pc") - F.col("mean_c")).alias("r"))
    )
    n_train = mu.agg(F.sum("n_tr").cast("bigint").alias("n_train"))
    return (
        test.crossJoin(F.broadcast(q))
        .agg(
            F.first("n_calib").cast("bigint").alias("n_calib"),
            F.first("q_c").cast("bigint").alias("q_c"),
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
        )
        .crossJoin(F.broadcast(n_train))
        .select(
            "n_train",
            "n_calib",
            "q_c",
            "n_test",
            "n_covered",
            F.expr("(1000000 * n_covered) div n_test").cast("bigint").alias("coverage_e6"),
        )
    )


@query(
    "pinball_loss_eval",
    oracle="""
    WITH j AS (
        SELECT o_orderkey, c.c_mktsegment AS seg,
               CAST(trunc(o.o_totalprice * 100) AS BIGINT) AS pc
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    tr AS (SELECT seg, pc FROM j WHERE o_orderkey % 2 = 0),
    q AS (
        SELECT seg, pc AS q_c, n_train FROM (
            SELECT seg, pc,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY pc) AS rk,
                   COUNT(*) OVER (PARTITION BY seg) AS n_train
            FROM tr
        ) WHERE rk = (9 * n_train + 9) // 10
    ),
    te AS (
        SELECT j.seg, j.pc, q.q_c, q.n_train
        FROM j JOIN q ON q.seg = j.seg WHERE j.o_orderkey % 2 = 1
    )
    SELECT seg,
           CAST(MAX(n_train) AS BIGINT) AS n_train,
           CAST(MAX(q_c) AS BIGINT) AS q_c,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN pc >= q_c THEN 9 * (pc - q_c)
                    ELSE (q_c - pc) END) AS BIGINT) AS pinball_x10_sum,
           CAST(SUM(CASE WHEN pc >= q_c THEN 9 * (pc - q_c)
                    ELSE (q_c - pc) END) // COUNT(*) AS BIGINT)
               AS pinball_x10_mean,
           CAST((1000000 * SUM(CASE WHEN pc <= q_c THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS below_frac_e6
    FROM te GROUP BY seg
    """,
)
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast evaluation by pinball (quantile) loss: each
    segment's tau=0.9 order-value quantile is estimated on the even-key
    half (exact type-1 order statistic, rank ceil(0.9 n)) and scored on
    the odd-key half with the loss that uniquely elicits quantiles —
    pinball_tau(y, q) = tau(y-q) for y >= q else (1-tau)(q-y). With
    tau = 9/10 the x10-scaled loss is pure BIGINT (9(y-q) or (q-y) cents)
    and the empirical below-quantile fraction rides along as the
    calibration readout (should sit near 900000e-6 per segment — the
    property test pins a tolerant band). The forecast-scoring twin of
    conformal_interval_coverage: that one checks interval COVERAGE, this
    scores the quantile ESTIMATE with its proper loss.

    Scale shape: one fact x broadcast-dim join feeds both splits; the
    per-segment rank selection is a segment-partitioned window (never
    global); the scoring pass is one conditional aggregate joined to the
    |segments|-row quantile frame."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(o_totalprice * 100 AS BIGINT)").alias("pc"),
    )
    tr = j.filter(F.col("o_orderkey") % 2 == 0)
    w = W.partitionBy("seg").orderBy("pc")
    q = (
        tr.select(
            "seg",
            "pc",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(W.partitionBy("seg")).alias("n_train"),
        )
        .filter(F.col("rk") == F.expr("(9 * n_train + 9) div 10"))
        .select("seg", F.col("pc").alias("q_c"), "n_train")
    )
    te = j.filter(F.col("o_orderkey") % 2 == 1).join(F.broadcast(q), "seg")
    loss = F.when(
        F.col("pc") >= F.col("q_c"), 9 * (F.col("pc") - F.col("q_c"))
    ).otherwise(F.col("q_c") - F.col("pc"))
    return te.groupBy("seg").agg(
        F.max("n_train").cast("bigint").alias("n_train"),
        F.max("q_c").cast("bigint").alias("q_c"),
        F.count("*").cast("bigint").alias("n_test"),
        F.sum(loss).cast("bigint").alias("pinball_x10_sum"),
        F.expr(
            "CAST(SUM(CASE WHEN pc >= q_c THEN 9 * (pc - q_c)"
            " ELSE (q_c - pc) END) div COUNT(*) AS BIGINT)"
        ).alias("pinball_x10_mean"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN pc <= q_c THEN 1 ELSE 0 END))"
            " div COUNT(*) AS BIGINT)"
        ).alias("below_frac_e6"),
    )


# --- Mann-Whitney U --------------------------------------------------------
# Shared z-statistic expression tree (normal approximation with tie
# correction), evaluated over the exact int64 columns n_a, n_b, u2_a,
# tsum (u2_a is the DOUBLED U statistic so tied average ranks stay
# integer; tsum = sum over tied groups of t^3 - t). Both engines
# evaluate this identical double tree — the _WELCH_T discipline.
_MWU_Z = (
    "((CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 2.0)"
    " / sqrt("
    "   (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)"
    "   * ((CAST(n_a + n_b AS DOUBLE) + 1.0)"
    "      - CAST(tsum AS DOUBLE)"
    "        / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))"
    ") * 1e6"
)


@query(
    "mann_whitney_u",
    oracle=f"""
    WITH assigned AS (
        SELECT c.c_mktsegment AS segment,
               CAST(o.o_custkey % 2 AS INT) AS arm,
               CAST(trunc(o.o_totalprice) AS BIGINT) AS price_d
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), dom AS (  -- distinct-value domain: one row per (segment, value)
        SELECT segment, price_d,
               CAST(COUNT(*) AS BIGINT) AS t,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_a
        FROM assigned GROUP BY segment, price_d
    ), ranked AS (  -- doubled average rank of each tied group
        SELECT segment, t, t_a,
               2 * (SUM(t) OVER (PARTITION BY segment ORDER BY price_d
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - t) + t + 1 AS r2
        FROM dom
    ), m AS (
        SELECT segment,
               CAST(SUM(t_a) AS BIGINT) AS n_a,
               CAST(SUM(t) - SUM(t_a) AS BIGINT) AS n_b,
               CAST(SUM(t_a * r2) AS BIGINT) AS r_a2,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
        FROM ranked GROUP BY segment
    ), u AS (
        SELECT segment, n_a, n_b, tsum,
               CAST(r_a2 - n_a * (n_a + 1) AS BIGINT) AS u2_a
        FROM m
    )
    SELECT segment, n_a, n_b, u2_a,
           CAST(2 * n_a * n_b - u2_a AS BIGINT) AS u2_b,
           tsum,
           CAST(trunc({_MWU_Z}) AS BIGINT) AS z_e6
    FROM u ORDER BY segment
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) per market segment between the
    two parity-assigned experiment arms — the NONPARAMETRIC companion to
    `ab_test_welch`: where Welch compares means under a normality
    assumption, U compares the whole distributions by rank, which is the
    right experiment readout for the heavy-tailed metrics (revenue, session
    length) an analytics platform actually ships. Emits the exact doubled
    U statistic for both arms, the tie mass, and the tie-corrected normal
    z approximation per stratum.

    Exactness: ranks are computed on the DISTINCT-VALUE domain with tied
    groups carrying their doubled average rank r2 = 2*cum_prev + t + 1
    (doubling keeps the .5 average ranks integer), so U arrives as the
    exact int64 u2_a = sum(t_a * r2) - n_a*(n_a+1); the z statistic is one
    shared double expression over the exact moments (the _WELCH_T
    discipline). Overflow: t^3 stays under int64 up to ~2e6 rows tied on
    ONE value per stratum; past that the tsum column swaps to
    DECIMAL(38,0) — the ab_test_welch discipline.

    Scale: the row-level scan collapses FIRST to the (segment, value)
    domain via one map-side-combinable aggregation — the rank window then
    runs over domain-sized frames (bounded by the whole-dollar price
    range, ~6e5 rows, NOT by row count — the distribution_emd_ks
    discipline), partitioned by segment. One shuffle on (segment, value),
    one on segment; output is strata-sized."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    assigned = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_custkey") % 2).cast("int").alias("arm"),
        F.expr("CAST(o_totalprice AS BIGINT)").alias("price_d"),
    )
    dom = assigned.groupBy("segment", "price_d").agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("t_a"),
    )
    w = W.partitionBy("segment").orderBy("price_d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ranked = dom.withColumn(
        "r2", 2 * (F.sum("t").over(w) - F.col("t")) + F.col("t") + 1
    )
    m = ranked.groupBy("segment").agg(
        F.sum("t_a").cast("bigint").alias("n_a"),
        (F.sum("t") - F.sum("t_a")).cast("bigint").alias("n_b"),
        F.sum(F.col("t_a") * F.col("r2")).cast("bigint").alias("r_a2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tsum"),
    )
    u = m.select(
        "segment", "n_a", "n_b", "tsum",
        F.expr("CAST(r_a2 - n_a * (n_a + 1) AS BIGINT)").alias("u2_a"),
    )
    return u.select(
        "segment",
        "n_a",
        "n_b",
        "u2_a",
        F.expr("CAST(2 * n_a * n_b - u2_a AS BIGINT)").alias("u2_b"),
        "tsum",
        F.expr(f"CAST({_MWU_Z} AS BIGINT)").alias("z_e6"),
    ).orderBy("segment")
