"""Data-governance and model-evaluation shapes: the release/audit layer a
training-data pipeline runs before anything leaves the platform.

Privacy (completing the k-anonymity / l-diversity suite in
advanced_queries.py): t-closeness over an ordinal sensitive attribute and
an epsilon-differentially-private count release with deterministic
(hash-seeded) Laplace noise so the oracle can replay it. Compliance: a
GDPR right-to-erasure cascade report and a referential-integrity orphan
audit. Quality: a Benford first-digit audit over every money column.
Evaluation: exact-rational ROC-AUC via the Mann-Whitney rank-sum (no
single-partition window — the cumulative negative count runs through
``global_prefix_sum``), isotonic calibration of the same score via the
pool-adjacent-violators minimax closed form over ntile bins, and a
multinomial naive-Bayes distillation of the rule-based quality gate with
a confusion-matrix readout. Feature plumbing: hashing-trick bucket
collision statistics.

Determinism discipline (engine-wide): money as cent-scaled BIGINT via the
shared ``CAST(x * 100 AS BIGINT)`` tree, probabilities/logs as
trunc-scaled e6/e3 integers summed as BIGINT (double sums are
association-sensitive across engines; integer sums are exact), and every
random draw replaced by an md5-derived uniform evaluated by the identical
expression tree in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql
from ..operators.ranking import global_prefix_sum
from ..tables import load_table
from .registry import query


def _cents(col: str) -> F.Column:
    return F.expr(f"CAST({col} * 100 AS BIGINT)")


_CENTS_SQL = "CAST(trunc({c} * 100) AS BIGINT)"


@query(
    "score_auc_eval",
    oracle="""
    WITH lab AS (
        SELECT c.c_custkey,
               COALESCE(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '1999-01-01'
                    THEN CAST(trunc(o.o_totalprice * 100) AS BIGINT) END), 0)
                   AS score_c,
               MAX(CASE WHEN o.o_orderdate >= TIMESTAMP '1999-01-01'
                    THEN 1 ELSE 0 END) AS label
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ),
    by_score AS (
        SELECT score_c,
               CAST(SUM(label) AS BIGINT) AS pos_n,
               CAST(SUM(1 - label) AS BIGINT) AS neg_n
        FROM lab GROUP BY score_c
    ),
    cum AS (
        SELECT score_c, pos_n, neg_n,
               SUM(neg_n) OVER (ORDER BY score_c) - neg_n AS neg_below
        FROM by_score
    ),
    tot AS (
        SELECT CAST(SUM(pos_n) AS BIGINT) AS n_pos,
               CAST(SUM(neg_n) AS BIGINT) AS n_neg,
               CAST(SUM(2 * pos_n * neg_below + pos_n * neg_n) AS BIGINT)
                   AS auc_num2
        FROM cum
    )
    SELECT n_pos, n_neg, auc_num2,
           CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den2,
           CAST(trunc(CAST(auc_num2 AS DOUBLE) / (2.0 * n_pos * n_neg) * 1e6)
                AS BIGINT) AS auc_e6
    FROM tot
    """,
)
def score_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC for a churn-style score: the score is each customer's
    pre-1999 spend (cents), the label is whether they ordered again in
    1999+ — AUC is the probability a random reactivated customer outscores
    a random lapsed one. Computed as the Mann-Whitney U rank-sum with the
    standard tie correction (ties contribute 1/2), carried as the exact
    rational (auc_num2, auc_den2) — numerator doubled so tie-halves stay
    integral — plus a trunc-scaled e6 decimal for reading.

    Scale: the fact table reduces to one row per customer (partial+final
    agg), then to one row per DISTINCT score with (pos, neg) counts. The
    cumulative negative count — the only global-order step — runs through
    ``global_prefix_sum`` (operators/ranking.py): range-partition on
    score, per-partition window, driver prefix over <=P partition totals
    broadcast back. No single-partition window anywhere; the final
    reduction is a 4-term agg to one row. At 100 TB the distinct-score
    frame is at most customer-sized and usually far smaller."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cut = "TIMESTAMP '1999-01-01'"
    lab = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.expr(f"o_orderdate < {cut}"), _cents("o_totalprice")
                    )
                ),
                F.lit(0),
            ).alias("score_c"),
            F.max(
                F.when(F.expr(f"o_orderdate >= {cut}"), F.lit(1)).otherwise(0)
            ).alias("label"),
        )
    )
    by_score = lab.groupBy("score_c").agg(
        F.sum("label").cast("bigint").alias("pos_n"),
        F.sum(F.lit(1) - F.col("label")).cast("bigint").alias("neg_n"),
    )
    cum = global_prefix_sum(
        by_score, [F.col("score_c")], "neg_n", cumsum_col="__cum_neg"
    ).withColumn("neg_below", F.col("__cum_neg") - F.col("neg_n"))
    tot = cum.agg(
        F.sum("pos_n").cast("bigint").alias("n_pos"),
        F.sum("neg_n").cast("bigint").alias("n_neg"),
        F.sum(
            2 * F.col("pos_n") * F.col("neg_below")
            + F.col("pos_n") * F.col("neg_n")
        )
        .cast("bigint")
        .alias("auc_num2"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        "auc_num2",
        (2 * F.col("n_pos") * F.col("n_neg")).cast("bigint").alias("auc_den2"),
        (
            F.col("auc_num2").cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg"))
            * 1e6
        )
        .cast("bigint")
        .alias("auc_e6"),
    )


@query(
    "t_closeness_release",
    oracle="""
    WITH joined AS (
        SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cells AS (
        SELECT c_nationkey, c_mktsegment, pri, COUNT(*) AS cnt
        FROM joined GROUP BY ALL
    ),
    grid AS (
        SELECT g.c_nationkey, g.c_mktsegment, p.pri, COALESCE(c.cnt, 0) AS cnt
        FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM cells) g
        CROSS JOIN (SELECT DISTINCT pri FROM joined) p
        LEFT JOIN cells c
          ON c.c_nationkey = g.c_nationkey
         AND c.c_mktsegment = g.c_mktsegment AND c.pri = p.pri
    ),
    gdist AS (SELECT pri, COUNT(*) AS gcnt FROM joined GROUP BY pri),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS big_n FROM joined),
    cum AS (
        SELECT grid.c_nationkey, grid.c_mktsegment, grid.pri,
               SUM(grid.cnt) OVER w AS cum_g,
               SUM(gdist.gcnt) OVER w AS cum_all,
               SUM(grid.cnt) OVER
                   (PARTITION BY grid.c_nationkey, grid.c_mktsegment) AS n_g
        FROM grid JOIN gdist USING (pri)
        WINDOW w AS (PARTITION BY grid.c_nationkey, grid.c_mktsegment
                     ORDER BY grid.pri)
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(MAX(n_g) AS BIGINT) AS n_orders,
           CAST(SUM(abs(cum_g * big_n - cum_all * n_g)) AS BIGINT) AS emd_num,
           CAST(4 * MAX(n_g) * MAX(big_n) AS BIGINT) AS emd_den,
           CAST(trunc(CAST(SUM(abs(cum_g * big_n - cum_all * n_g)) AS DOUBLE)
                      / (4.0 * MAX(n_g) * MAX(big_n)) * 1e6) AS BIGINT)
               AS emd_e6,
           SUM(abs(cum_g * big_n - cum_all * n_g)) * 5
               <= 4 * MAX(n_g) * MAX(big_n) AS released
    FROM cum CROSS JOIN n
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def t_closeness_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li/Li/Venkatasubramanian 2007), the third member of the
    privacy-release suite next to k_anonymity_release / l_diversity_release:
    a quasi-identifier group (nation, segment) may be released only if the
    distribution of its ordinal sensitive attribute (order priority,
    1-URGENT..5-LOW) is within t of the global distribution under the
    Earth Mover's Distance for ordered categories — EMD = (1/(m-1)) *
    sum_j |P_cum(j) - Q_cum(j)|. Exactness: the per-prefix gap is carried
    as the integer cross-product |cum_g*N - cum_all*n_g| (common
    denominator n_g*N), so the released gate (t = 0.2, i.e. 5*emd_num <=
    emd_den) is pure integer arithmetic.

    Scale: one shuffle to (QI, priority) cells, a QI-grid completion via a
    cross join against the 5-value priority domain (the grid is
    QI-domain-sized, never fact-sized), the global 5-row distribution
    broadcast in, and per-QI windows over exactly m=5 rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_nationkey", "c_mktsegment", F.col("o_orderpriority").alias("pri")
    )
    cells = joined.groupBy("c_nationkey", "c_mktsegment", "pri").agg(
        F.count("*").alias("cnt")
    )
    qi = cells.select("c_nationkey", "c_mktsegment").distinct()
    pris = joined.select("pri").distinct()
    grid = (
        qi.crossJoin(F.broadcast(pris))
        .join(cells, ["c_nationkey", "c_mktsegment", "pri"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    )
    glob = joined.groupBy("pri").agg(F.count("*").alias("gcnt"))
    big_n = joined.agg(F.count("*").cast("bigint").alias("big_n"))
    w = W.partitionBy("c_nationkey", "c_mktsegment").orderBy("pri")
    wg = W.partitionBy("c_nationkey", "c_mktsegment")
    cum = (
        grid.join(F.broadcast(glob), "pri")
        .crossJoin(F.broadcast(big_n))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "pri",
            "big_n",
            F.sum("cnt").over(w).alias("cum_g"),
            F.sum("gcnt").over(w).alias("cum_all"),
            F.sum("cnt").over(wg).alias("n_g"),
        )
    )
    g = cum.groupBy("c_nationkey", "c_mktsegment", "big_n").agg(
        F.max("n_g").cast("bigint").alias("n_orders"),
        F.sum(
            F.abs(
                F.col("cum_g") * F.col("big_n")
                - F.col("cum_all") * F.col("n_g")
            )
        )
        .cast("bigint")
        .alias("emd_num"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "n_orders",
        "emd_num",
        (4 * F.col("n_orders") * F.col("big_n")).cast("bigint").alias("emd_den"),
        (
            F.col("emd_num").cast("double")
            / (4.0 * F.col("n_orders") * F.col("big_n"))
            * 1e6
        )
        .cast("bigint")
        .alias("emd_e6"),
        (
            F.col("emd_num") * 5 <= 4 * F.col("n_orders") * F.col("big_n")
        ).alias("released"),
    )


@query(
    "dp_noisy_counts",
    oracle="""
    WITH g AS (
        SELECT c_mktsegment AS segment,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY ALL
    ),
    u AS (
        SELECT segment, order_year, n,
               (CAST(('0x' || substr(md5(segment || '|' || order_year), 1, 8))
                     AS BIGINT) % 1048576 + 0.5) / 1048576.0 AS unif
        FROM g
    )
    SELECT segment, order_year, n,
           CAST(trunc(-sign(unif - 0.5) * ln(1.0 - 2.0 * abs(unif - 0.5))
                      * 1000) AS BIGINT) AS noise_e3,
           CAST(n * 1000
                + CAST(trunc(-sign(unif - 0.5) * ln(1.0 - 2.0 * abs(unif - 0.5))
                             * 1000) AS BIGINT) AS BIGINT) AS noisy_e3
    FROM u
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-differentially-private count release (Dwork 2006, Laplace
    mechanism, eps=1, sensitivity 1) over (segment, order year) cohorts —
    the fourth privacy gate next to k-anonymity / l-diversity /
    t-closeness: each released count carries additive Laplace(1/eps) noise
    via the inverse CDF  -b*sgn(u-1/2)*ln(1-2|u-1/2|).

    Determinism: u is an md5-derived 20-bit uniform of the GROUP KEY
    ((k+0.5)/2^20, so u is never exactly 0/1/0.5-adjacent-zero and ln's
    argument is >= 2^-20) — the draw is a pure function of the key
    evaluated by the identical expression tree in both engines, which is
    what makes a DP release replayable under audit (and this oracle
    checkable). True n is emitted alongside for the parity check; a real
    release projects it away.

    Scale: partial+final count agg to a cohort-sized frame; the noise is a
    projection. Nothing else moves."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    unif = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("segment"), F.col("order_year"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1048576
        )
        + 0.5
    ) / 1048576.0
    noise_e3 = (
        -F.signum(unif - 0.5) * F.log(1.0 - 2.0 * F.abs(unif - 0.5)) * 1000
    ).cast("bigint")
    return g.select(
        "segment",
        "order_year",
        "n",
        noise_e3.alias("noise_e3"),
        (F.col("n") * 1000 + noise_e3).cast("bigint").alias("noisy_e3"),
    )


@query(
    "gdpr_deletion_cascade",
    oracle="""
    WITH subjects AS (
        SELECT c_custkey FROM customer WHERE c_acctbal < -900
    ),
    del_orders AS (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM subjects)
    )
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               (SELECT COUNT(*) FROM subjects) AS rows_purged,
               (SELECT COUNT(*) FROM customer) -
                   (SELECT COUNT(*) FROM subjects) AS rows_retained,
               CAST(0 AS BIGINT) AS value_purged_c
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM del_orders),
               (SELECT COUNT(*) FROM orders) -
                   (SELECT COUNT(*) FROM del_orders),
               CAST((SELECT COALESCE(SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)), 0)
                FROM del_orders) AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
               (SELECT COUNT(*) FROM lineitem) -
                   (SELECT COUNT(*) FROM lineitem
                    WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
               CAST((SELECT COALESCE(SUM(CAST(trunc(l_extendedprice * 100) AS BIGINT)), 0)
                FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)) AS BIGINT)
        UNION ALL
        SELECT 'events',
               (SELECT COUNT(*) FROM events
                WHERE user_id IN (SELECT c_custkey FROM subjects)),
               (SELECT COUNT(*) FROM events) -
                   (SELECT COUNT(*) FROM events
                    WHERE user_id IN (SELECT c_custkey FROM subjects)),
               CAST(0 AS BIGINT)
    )
    """,
)
def gdpr_deletion_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR Art.17 right-to-erasure impact report: given a deletion-subject
    set (here the deterministic slice c_acctbal < -900), follow every
    foreign-key edge the subject's data reaches — their customer row, their
    orders, those orders' line items, their event stream — and report per
    table how many rows a compliant purge removes, how many remain, and
    the monetary value leaving the books. This is the dry-run audit a
    pipeline publishes before executing the actual anti-join rewrite
    (which is exactly `table.join(subjects, ..., "left_anti")` per edge).

    Scale: the subject set is tiny relative to the corpus — every cascade
    membership test is a broadcast semi-join against it (orders' keys then
    re-broadcast for lineitem); each per-table readout is a partial+final
    count/sum. Four one-row frames unioned; no fact-sized intermediate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")
    subjects = c.filter(F.col("c_acctbal") < -900).select("c_custkey")
    del_orders = o.join(
        F.broadcast(subjects), o.o_custkey == subjects.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")

    def one(name: str, purged, retained, value_c) -> DataFrame:
        return spark.range(1).select(
            F.lit(name).alias("table_name"),
            F.lit(purged).cast("bigint").alias("rows_purged"),
            F.lit(retained).cast("bigint").alias("rows_retained"),
            F.lit(value_c).cast("bigint").alias("value_purged_c"),
        )

    n_subj = subjects.count()
    n_cust = c.count()
    o_agg = del_orders.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0)).alias("v"),
    ).first()
    n_orders = o.count()
    del_li = li.join(
        F.broadcast(del_orders.select("o_orderkey")),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    li_agg = del_li.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(_cents("l_extendedprice")), F.lit(0)).alias("v"),
    ).first()
    n_li = li.count()
    n_del_e = e.join(
        F.broadcast(subjects), e.user_id == subjects.c_custkey, "left_semi"
    ).count()
    n_e = e.count()
    return (
        one("customer", n_subj, n_cust - n_subj, 0)
        .unionAll(one("orders", o_agg["n"], n_orders - o_agg["n"], o_agg["v"]))
        .unionAll(one("lineitem", li_agg["n"], n_li - li_agg["n"], li_agg["v"]))
        .unionAll(one("events", n_del_e, n_e - n_del_e, 0))
    )


@query(
    "referential_orphan_audit",
    oracle="""
    SELECT * FROM (
        SELECT 'orders.o_custkey->customer' AS relationship,
               (SELECT COUNT(*) FROM orders) AS child_rows,
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
                   AS orphan_rows,
               (SELECT COUNT(*) FROM customer) AS parent_rows,
               (SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_custkey = c.c_custkey))
                   AS childless_parents
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)),
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
        UNION ALL
        SELECT 'events.user_id->customer',
               (SELECT COUNT(*) FROM events),
               (SELECT COUNT(*) FROM events e
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = e.user_id)),
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM events e
                                  WHERE e.user_id = c.c_custkey))
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey)),
               (SELECT COUNT(*) FROM nation),
               (SELECT COUNT(*) FROM nation n
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_nationkey = n.n_nationkey))
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM part p
                                  WHERE p.p_partkey = l.l_partkey)),
               (SELECT COUNT(*) FROM part),
               (SELECT COUNT(*) FROM part p
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_partkey = p.p_partkey))
    )
    """,
)
def referential_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's five FK edges:
    per relationship, how many child rows point at a missing parent
    (orphans — a broken ingest) and how many parents have no children
    (childless — a coverage signal, not an error). The data-quality
    counterpart of data_quality_report's per-column rules, at the
    cross-table level; on healthy TPC-H-shaped data every orphan count is
    0 and the childless counts are the interesting numbers.

    Scale: each direction is one anti-join (left_anti) counted by a
    partial+final agg — Spark picks broadcast for the dim side and
    shuffle-hash for fact-fact (lineitem vs orders); the five audits are
    independent one-row frames unioned, so the whole report is
    embarrassingly parallel across edges."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "events", "nation", "part")}

    def audit(name, child, ckey, parent, pkey) -> DataFrame:
        orphans = child.join(
            parent, child[ckey] == parent[pkey], "left_anti"
        ).count()
        childless = parent.join(
            child, child[ckey] == parent[pkey], "left_anti"
        ).count()
        return spark.range(1).select(
            F.lit(name).alias("relationship"),
            F.lit(child.count()).cast("bigint").alias("child_rows"),
            F.lit(orphans).cast("bigint").alias("orphan_rows"),
            F.lit(parent.count()).cast("bigint").alias("parent_rows"),
            F.lit(childless).cast("bigint").alias("childless_parents"),
        )

    return (
        audit("orders.o_custkey->customer", t["orders"], "o_custkey",
              t["customer"], "c_custkey")
        .unionAll(audit("lineitem.l_orderkey->orders", t["lineitem"],
                        "l_orderkey", t["orders"], "o_orderkey"))
        .unionAll(audit("events.user_id->customer", t["events"], "user_id",
                        t["customer"], "c_custkey"))
        .unionAll(audit("customer.c_nationkey->nation", t["customer"],
                        "c_nationkey", t["nation"], "n_nationkey"))
        .unionAll(audit("lineitem.l_partkey->part", t["lineitem"],
                        "l_partkey", t["part"], "p_partkey"))
    )


# Benford expected first-digit probabilities, e6-scaled: log10(1 + 1/d).
_BENFORD_E6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_VALUES_SQL = ", ".join(f"({d}, {p})" for d, p in _BENFORD_E6.items())


@query(
    "benford_digit_audit",
    oracle=f"""
    WITH vals AS (
        SELECT 'orders.o_totalprice' AS src,
               {_CENTS_SQL.format(c='o_totalprice')} AS c FROM orders
        UNION ALL
        SELECT 'lineitem.l_extendedprice',
               {_CENTS_SQL.format(c='l_extendedprice')} FROM lineitem
        UNION ALL
        SELECT 'customer.c_acctbal',
               {_CENTS_SQL.format(c='c_acctbal')} FROM customer
        UNION ALL
        SELECT 'events.value', {_CENTS_SQL.format(c='value')} FROM events
    ),
    digits AS (
        SELECT src, CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
        FROM vals WHERE c > 0
    ),
    obs AS (
        SELECT src, digit, CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY src) AS BIGINT) AS n_src
        FROM digits GROUP BY src, digit
    ),
    benford(digit, p_e6) AS (VALUES {_BENFORD_VALUES_SQL})
    SELECT src, obs.digit, n_obs, n_src,
           CAST(n_src * p_e6 AS BIGINT) AS expected_e6,
           CAST(trunc(
               (n_obs - n_src * p_e6 / 1e6) * (n_obs - n_src * p_e6 / 1e6)
               / (n_src * p_e6 / 1e6) * 1000) AS BIGINT) AS chi2_contrib_e3
    FROM obs JOIN benford ON benford.digit = obs.digit
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over every money/metric column —
    the classic fabricated-data / unit-mixup screen a data-quality layer
    runs on financial columns: per (column, leading digit 1..9) the
    observed count, the Benford-expected mass (e6-scaled integer constants
    log10(1+1/d), identical literals in both engines), and the trunc-scaled
    chi-square contribution. Synthetic uniform-ish prices will FAIL the
    audit (huge chi2) — that is the correct verdict on this corpus and
    exactly what the report is for.

    Determinism: values are cent-scaled to BIGINT first and the leading
    digit comes from the integer's string form — no float log10 at the
    digit boundary. The chi-square term is one shared double tree per row,
    trunc-scaled to e3.

    Scale: a stacked single scan per source column (column-pruned to one
    numeric each), partial+final count agg to <= 9 rows per source, and a
    9-row broadcast constants join."""
    frames = []
    for src, table, col in (
        ("orders.o_totalprice", "orders", "o_totalprice"),
        ("lineitem.l_extendedprice", "lineitem", "l_extendedprice"),
        ("customer.c_acctbal", "customer", "c_acctbal"),
        ("events.value", "events", "value"),
    ):
        frames.append(
            load_table(spark, sf_dir, table).select(
                F.lit(src).alias("src"), _cents(col).alias("c")
            )
        )
    vals = frames[0].unionAll(frames[1]).unionAll(frames[2]).unionAll(frames[3])
    digits = vals.filter(F.col("c") > 0).select(
        "src", F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    obs = (
        digits.groupBy("src", "digit")
        .agg(F.count("*").cast("bigint").alias("n_obs"))
        .withColumn(
            "n_src", F.sum("n_obs").over(W.partitionBy("src")).cast("bigint")
        )
    )
    benford = spark.createDataFrame(
        sorted(_BENFORD_E6.items()), "digit int, p_e6 bigint"
    )
    exp_d = F.col("n_src") * F.col("p_e6") / 1e6
    return obs.join(F.broadcast(benford), "digit").select(
        "src",
        "digit",
        "n_obs",
        "n_src",
        (F.col("n_src") * F.col("p_e6")).cast("bigint").alias("expected_e6"),
        (
            (F.col("n_obs") - exp_d) * (F.col("n_obs") - exp_d) / exp_d * 1000
        )
        .cast("bigint")
        .alias("chi2_contrib_e3"),
    )


@query(
    "feature_hash_collisions",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT unnest({tokenize_sql('text')}) AS token FROM documents
    ),
    buckets AS (
        SELECT CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 4096
                   AS bucket,
               COUNT(*) AS load
        FROM toks GROUP BY bucket
    ),
    hist AS (
        SELECT CAST(load AS BIGINT) AS bucket_load,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(load * COUNT(*) AS BIGINT) AS n_tokens
        FROM buckets GROUP BY load
    )
    SELECT * FROM hist
    UNION ALL
    SELECT 0, 4096 - (SELECT COUNT(*) FROM buckets), 0
    """,
)
def feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick diagnostics: project the corpus vocabulary into 4096
    feature buckets (the md5-derived 32-bit hash mod dimension — the
    standard feature-hashing setup for linear models over text) and report
    the bucket-load histogram including empty buckets — load 2+ rows are
    collisions, the quantity that trades model fidelity against the fixed
    feature dimension. This is how a pipeline picks the hash dimension
    before training, instead of guessing.

    Scale: token explode -> distinct (the vocabulary, already sublinear in
    corpus size), one groupBy on the 4096-value bucket key, then a
    histogram over at most 4096 rows. The empty-bucket row is arithmetic
    on the occupied count, not a 4096-row scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("token")).distinct()
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint") % 4096
    )
    buckets = toks.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("load"))
    hist = buckets.groupBy("load").agg(F.count("*").alias("n_buckets")).select(
        F.col("load").cast("bigint").alias("bucket_load"),
        F.col("n_buckets").cast("bigint"),
        (F.col("load") * F.col("n_buckets")).cast("bigint").alias("n_tokens"),
    )
    n_occupied = buckets.count()
    empty = spark.range(1).select(
        F.lit(0).cast("bigint").alias("bucket_load"),
        F.lit(4096 - n_occupied).cast("bigint").alias("n_buckets"),
        F.lit(0).cast("bigint").alias("n_tokens"),
    )
    return hist.unionAll(empty)


@query(
    "naive_bayes_quality_distill",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, unnest({tokenize_sql('text')}) AS token
        FROM documents
    ),
    lab AS (
        SELECT doc_id,
               CASE WHEN 1000 * SUM(CASE WHEN token IN ('the', 'a')
                                    THEN 1 ELSE 0 END) >= 61 * COUNT(*)
                    THEN 'keep' ELSE 'drop' END AS lang
        FROM raw GROUP BY doc_id
    ),
    occ AS (SELECT raw.doc_id, lab.lang, raw.token
            FROM raw JOIN lab USING (doc_id)),
    train_occ AS (SELECT * FROM occ WHERE doc_id % 5 <> 0),
    test_occ AS (SELECT * FROM occ WHERE doc_id % 5 = 0),
    freq AS (
        SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM train_occ GROUP BY lang, token
    ),
    tot AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot_s
        FROM train_occ GROUP BY lang
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM train_occ
    ),
    prior AS (
        SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_s,
               CAST(SUM(COUNT(DISTINCT doc_id)) OVER () AS BIGINT) AS n_docs
        FROM train_occ GROUP BY lang
    ),
    scored AS (
        SELECT t.doc_id, t.lang AS actual, p.lang AS candidate,
               CAST(SUM(CAST(trunc(ln(
                   CAST(COALESCE(f.cnt, 0) + 1 AS DOUBLE) / (tot.tot_s + vocab.v)
               ) * 1e6) AS BIGINT)) AS BIGINT)
               + CAST(trunc(ln(CAST(p.n_docs_s AS DOUBLE) / p.n_docs) * 1e6)
                      AS BIGINT) AS score_e6
        FROM test_occ t
        CROSS JOIN prior p
        JOIN tot ON tot.lang = p.lang
        CROSS JOIN vocab
        LEFT JOIN freq f ON f.lang = p.lang AND f.token = t.token
        GROUP BY t.doc_id, t.lang, p.lang, p.n_docs_s, p.n_docs
    ),
    best AS (
        SELECT doc_id, actual, candidate AS predicted,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score_e6 DESC, candidate) AS rn
        FROM scored
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM best WHERE rn = 1
    GROUP BY actual, predicted
    """,
)
def naive_bayes_quality_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision distillation: train a multinomial naive Bayes
    (Laplace +1) on the corpus' own 80/20 split (doc_id % 5) to reproduce
    the RULE-BASED quality gate (label = stopword mass >= 6.1% of tokens,
    the quality_filter_pipeline-style signal, as the exact integer rule
    1000*n_stop >= 61*n_tokens), and report the (actual, predicted, n)
    confusion matrix on the held-out fifth. This is the standard pattern
    for scaling a hand-written labeler: distill it into a statistical
    model, measure agreement, then run the cheap model where the rule's
    inputs aren't available. (The synthetic corpus' lang/source columns
    carry no vocabulary signal — a classifier on those scores at chance —
    so the distillation target is the honest learnable task here.) Unseen
    test tokens get the smoothed floor 1/(tot_s+V) via the left join's
    COALESCE(cnt,0).

    Determinism: the label rule is pure integer arithmetic; per-occurrence
    ln P(token|label) and the prior term are trunc-scaled e6 BIGINTs
    summed exactly (shared-libm ln discipline, see unigram_logprob_scores);
    argmax breaks score ties on the candidate name, so the prediction is a
    total function.

    Scale: labeling + training are three shuffles (per-doc rule agg,
    token x label counts, per-label totals); the doc-dimension label
    frame and the (label, vocab)-sized model are localCheckpoint'd, and
    the per-label totals / vocabulary size derive from the model rather
    than re-scanning the corpus — the token explode executes once for
    training and once for the test fifth.

    Scoring shape (round-11 optimization, guide §2.3/§2.4): the model is
    PIVOTED to one row per token (cnt_<label> columns — the label domain
    is data-derived but tiny, collected once off the checkpointed model),
    so each test occurrence joins the model ONCE and computes every
    candidate's log-likelihood as sibling columns. The previous form
    fanned the test stream out |labels|x through a broadcast crossJoin
    and re-assembled with a per-doc rank window — the new shape shuffles
    the occurrence stream once instead of |labels| times and replaces the
    window with a greatest()-over-structs argmax (struct comparison =
    score DESC, candidate ASC — the kmeans_fixed_point trick), entirely
    map-side. Vocabulary size and the label priors stay in-plan as 1-row
    broadcast frames (no extra driver jobs; the ln stays on JVM libm).
    Plan delta (plans/r11/naive_bayes_quality_distill_{before,after}.txt,
    node counts in the formatted dumps): Window 6 -> 0 (the rank window
    and its WindowGroupLimit twins), BroadcastNestedLoopJoin 6 -> 4,
    Exchange 32 -> 22 — the |labels|-fanned occurrence exchange now
    ships each test occurrence once. A/B at sf0.1: paired runs old [2.04,
    2.05, 2.08, 2.09] vs new [1.90, 2.01, 1.90, 1.86] s, rows equal at
    sf0.01 and sf0.1."""
    d = load_table(spark, sf_dir, "documents")
    raw = d.select("doc_id", F.explode(tokenize("text")).alias("token"))
    # doc-dimension sized — pin it so the rule explode runs once, not
    # once per downstream branch
    lab = raw.groupBy("doc_id").agg(
        F.when(
            1000
            * F.sum(F.when(F.col("token").isin("the", "a"), 1).otherwise(0))
            >= 61 * F.count("*"),
            F.lit("keep"),
        )
        .otherwise(F.lit("drop"))
        .alias("lang")
    ).localCheckpoint()
    occ = raw.join(lab, "doc_id").select("doc_id", "lang", "token")
    train = occ.filter(F.col("doc_id") % 5 != 0)
    test = occ.filter(F.col("doc_id") % 5 == 0)
    # the (label, token) model is (labels x vocab)-sized — pin it and
    # derive the per-label totals and the vocabulary size FROM it, so
    # the train-occurrence explode executes exactly once (previously
    # each aggregate re-scanned and re-exploded the corpus: 12 parquet
    # scans in the expanded plan)
    freq = train.groupBy("lang", "token").agg(
        F.count("*").cast("bigint").alias("cnt")
    ).localCheckpoint()
    # candidate domain = labels with >= 1 train occurrence (the oracle's
    # prior INNER JOIN tot) — tiny, collected once off the pinned model;
    # the integer totals ride along as literals (exact cross-engine)
    trows = (
        freq.groupBy("lang")
        .agg(F.sum("cnt").cast("bigint").alias("tot_s"))
        .collect()
    )
    tot = {r["lang"]: int(r["tot_s"]) for r in trows}
    langs = sorted(tot)
    if not langs:
        # no train occurrences: no candidates, empty confusion matrix
        return spark.createDataFrame(
            [], "actual string, predicted string, n_docs bigint"
        )
    vocab = freq.agg(F.countDistinct("token").cast("bigint").alias("v"))
    # the model pivoted to one row per token: cnt_<label> sibling columns
    fp = freq.groupBy("token").agg(
        *[
            F.max(F.when(F.col("lang") == l, F.col("cnt"))).alias(f"__c{i}")
            for i, l in enumerate(langs)
        ]
    )
    t = test.select("doc_id", F.col("lang").alias("actual"), "token")
    joined = t.crossJoin(F.broadcast(vocab)).join(
        fp.hint("shuffle_hash"), "token", "left"
    )
    lls = [
        (
            F.log(
                (F.coalesce(F.col(f"__c{i}"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.lit(tot[l]) + F.col("v"))
            )
            * 1e6
        ).cast("bigint")
        for i, l in enumerate(langs)
    ]
    agg = joined.groupBy("doc_id", "actual").agg(
        *[F.sum(ll).cast("bigint").alias(f"__s{i}") for i, ll in enumerate(lls)]
    )
    per_src = (
        lab.filter(F.col("doc_id") % 5 != 0)
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    pr1 = per_src.agg(
        *[
            F.max(F.when(F.col("lang") == l, F.col("n"))).alias(f"__nd{i}")
            for i, l in enumerate(langs)
        ],
        F.sum("n").cast("bigint").alias("__ndocs"),
    )
    scored = agg.crossJoin(F.broadcast(pr1))
    scores = [
        (
            F.col(f"__s{i}")
            + (
                F.log(F.col(f"__nd{i}").cast("double") / F.col("__ndocs")) * 1e6
            ).cast("bigint")
        ).cast("bigint")
        for i in range(len(langs))
    ]
    # argmax with the window's exact tie-break (score DESC, candidate ASC):
    # greatest() over (score, reversed-candidate-rank) structs
    if len(langs) == 1:
        pred = F.lit(langs[0])
    else:
        best = F.greatest(
            *[
                F.struct(s.alias("s"), F.lit(len(langs) - 1 - i).alias("r"))
                for i, s in enumerate(scores)
            ]
        )
        pred = F.element_at(
            F.array(*[F.lit(l) for l in langs]),
            (F.lit(len(langs)) - best.getField("r")).cast("int"),
        )
    best_df = scored.select("doc_id", "actual", pred.alias("predicted"))
    return best_df.groupBy("actual", "predicted").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


@query(
    "isotonic_calibration_bins",
    oracle="""
    WITH lab AS (
        SELECT c.c_custkey,
               COALESCE(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '1999-01-01'
                    THEN CAST(trunc(o.o_totalprice * 100) AS BIGINT) END), 0)
                   AS score_c,
               MAX(CASE WHEN o.o_orderdate >= TIMESTAMP '1999-01-01'
                    THEN 1 ELSE 0 END) AS label
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ),
    binned AS (
        SELECT label,
               NTILE(20) OVER (ORDER BY score_c, c_custkey) AS bin
        FROM lab
    ),
    bins AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(label) AS BIGINT) AS pos_b
        FROM binned GROUP BY bin
    ),
    cum AS (
        SELECT bin, n_b, pos_b,
               SUM(n_b) OVER (ORDER BY bin) AS cn,
               SUM(pos_b) OVER (ORDER BY bin) AS cp
        FROM bins
    ),
    pairs AS (
        SELECT i.bin AS i, j.bin AS j,
               CAST(j.cp - (i.cp - i.pos_b) AS DOUBLE)
                   / (j.cn - (i.cn - i.n_b)) AS avg_ij
        FROM cum i JOIN cum j ON j.bin >= i.bin
    ),
    lower_env AS (
        SELECT i, MIN(avg_ij) AS minavg FROM pairs GROUP BY i
    )
    SELECT b.bin, b.n_b, b.pos_b,
           CAST(trunc(CAST(b.pos_b AS DOUBLE) / b.n_b * 1e6) AS BIGINT)
               AS rate_e6,
           CAST(trunc(MAX(e.minavg) * 1e6) AS BIGINT) AS calib_e6
    FROM bins b JOIN lower_env e ON e.i <= b.bin
    GROUP BY b.bin, b.n_b, b.pos_b
    """,
)
def isotonic_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of the churn score from
    score_auc_eval via pool-adjacent-violators in its minimax closed form:
    over 20 equal-frequency score bins, the calibrated positive rate of
    bin t is max_{i<=t} min_{j>=i} rate(i..j) — the PAV solution without
    any sequential pooling loop, so the whole fit is three joins over a
    20-row frame. The standard post-hoc calibration step after ranking
    quality (AUC) is established: monotone by construction, and it maps
    raw scores to usable probabilities.

    Determinism: bin assignment is SQL NTILE under the total order
    (score, custkey) — Spark reproduces it bit-exactly with
    ``scalable_ntile`` (no global window); pooled rates compare as
    identical IEEE doubles (same int/int division both engines) and are
    emitted trunc-scaled e6.

    Scale: the fact reduces to one row per customer, the bin assignment is
    the distributed two-pass rank, and everything after operates on B=20
    rows (the B x B pair frame is 210 rows). Raising B to 1000 at 100 TB
    keeps the PAV frame ~0.5M pairs — still one task's work; prefix sums
    on the bin frame are join-based, so no single-partition window exists
    even there."""
    from ..operators.ranking import scalable_ntile

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cut = "TIMESTAMP '1999-01-01'"
    lab = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.expr(f"o_orderdate < {cut}"), _cents("o_totalprice"))
                ),
                F.lit(0),
            ).alias("score_c"),
            F.max(
                F.when(F.expr(f"o_orderdate >= {cut}"), F.lit(1)).otherwise(0)
            ).alias("label"),
        )
    )
    binned = scalable_ntile(
        lab, 20, [F.col("score_c"), F.col("c_custkey")], tile_col="bin"
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum("label").cast("bigint").alias("pos_b"),
    )
    # join-based prefix sums over the 20-row bin frame (no global window).
    # Every inequality join below broadcasts its build side: the bin frame
    # is B rows by construction, and the explicit hint makes the planner
    # emit BroadcastNestedLoopJoin instead of CartesianProduct (same work
    # at B=20, but the broadcast shape is the one that stays sane if B is
    # ever raised — and the registry-wide plan lint forbids cartesians).
    a, b = bins.alias("a"), bins.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.bin") <= F.col("a.bin"))
        .groupBy(F.col("a.bin").alias("bin"), F.col("a.n_b").alias("n_b"),
                 F.col("a.pos_b").alias("pos_b"))
        .agg(
            F.sum("b.n_b").cast("bigint").alias("cn"),
            F.sum("b.pos_b").cast("bigint").alias("cp"),
        )
    )
    i, j = cum.alias("i"), cum.alias("j")
    pairs = i.join(F.broadcast(j), F.col("j.bin") >= F.col("i.bin")).select(
        F.col("i.bin").alias("i"),
        (
            (F.col("j.cp") - (F.col("i.cp") - F.col("i.pos_b"))).cast("double")
            / (F.col("j.cn") - (F.col("i.cn") - F.col("i.n_b")))
        ).alias("avg_ij"),
    )
    lower_env = pairs.groupBy("i").agg(F.min("avg_ij").alias("minavg"))
    return (
        bins.join(F.broadcast(lower_env), lower_env.i <= bins.bin)
        .groupBy("bin", "n_b", "pos_b")
        .agg(F.max("minavg").alias("__calib"))
        .select(
            "bin",
            "n_b",
            "pos_b",
            (F.col("pos_b").cast("double") / F.col("n_b") * 1e6)
            .cast("bigint")
            .alias("rate_e6"),
            (F.col("__calib") * 1e6).cast("bigint").alias("calib_e6"),
        )
    )


@query(
    "fd_violation_audit",
    oracle="""
    WITH checks AS (
        SELECT 'orders: o_custkey -> o_orderpriority' AS fd, lhs,
               COUNT(DISTINCT rhs) AS nd, COUNT(*) AS c
        FROM (SELECT CAST(o_custkey AS VARCHAR) AS lhs,
                     o_orderpriority AS rhs FROM orders)
        GROUP BY lhs
        UNION ALL
        SELECT 'lineitem: l_partkey -> l_returnflag', lhs,
               COUNT(DISTINCT rhs), COUNT(*)
        FROM (SELECT CAST(l_partkey AS VARCHAR) AS lhs,
                     l_returnflag AS rhs FROM lineitem)
        GROUP BY lhs
        UNION ALL
        SELECT 'documents: text_digest -> lang', lhs,
               COUNT(DISTINCT rhs), COUNT(*)
        FROM (SELECT md5(trim(regexp_replace(lower(text),
                          '[^\\p{L}\\p{N}]+', ' ', 'g'))) AS lhs,
                     lang AS rhs FROM documents)
        GROUP BY lhs
        UNION ALL
        SELECT 'customer: c_custkey -> c_nationkey', lhs,
               COUNT(DISTINCT rhs), COUNT(*)
        FROM (SELECT CAST(c_custkey AS VARCHAR) AS lhs,
                     CAST(c_nationkey AS VARCHAR) AS rhs FROM customer)
        GROUP BY lhs
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN c ELSE 0 END) AS BIGINT)
               AS n_violating_rows,
           CAST(MAX(nd) AS BIGINT) AS max_distinct_rhs
    FROM checks GROUP BY fd
    """,
)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (the profiling step of schema/quality
    tooling a la Metanome/HoloClean): for each candidate FD lhs -> rhs,
    count determinant groups, groups where the dependency is violated
    (>1 distinct rhs), the row mass inside violating groups, and the
    worst group's distinct-rhs count. Four candidates spanning the
    schema: a true key dependency (c_custkey -> c_nationkey, must report
    0 violations — a nonzero here means upstream corruption), two
    expected-to-fail behavioral ones (customer -> order priority, part ->
    return flag), and the dedup-relevant text-digest -> lang (identical
    normalized text claiming different languages is exactly the labeling
    noise a corpus pipeline wants surfaced before language-stratified
    sampling).

    Scale: each check is one groupBy on the determinant with a distinct
    count — map-side combinable, shuffle key = the determinant; the four
    checks union AFTER collapsing to per-FD summary rows. Exact
    COUNT(DISTINCT) per group is cheap because it nests inside the
    groupBy (no global Expand); at extreme determinant cardinality the
    same plan swaps to approx_count_distinct as table_stats_profile
    documents."""
    from ..operators.dedup import text_digest

    def check(df: DataFrame, fd: str, lhs, rhs) -> DataFrame:
        g = df.select(lhs.cast("string").alias("lhs"), rhs.alias("rhs")).groupBy(
            "lhs"
        ).agg(F.countDistinct("rhs").alias("nd"), F.count("*").alias("c"))
        return g.agg(
            F.lit(fd).alias("fd"),
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_groups"),
            F.sum(F.when(F.col("nd") > 1, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_violating_rows"),
            F.max("nd").cast("bigint").alias("max_distinct_rhs"),
        ).select("fd", "n_groups", "n_violating_groups", "n_violating_rows",
                 "max_distinct_rhs")

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    d = load_table(spark, sf_dir, "documents")
    c = load_table(spark, sf_dir, "customer")
    return (
        check(o, "orders: o_custkey -> o_orderpriority",
              F.col("o_custkey"), F.col("o_orderpriority"))
        .unionByName(check(li, "lineitem: l_partkey -> l_returnflag",
                           F.col("l_partkey"), F.col("l_returnflag")))
        .unionByName(check(d.select(text_digest("text").alias("digest"), "lang"),
                           "documents: text_digest -> lang",
                           F.col("digest"), F.col("lang")))
        .unionByName(check(c, "customer: c_custkey -> c_nationkey",
                           F.col("c_custkey"), F.col("c_nationkey").cast("string")))
    )
