"""TPC-H suite (plans/tpch_queries.py): Spark-vs-Spark decorrelation twins.

The DuckDB oracle gate (test_oracle_parity) already value-checks every TPC-H
query cross-engine. These tests pin a different axis: the hand-decorrelated
DataFrame plans (aggregate + join-back instead of correlated subqueries)
must equal the LITERAL correlated-subquery form executed by Spark's own
subquery machinery. If a decorrelation is subtly wrong (ties, NULL
semantics, duplicate handling), the DuckDB twin — written in the same
decorrelated shape — could be wrong in the same way; the literal form
cannot.

Runs at sf0.001 (the shapes, not the volume, are under test here).
"""

from __future__ import annotations

import pytest

from code_challenge___data_engineer___machinemax_spark import plans
from code_challenge___data_engineer___machinemax_spark.tables import TABLES, load_table

SF = "/root/testdata/sf0.001"

_QUERIES = plans.all_queries()

# literal Spark SQL with the correlated subquery kept intact — Catalyst's
# own decorrelation is the independent referee
_LITERAL = {
    "q2_min_cost_supplier": """
        WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        cand AS (
            SELECT p_partkey, p_name, s_name, s_acctbal, n_name
            FROM part
            JOIN bridge ON p_partkey = l_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_size = 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM cand c
        WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                           WHERE c2.p_partkey = c.p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAYS)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q17_small_quantity_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
               / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, COUNT(DISTINCT o_orderkey) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "q22_global_sales_opportunity": """
        SELECT n_name, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
                   AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
          AND c_acctbal > (
              SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
                     / COUNT(*)
              FROM customer c2
              WHERE c2.c_acctbal > 0.00
                AND c2.c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY n_name
        ORDER BY n_name
    """,
    "q11_important_parts": """
        WITH pv AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(24,6))) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
            GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
        FROM pv
        WHERE CAST(val AS DOUBLE) >
              (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM pv)
        ORDER BY part_value DESC, p_partkey
    """,
    "q15_top_supplier": """
        WITH revenue0 AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(24,6))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue0)
        ORDER BY s_suppkey
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
                   AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 300)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q20_dominant_suppliers": """
        WITH shipped AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_partkey, l_suppkey
        ),
        tot AS (SELECT l_partkey, SUM(sq) AS tq FROM shipped
                GROUP BY l_partkey)
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT shipped.l_suppkey
            FROM shipped
            JOIN tot ON shipped.l_partkey = tot.l_partkey
            JOIN part ON p_partkey = shipped.l_partkey
            WHERE p_name LIKE '%bolt%' AND sq > 0.5 * tq
        )
        ORDER BY s_suppkey
    """,
}


@pytest.fixture(scope="module")
def views(spark):
    for t in TABLES:
        load_table(spark, SF, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


@pytest.mark.parametrize("name", sorted(_LITERAL))
def test_decorrelated_plan_matches_literal_subquery(name, spark, views):
    got = _QUERIES[name](spark, SF).collect()
    want = spark.sql(_LITERAL[name]).collect()
    norm = lambda rows: sorted([tuple(r) for r in rows], key=repr)  # noqa: E731
    assert norm(got) == norm(want)
