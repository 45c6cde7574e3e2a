"""Bucketed-layout evidence: the same orders⋈lineitem join plans a shuffle
on plain parquet and ZERO exchanges on the bucketed layout — the persisted
co-location that makes repeated fact-fact joins affordable at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table

from tests.test_plans import explain_text


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "bt_orders", str(base / "orders"),
        "o_orderkey", n_buckets=8,
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "bt_lineitem", str(base / "lineitem"),
        "l_orderkey", n_buckets=8,
    )
    yield "bt_orders", "bt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        txt = explain_text(j)
        assert "SortMergeJoin" in txt
        assert "Exchange" not in txt, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_plain_join_shuffles_but_matches(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem")
        plain = o.join(l, o.o_orderkey == l.l_orderkey)
        assert "Exchange" in explain_text(plain)
        bucketed = bucketed_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        assert bucketed.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_q18_shape_zero_fact_exchange(spark, bucketed_tables):
    """The TPC-H q18 core on the bucketed layout: the lineitem HAVING
    aggregation, the semi-join of orders against the qualifying keys, and
    the final per-order re-aggregation all ride the bucket distribution —
    zero Exchange operators in the whole plan (DEPLOY.md L1's consumer
    profile, verified end to end rather than join-only)."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(lt)
        l = spark.table(rt)
        big = (
            l.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .filter(F.col("qty") > 300)
        )
        q18 = (
            o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
            .join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderkey", "o_totalprice", "o_orderdate")
            .agg(F.sum("l_quantity").alias("total_qty"))
        )
        txt = explain_text(q18)
        assert "Exchange" not in txt, "q18 shape must be exchange-free on buckets"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
