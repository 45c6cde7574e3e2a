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
