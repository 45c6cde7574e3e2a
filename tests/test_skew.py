"""Skew utilities: salted results must equal unsalted results exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: (r.n, round(r.v, 4), r.mx)
        for r in e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("v"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.event_type: (r.n, round(r.v, 4), r.mx)
        for r in salted_aggregate(
            e,
            ["event_type"],
            {
                "n": ("sum", F.count("*")),
                "v": ("sum", F.sum(F.col("value").cast("decimal(20,6)")).cast("double")),
                "mx": ("max", F.max("value")),
            },
            salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").limit(500)
    c = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").count()
    salted = salted_broadcast_left(o, c, "o_custkey", salts=4).count()
    assert salted == plain