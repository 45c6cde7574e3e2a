"""Similarity-search semantics: exact top-k ordering and LSH recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
    ann_topk_lsh,
    cosine,
    cosine_topk,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    vals = [r.c for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert vals[0] == 1.0
    assert vals[1] == 0.0
    assert vals[2] == pytest.approx(0.707107)


def test_exact_topk_is_sorted_and_excludes_none(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qvec")
    )
    top = cosine_topk(e, q, "vec_id", "embedding", k=10).collect()
    assert len(top) == 10
    scores = [r.cosine for r in top]
    assert scores == sorted(scores, reverse=True)


def test_lsh_recall_against_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qvec")
    )
    exact = {r.vec_id for r in cosine_topk(e, q, "vec_id", "embedding", k=10).collect()}
    # 4 planes x 8 tables: per-neighbor survival 1-(1-p)^8 with p=(1-θ/π)^4
    approx = {r.vec_id for r in
              ann_topk_lsh(e, q, "vec_id", "embedding", k=10, n_planes=4, n_tables=8).collect()}
    assert len(approx) > 0
    assert len(exact & approx) >= 5
