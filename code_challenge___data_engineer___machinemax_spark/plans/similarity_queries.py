"""Similarity-search queries over `embeddings` (vec_id, embedding:
array<float>, label). Brute-force cosine top-k is oracle-checked value-
exactly (both engines accumulate doubles in list order). The LSH variant is
rows-only (recall is probabilistic by design); tests pin its recall against
the exact result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ann_topk_lsh, cosine_topk, l2_norm
from ..tables import load_table
from .registry import query

_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
)


def _query_df(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") == vec_id).select(F.col("embedding").alias("__qvec"))


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND({_DOT_SQL.format(a='embedding', b='qvec')}
                 / (sqrt({_DOT_SQL.format(a='embedding', b='embedding')})
                    * sqrt({_DOT_SQL.format(a='qvec', b='qvec')})), 6) AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id=0: broadcast the query row,
    score every vector JVM-side, TakeOrderedAndProject for top-k."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return cosine_topk(e, _query_df(spark, sf_dir), "vec_id", "embedding", k=10)


@query(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           ROUND(sqrt({_DOT_SQL.format(a='embedding', b='embedding')}), 6) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm — pins the vector arithmetic primitives."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.round(l2_norm(F.col("embedding")), 6).alias("l2_norm")
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label, dim - 1 AS dim,
           CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 10000000) AS BIGINT)) AS BIGINT) AS component_sum_e7,
           COUNT(*) AS n
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
    GROUP BY label, dim
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (posexplode + exact scaled-integer
    sums; float->decimal casts disagree across engines, int sums don't) —
    the building block for IVF coarse quantization."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.sum(F.round(F.col("v").cast("double") * 1e7).cast("bigint")).alias(
                "component_sum_e7"
            ),
            F.count("*").alias("n"),
        )
    )


@query("ann_topk_lsh", oracle=None)
def ann_topk_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via sign-random-projection LSH (8 hyperplanes,
    256 buckets). Rows-only check; tests/test_similarity.py pins recall
    against the exact top-k."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return ann_topk_lsh(e, _query_df(spark, sf_dir), "vec_id", "embedding", k=10)


@query("embedding_near_dup_pairs", oracle=None)
def embedding_near_dup_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding near-dup at cosine >= 0.9 via SRP-LSH bucketed
    self-join (the scale path; never O(n^2)). Rows-only check — the SRP
    candidate set is numpy-matmul-derived, not SQL-reproducible — but every
    OUTPUT pair is exact-cosine-verified, and tests/test_similarity.py
    measures recall against planted near-duplicate vectors."""
    from ..operators.similarity import srp_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return srp_near_dup_pairs(e, "vec_id", "embedding", threshold=0.9)


@query("ivf_topk", oracle=None)
def ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: label-centroid codebook, nprobe=3 coarse
    lists scored. Rows-only check; tests/test_search_index.py pins recall
    against the exact top-k."""
    from ..operators.similarity import ivf_topk, label_centroids_df

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != 0)
    centroids = label_centroids_df(e, "embedding", "label")
    return ivf_topk(corpus, _query_df(spark, sf_dir), centroids, "vec_id", "embedding", k=10, nprobe=3)
