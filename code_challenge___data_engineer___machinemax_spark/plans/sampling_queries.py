"""Reproducible sampling / corpus-mixing queries.

Training-data pipelines need samples that are (a) reproducible across runs
and engines, (b) stratified per source, (c) weight-mixable. RNG-based
``df.sample`` is engine-specific; the engine's canonical sampling primitive
is hash-ordering: rank rows by md5(key) within a stratum and keep the top
n — a uniform pseudo-random but fully deterministic choice that any engine
reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query


@query(
    "stratified_sample_per_source",
    oracle="""
    SELECT source, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
)
def stratified_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 docs per source, chosen by hash order — reproducible
    stratified sampling (the rank shuffles only (source, hash))."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars")
    )


@query(
    "weighted_corpus_mix",
    oracle="""
    WITH ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT lang, doc_id FROM ranked
    WHERE rn <= CAST(ceil(n_lang * CASE lang WHEN 'en' THEN 0.8
                                             WHEN 'de' THEN 0.5
                                             ELSE 0.2 END) AS BIGINT)
    """,
)
def weighted_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling: keep 80% of English, 50% of German, 20% of the
    rest — per-language quotas filled in hash order (deterministic data
    mixing for training-corpus composition)."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    wl = W.partitionBy("lang")
    quota = F.ceil(
        F.count(F.lit(1)).over(wl)
        * F.when(F.col("lang") == "en", 0.8).when(F.col("lang") == "de", 0.5).otherwise(0.2)
    ).cast("bigint")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("quota", quota)
        .filter(F.col("rn") <= F.col("quota"))
        .select("lang", "doc_id")
    )


@query("bernoulli_sample_stats", oracle=None)
def bernoulli_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native seeded Bernoulli sample (df.sample) — rows-only (RNG
    streams are engine-specific); tests pin determinism-under-seed and the
    sampling fraction tolerance."""
    d = load_table(spark, sf_dir, "documents")
    s = d.sample(fraction=0.2, seed=42)
    return s.groupBy("lang").agg(F.count("*").alias("n_sampled"))
