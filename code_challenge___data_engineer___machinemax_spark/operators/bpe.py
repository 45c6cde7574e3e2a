"""Distributed BPE (byte-pair encoding) merge training.

The real subword-vocabulary trainer, not the regex approximation
(plans/advanced_queries.py::bpe_token_counts counts tokens with a fixed
BPE-ish regex; this module LEARNS the merge table): iteratively find the
most frequent adjacent symbol pair across the corpus and fuse it, the
classic Sennrich-style algorithm.

Scale design — the textbook BPE trick carries over to Spark directly:
train on the WORD-FREQUENCY table, not the corpus. One corpus pass builds
(word, count); every iteration then costs O(|vocab|), independent of
corpus size:

- pair counting: explode each word's adjacent symbol pairs weighted by the
  word count -> groupBy (a, b) with map-side partial sums (narrow string
  keys);
- best pair: orderBy (count desc, a, b) limit 1 — TakeOrderedAndProject,
  and the single-row collect is metadata-sized (the merge RULE is a
  scalar; this is not a driver-side data path);
- merge application: a codegen'd higher-order fold over each word's symbol
  array (greedy left-to-right non-overlapping, the standard semantics) —
  map-side only, no shuffle.

Every quantity is an integer count or a string, so the whole iteration is
value-reproducible against the DuckDB oracle (unrolled-CTE twin in
plans/text_pipeline.py::bpe_merge_training, same discipline as the
fixed-point k-means oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, n) word-frequency table — the BPE training input."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(a, b, cnt): corpus-weighted adjacent symbol pair counts."""
    # sequence(1, 0) DESCENDS in Spark, so single-symbol words must produce
    # an empty index list explicitly
    idx = F.explode(
        F.when(F.size("syms") > 1, F.sequence(F.lit(1), F.size("syms") - 1)).otherwise(
            F.expr("CAST(array() AS array<int>)")
        )
    ).alias("i")
    pairs = words.select("n", F.col("syms"), idx).select(
        F.element_at("syms", F.col("i")).alias("a"),
        F.element_at("syms", F.col("i") + 1).alias("b"),
        "n",
    )
    return pairs.groupBy("a", "b").agg(F.sum("n").cast("bigint").alias("cnt"))


def _apply_merge(syms_col, a: str, b: str):
    """Greedy left-to-right non-overlapping fusion of (a, b) in a symbol
    array, as one codegen'd fold (no Python in the loop)."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(words: DataFrame, iters: int = 4) -> tuple[list[tuple], DataFrame]:
    """Learn ``iters`` BPE merges from a (w, n) word-frequency table.

    Returns (merges, final_words) where merges is a list of
    (step, sym_a, sym_b, pair_count) and final_words carries the symbol
    arrays after all merges. Ties in pair counts break on (a, b) asc so the
    learned table is a deterministic function of the input.
    """
    syms = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    cur = words.withColumn("syms", syms).localCheckpoint()
    merges: list[tuple] = []
    for step in range(1, iters + 1):
        best = (
            _adjacent_pairs(cur)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, best[0].cnt
        merges.append((step, a, b, cnt))
        cur = cur.withColumn("syms", _apply_merge(F.col("syms"), a, b)).localCheckpoint()
    return merges, cur


def bpe_encode_words(words: DataFrame, merges: list[tuple]) -> DataFrame:
    """Apply a learned merge table to a (w, n) word table — the encode half
    of BPE. Merges apply in training order, each as the same greedy fold
    the trainer used; k rules = k chained map-side expressions, no shuffle,
    no Python. Returns (w, n, syms) with the final subword segmentation."""
    syms = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    cur = words.withColumn("syms", syms)
    for _, a, b, _cnt in merges:
        cur = cur.withColumn("syms", _apply_merge(F.col("syms"), a, b))
    return cur
