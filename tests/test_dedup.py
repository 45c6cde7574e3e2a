"""Dedup operator semantics on crafted near-dup corpora (the real testdata
has no duplicates, so these pin behavior the oracle queries can't)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.dedup import (
    dedup_exact,
    hamming64,
    jaccard_tokens,
    near_dup_pairs,
    simhash,
)

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the tall fence and the birds sing in the morning light"
)
NEAR_DUP = BASE_TEXT.replace("morning", "evening")  # one token differs
UNRELATED = (
    "completely different content about database engines query optimizers "
    "and distributed shuffle partitioning strategies at massive scale"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE_TEXT),
        (2, NEAR_DUP),
        (3, UNRELATED),
        (4, "The QUICK   brown fox, jumps over the lazy dog while the cat watches from the tall fence and the birds sing in the morning light!"),
        (5, BASE_TEXT),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup_normalizes(corpus):
    groups = {r.doc_id: r.dup_count for r in dedup_exact(corpus, "text", "doc_id").collect()}
    # 1, 4 (case/punct/whitespace variant) and 5 collapse to one group keyed min id
    assert groups[1] == 3
    assert 4 not in groups and 5 not in groups
    assert groups[2] == 1 and groups[3] == 1


def test_near_dup_pairs_finds_minor_edit(corpus):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             near_dup_pairs(corpus, "doc_id", "text", threshold=0.5).collect()}
    assert (1, 2) in pairs  # one-word edit -> high jaccard candidate
    assert pairs[(1, 2)] > 0.7
    assert (1, 5) in pairs and pairs[(1, 5)] == 1.0  # exact dup
    assert not any(3 in p for p in pairs)  # unrelated never pairs


def test_jaccard_bounds(spark):
    df = spark.createDataFrame([("a b c", "a b c"), ("a b", "c d"), ("", "")], "x string, y string")
    vals = [r.j for r in df.select(jaccard_tokens(F.col("x"), F.col("y")).alias("j")).collect()]
    assert vals[0] == 1.0
    assert vals[1] == 0.0
    assert vals[2] == 0.0  # empty-vs-empty defined as 0, not NaN


def test_simhash_hamming_locality(spark, corpus):
    fps = {r.doc_id: r.simhash for r in simhash(corpus, "doc_id", "text").collect()}
    d_near = spark.createDataFrame(
        [(fps[1], fps[2]), (fps[1], fps[3]), (fps[1], fps[5])], "a long, b long"
    ).select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    near, far, same = d_near[0].h, d_near[1].h, d_near[2].h
    assert same == 0  # identical docs -> identical fingerprint
    assert near < far  # one-token edit closer than unrelated content
    assert near <= 10 and far > 10
