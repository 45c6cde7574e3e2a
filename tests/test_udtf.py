"""Python UDTF surface: registration, lateral join usage, null handling."""

from __future__ import annotations

from code_challenge___data_engineer___machinemax_spark.operators.udtf_ops import (
    CharShingles,
    SplitSentences,
)


def test_split_sentences_udtf(spark):
    spark.udtf.register("split_sentences", SplitSentences)
    spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, None), (3, "One.")],
        "doc_id int, text string",
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        """SELECT doc_id, s.sentence_id, s.sentence, s.n_tokens
           FROM docs_udtf, LATERAL split_sentences(text) s"""
    ).collect()
    got = {(r.doc_id, r.sentence_id): (r.sentence, r.n_tokens) for r in rows}
    assert got[(1, 0)] == ("Hello world", 2)
    assert got[(1, 1)] == ("How are you", 3)
    assert got[(1, 2)] == ("Fine", 1)
    assert got[(3, 0)] == ("One", 1)
    assert not any(k[0] == 2 for k in got)  # NULL text -> no rows


def test_char_shingles_udtf(spark):
    spark.udtf.register("char_shingles", CharShingles)
    rows = spark.sql(
        "SELECT * FROM char_shingles('abcdefg')"
    ).collect()
    assert [r.shingle for r in rows] == ["abcde", "bcdef", "cdefg"]
    assert [r.pos for r in rows] == [0, 1, 2]
