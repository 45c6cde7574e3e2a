"""Text-function edge semantics: null/empty-string boundaries (SURVEY.md
§7.4 names these the likeliest oracle mismatches) and tokenizer behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.functions.text import (
    coalesce_nonblank,
    shingles,
    strip_html,
    token_count,
    tokenize,
)


def test_tokenize_unicode_case_punct(spark):
    df = spark.createDataFrame([("Héllo, Wörld-42 !!",), ("",), (None,)], "t string")
    rows = df.select(tokenize("t").alias("toks")).collect()
    assert rows[0].toks == ["héllo", "wörld", "42"]
    assert rows[1].toks == []
    assert rows[2].toks is None


def test_strip_html_null_vs_empty(spark):
    # reference newsspider.py:48-49: None iff no paragraphs; empty-after-
    # strip stays ''
    df = spark.createDataFrame(
        [(["<p>a</p>", "<p><b>b</b></p>"],), ([],), ((None,)), (["<i></i>"],)],
        "ps array<string>",
    )
    rows = df.select(strip_html(F.col("ps")).alias("t")).collect()
    assert rows[0].t == "a b"
    assert rows[1].t is None
    assert rows[2].t is None
    assert rows[3].t == ""


def test_coalesce_nonblank_python_or(spark):
    df = spark.createDataFrame(
        [("x", "y"), ("", "y"), (None, "y"), ("", None)], "a string, b string"
    )
    rows = df.select(coalesce_nonblank(F.col("a"), F.col("b")).alias("v")).collect()
    assert [r.v for r in rows] == ["x", "y", "y", None]


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    rows = df.select(
        token_count("t").alias("n"), shingles("t", 3).alias("sh")
    ).collect()
    assert rows[0].n == 4
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []  # fewer tokens than k -> empty, not partial
