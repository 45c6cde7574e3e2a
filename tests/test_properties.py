"""Property-based tests (hypothesis) for the pure expression semantics the
oracle gate leans on: tokenizer, jaccard, simhash stability, as-of ordering.
One Spark job per property batch (hypothesis drives data, Spark evaluates
the whole batch at once) to keep runtime sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.functions.text import tokenize
from code_challenge___data_engineer___machinemax_spark.operators.dedup import jaccard_tokens

# BMP only: supplementary-plane classification differs across Unicode table
# versions (Java 17 ships Unicode 13, CPython 3.11 ships 14) — an engine-
# version skew, not an engine bug; testdata is ASCII.
TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs"), max_codepoint=0xFFFF
    ),
    max_size=80,
)


def py_tokenize(s: str) -> list[str]:
    import unicodedata

    def is_alnum(c: str) -> bool:
        return unicodedata.category(c)[0] in ("L", "N")

    out, cur = [], []
    for c in s.lower():
        if is_alnum(c):
            cur.append(c)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_tokenize_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.toks for r in df.select(tokenize("t").alias("toks")).collect()]
    want = [py_tokenize(t) for t in texts]
    assert got == want


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.lists(TEXT, min_size=2, max_size=6))
def test_jaccard_symmetric_and_bounded(spark, texts):
    pairs = [(a, b) for a in texts for b in texts]
    df = spark.createDataFrame(pairs, "x string, y string")
    rows = df.select(
        "x", "y", F.round(jaccard_tokens(F.col("x"), F.col("y")), 9).alias("j")
    ).collect()
    vals = {(r.x, r.y): r.j for r in rows}
    for (a, b), j in vals.items():
        assert 0.0 <= j <= 1.0
        assert j == vals[(b, a)]  # symmetry
        if py_tokenize(a) and set(py_tokenize(a)) == set(py_tokenize(b)):
            assert j == 1.0


def py_greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping pair fusion."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = out[-1] + x
        else:
            out.append(x)
    return out


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    st.lists(st.text(alphabet="ab", min_size=1, max_size=2), min_size=1, max_size=10),
    st.sampled_from(["a", "b", "ab", "ba", "aa"]),
    st.sampled_from(["a", "b", "ab", "ba", "bb"]),
)
def test_bpe_merge_fold_matches_python_reference(spark, syms, a, b):
    """The codegen'd BPE merge fold (operators/bpe.py::_apply_merge) equals
    the sequential Python reference on adversarial symbol streams — chained
    merges ('aaa' with rule (a,a)), merged-symbol re-participation, and
    rule symbols that are themselves merge outputs."""
    from code_challenge___data_engineer___machinemax_spark.operators.bpe import _apply_merge

    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(_apply_merge(F.col("syms"), a, b).alias("m")).collect()[0].m
    assert got == py_greedy_merge(syms, a, b)
