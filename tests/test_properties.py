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


# -- round-5 primitives -----------------------------------------------------


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # width
            st.integers(min_value=1, max_value=5),  # height
            st.integers(min_value=0, max_value=255),  # fill value
        ),
        min_size=0,
        max_size=8,
    )
)
def test_png_sequence_roundtrip_property(frames_spec):
    """Any sequence of encoded frames walks back to the exact same bytes
    and decodes to the exact pixels — and every strict prefix of the
    container is rejected (no silent truncation)."""
    import numpy as np

    from code_challenge___data_engineer___machinemax_spark.functions.png_codec import (
        decode_png,
        encode_png,
        encode_png_sequence,
        png_frame_offsets,
    )

    arrays = [np.full((h, w), v, dtype=np.uint8) for (w, h, v) in frames_spec]
    frames = [encode_png(a) for a in arrays]
    seq = encode_png_sequence(frames)
    offs = png_frame_offsets(seq)
    assert len(offs) == len(frames)
    for (off, ln), a in zip(offs, arrays):
        px = decode_png(seq[off : off + ln])  # contract: (h, w, channels)
        assert px.shape == (*a.shape, 1) and (px[:, :, 0] == a).all()
    if seq:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            png_frame_offsets(seq[:-1])


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # bucket to write
            st.integers(min_value=1, max_value=5),  # rows in that commit
        ),
        min_size=1,
        max_size=6,
    )
)
def test_manifest_store_commit_sequence_property(spark, tmp_path_factory, seq):
    """After ANY sequence of single-bucket commits, the store reads as the
    last-write-wins union per bucket; compact() then preserves exactly that
    content. (Each commit replaces its bucket — the store's contract.)"""
    from code_challenge___data_engineer___machinemax_spark.txn import ManifestStore

    store = ManifestStore(str(tmp_path_factory.mktemp("ms") / "s"))
    expected: dict[int, list] = {}
    for n_commit, (b, n) in enumerate(seq):
        rows = [(f"c{n_commit}-{i}", i, b) for i in range(n)]
        store.commit(
            spark.createDataFrame(rows, "k string, n long, bucket int"), [b]
        )
        expected[b] = rows
    want = sorted((k, n, b) for rows in expected.values() for (k, n, b) in rows)
    got = sorted(tuple(r) for r in store.read(spark).collect())
    assert got == want
    store.compact(spark)
    assert sorted(tuple(r) for r in store.read(spark).collect()) == want


@given(
    pcm=st.binary(max_size=200),
    rate=st.integers(min_value=1, max_value=192000),
    channels=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(pcm, rate, channels):
    from code_challenge___data_engineer___machinemax_spark.functions.wav_codec import (
        decode_wav,
        encode_wav,
        wav_info,
    )

    wav = encode_wav(pcm, rate, channels)
    got_rate, got_channels, got_pcm = decode_wav(wav)
    even = pcm[: len(pcm) // 2 * 2]
    assert (got_rate, got_channels, got_pcm) == (rate, channels, even)
    # container is always word-aligned and self-describing
    assert len(wav) % 2 == 0
    assert wav_info(wav) == (rate, channels, len(even) // 2 // channels)
    # any single-byte corruption of the RIFF/WAVE signatures must raise
    # (the declared RIFF size at bytes 4-8 is deliberately unread — the
    # chunk walk is the source of truth, standard lenient parsing)
    for i in (*range(0, 4), *range(8, 12)):
        broken = bytearray(wav)
        broken[i] ^= 0xFF
        try:
            decode_wav(bytes(broken))
            corrupted_ok = True
        except ValueError:
            corrupted_ok = False
        assert not corrupted_ok


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0], min(t[1], t[0]))
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pav_minimax_identity(bins):
    """The minimax closed form used by isotonic_calibration_bins —
    calib(t) = max_{i<=t} min_{j>=i} rate(i..j) — equals the sequential
    pool-adjacent-violators algorithm on arbitrary (n, pos) bin sequences.
    This is the algebraic identity that lets the query fit isotonic
    regression without any sequential pooling loop."""
    n = [b[0] for b in bins]
    pos = [b[1] for b in bins]
    k = len(bins)

    # sequential PAV (the textbook algorithm): merge adjacent violators
    pools = [[n[i], pos[i]] for i in range(k)]
    out = []
    for p in pools:
        out.append(p)
        while len(out) >= 2 and out[-2][1] * out[-1][0] > out[-1][1] * out[-2][0]:
            b2 = out.pop()
            out[-1][0] += b2[0]
            out[-1][1] += b2[1]
    # expand pooled rates back to per-bin values
    pav = []
    idx = 0
    for pn, pp in out:
        consumed = 0
        while consumed < pn:
            consumed += n[idx]
            pav.append(pp / pn)
            idx += 1

    # minimax closed form
    import itertools

    cn = list(itertools.accumulate(n))
    cp = list(itertools.accumulate(pos))
    def rate(i, j):  # inclusive bin range
        num = cp[j] - (cp[i] - pos[i])
        den = cn[j] - (cn[i] - n[i])
        return num / den
    for t in range(k):
        minimax = max(min(rate(i, j) for j in range(i, k)) for i in range(t + 1))
        assert abs(minimax - pav[t]) < 1e-12, (bins, t)
