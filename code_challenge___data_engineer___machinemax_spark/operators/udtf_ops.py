"""Python UDTF surface (table functions) — one row in, many typed rows out.

Used where an operator's natural shape is row->table and composition via
explode would obscure it. Kept OFF the hot path (UDTFs are Python-eval);
the engine's own explode-based operators cover the performant equivalents.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_id int, sentence string, n_tokens int")
class SplitSentences:
    """Sentence segmentation table function: yields one row per sentence
    with its index and token count. (Heuristic split on .!? — a real
    segmenter would plug in here.)"""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text) if p.strip()]
        for i, p in enumerate(parts):
            yield i, p, len(p.split())


@udtf(returnType="pos int, shingle string")
class CharShingles:
    """Character n-gram table function (fingerprinting building block)."""

    def __init__(self):
        self.k = 5

    def eval(self, text: str):  # noqa: D102
        if text is None or len(text) < self.k:
            return
        for i in range(len(text) - self.k + 1):
            yield i, text[i : i + self.k]
