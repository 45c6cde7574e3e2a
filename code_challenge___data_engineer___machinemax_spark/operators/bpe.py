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


# --- unigram-LM (SentencePiece-style) tokenizer ----------------------------
# The OTHER major subword family next to BPE: pieces carry log-probability
# scores and a word's segmentation is the Viterbi-best path over its
# positions (Kudo 2018). Piece length caps at 4; words cap at _UNI_MAX_WORD
# chars (the DP unrolls one join per position — position count is part of
# the operator contract, like the BPE iteration count).
_UNI_MAX_PIECE = 4
_UNI_MAX_WORD = 12


def _substring_candidates(words: DataFrame) -> DataFrame:
    """(word, n, p_start, p_end, piece): every substring of length
    1.._UNI_MAX_PIECE of every word — the constant <= L x 4 fan-out the
    vocab builder and the Viterbi DP both consume. Empty words are
    filtered first: sequence(1, 0) DESCENDS to [1, 0] rather than
    returning empty (the same hazard _adjacent_pairs guards), which would
    emit phantom candidate rows no SQL generate_series twin produces."""
    return (
        words.filter(F.length("w") > 0)
        .select(
            "w",
            "n",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("p_end"),
        )
        .select(
            "w",
            "n",
            "p_end",
            F.explode(
                F.sequence(F.lit(1), F.least(F.lit(_UNI_MAX_PIECE), F.col("p_end")))
            ).alias("k"),
        )
        .select(
            F.col("w").alias("word"),
            "n",
            (F.col("p_end") - F.col("k")).alias("p_start"),
            "p_end",
            F.expr("substring(w, p_end - k + 1, k)").alias("piece"),
        )
    )


def unigram_vocab(words: DataFrame, n_multi: int = 44) -> DataFrame:
    """Select the piece vocabulary from a (w, n) word-frequency table:
    ALL single characters (the coverage guarantee — every word stays
    encodable) plus the ``n_multi`` most corpus-frequent multi-character
    substrings, each scored ln(piece_freq / vocab_total) as a trunc-1e6
    integer. Deterministic: ties break on the piece string.

    Scale: substring fan-out is a constant <= L x 4 per DISTINCT word (the
    BPE train-on-the-vocabulary trick), the frequency reduce is map-side
    combinable, and the selected vocabulary is a <= |chars| + n_multi row
    broadcast frame."""
    pf = (
        _substring_candidates(words)
        .groupBy("piece")
        .agg(F.sum("n").cast("bigint").alias("pfreq"))
    )
    chars = pf.filter(F.length("piece") == 1)
    multi = (
        pf.filter(F.length("piece") > 1)
        .orderBy(F.desc("pfreq"), F.asc("piece"))
        .limit(n_multi)
    )
    vocab = chars.unionByName(multi)
    tot = vocab.agg(F.sum("pfreq").alias("tot"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.expr(
            "CAST(ln(CAST(pfreq AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 AS BIGINT)"
        ).alias("s_e6"),
    )


def unigram_viterbi(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Viterbi-best segmentation of every word in a (w, n) table under a
    (piece, s_e6) unigram vocabulary: returns (word, n, n_pieces,
    score_e6) where score is the max sum of piece log-probs and ties
    prefer fewer pieces (then collapse — only the (score, count) pair is
    emitted, so co-optimal segmentations agree).

    The DP is the sequential recurrence best[p] = max over k of
    best[p-k] + s(piece(p-k, p)), unrolled as one equi-join + one
    max-of-struct combinable aggregation per position (no window) — the
    bellman_ford / label-propagation superstep discipline. All arithmetic
    is int64 on trunc-1e6 log-probs, so the DuckDB twin replays it
    bit-identically.

    Scale: every frame is keyed on the DISTINCT word (vocabulary-bounded,
    never corpus-bounded); the candidate table is built once and
    localCheckpoint'd; each of the <= _UNI_MAX_WORD supersteps joins
    (word, pos)-sized state against it. Corpus-level encoding is then a
    broadcast join of the result onto the token stream."""
    words, cand, state = _viterbi_tables(words, vocab)
    return (
        words.join(
            state, (words.w == state.word) & (state.pos == F.length(words.w))
        )
        .select(
            "word",
            "n",
            F.col("np").alias("n_pieces"),
            F.col("score").alias("score_e6"),
        )
    )


def _viterbi_tables(
    words: DataFrame, vocab: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared forward pass: capped words, the vocab-joined candidate
    table (piece string retained for path extraction), and the full DP
    state (word, pos, score, np) — consumed by unigram_viterbi (final
    scores) and unigram_viterbi_paths (backward path walk)."""
    words = words.filter(F.length("w") <= _UNI_MAX_WORD)
    cand = (
        _substring_candidates(words)
        .join(F.broadcast(vocab), "piece")
        .select("word", "p_start", "p_end", "piece", "s_e6")
        .localCheckpoint()
    )
    state = words.select(
        F.col("w").alias("word"),
        F.lit(0).alias("pos"),
        F.lit(0).cast("bigint").alias("score"),
        F.lit(0).alias("np"),
    )
    for p in range(1, _UNI_MAX_WORD + 1):
        step = (
            cand.filter(F.col("p_end") == p)
            .join(
                state.select(
                    "word", F.col("pos").alias("p_start"), "score", "np"
                ),
                ["word", "p_start"],
            )
            .select(
                "word",
                (F.col("score") + F.col("s_e6")).alias("score"),
                (F.col("np") + 1).alias("np"),
            )
        )
        best = (
            step.groupBy("word")
            .agg(F.max(F.struct("score", (-F.col("np")).alias("negnp"))).alias("m"))
            .select(
                "word",
                F.lit(p).alias("pos"),
                F.col("m.score").alias("score"),
                (-F.col("m.negnp")).alias("np"),
            )
        )
        state = state.unionByName(best)
        # checkpoint every 4th superstep only: the state frames are
        # vocabulary-bounded, so the cost driver is the PER-STEP job
        # barrier a checkpoint forces (12 sequential tiny jobs), not
        # lineage recompute — measured 10.9 s -> (see SCALE.md) at sf0.1
        if p % 4 == 0:
            state = state.localCheckpoint()
    return words, cand, state.localCheckpoint()


def unigram_viterbi_paths(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """The pieces along each word's Viterbi-best path — the E-step
    evidence the unigram EM trainer's M-step counts. Returns one row per
    (word, n, piece) path element.

    Optimal substructure makes backward extraction a walk over the
    RECORDED best states only: from (word, L) choose the predecessor
    p_start whose best state satisfies score[p_start] + s(piece) ==
    score[pos] and np[p_start] + 1 == np[pos]; among co-optimal
    predecessors the walk canonically takes MAX p_start (shortest final
    piece) — any fixed rule works, this one is replayed verbatim by the
    DuckDB twin. <= _UNI_MAX_WORD backward supersteps, each an equi-join
    on (word, position) plus a max-of-struct combinable argmax — the
    same cost envelope as the forward pass, DISTINCT-word-keyed."""
    words, cand, state = _viterbi_tables(words, vocab)
    walk = words.join(
        state, (words.w == state.word) & (state.pos == F.length(words.w))
    ).select("word", "pos", "score", "np")
    emitted: list[DataFrame] = []
    prev = state.select(
        F.col("word").alias("pword"),
        F.col("pos").alias("p_start"),
        F.col("score").alias("pscore"),
        F.col("np").alias("pnp"),
    )
    for t in range(1, _UNI_MAX_WORD + 1):
        a = walk.filter(F.col("pos") > 0).alias("a")
        c = cand.alias("c")
        pv = prev.alias("pv")
        matches = a.join(
            c,
            (F.col("c.word") == F.col("a.word"))
            & (F.col("c.p_end") == F.col("a.pos")),
        ).join(
            pv,
            (F.col("pv.pword") == F.col("a.word"))
            & (F.col("pv.p_start") == F.col("c.p_start"))
            & (F.col("pv.pscore") == F.col("a.score") - F.col("c.s_e6"))
            & (F.col("pv.pnp") == F.col("a.np") - 1),
        )
        pick = (
            matches.groupBy(F.col("a.word").alias("word"))
            .agg(
                F.max(
                    F.struct(
                        F.col("c.p_start").alias("p_start"),
                        F.col("c.piece").alias("piece"),
                        F.col("pv.pscore").alias("pscore"),
                        F.col("pv.pnp").alias("pnp"),
                    )
                ).alias("m")
            )
            .select(
                "word",
                F.col("m.p_start").alias("pos"),
                F.col("m.piece").alias("piece"),
                F.col("m.pscore").alias("score"),
                F.col("m.pnp").alias("np"),
            )
        )
        emitted.append(pick.select("word", "piece"))
        walk = (
            pick.select("word", "pos", "score", "np")
            .unionByName(walk.filter(F.col("pos") == 0))
        )
        if t % 4 == 0:
            walk = walk.localCheckpoint()
    pieces = emitted[0]
    for frame in emitted[1:]:
        pieces = pieces.unionByName(frame)
    return pieces.join(
        words.select(F.col("w").alias("word"), "n"), "word"
    ).select("word", "n", "piece")


# --- WordPiece (greedy longest-match-first) ---------------------------------
# The third major subword family next to BPE and the unigram LM: pieces are
# position-marked ('##' continuation prefix, BERT convention) and a word's
# segmentation is the GREEDY walk — at each position take the longest vocab
# piece (<= _UNI_MAX_PIECE chars), advance, repeat. Unlike Viterbi there is
# no scoring: determinism comes from the walk itself.


def wordpiece_vocab(words: DataFrame, n_multi: int = 50) -> DataFrame:
    """Select the WordPiece vocabulary from a (w, n) word-frequency table:
    ALL position-marked single characters (the coverage guarantee — the
    greedy walk can always take the 1-char piece of the very word being
    encoded) plus the ``n_multi`` most corpus-frequent multi-character
    forms. Forms are position-marked BEFORE counting: an initial substring
    counts as the bare piece, a non-initial one as '##'+piece, so 'ing'
    the suffix and 'ing' the prefix are different vocabulary entries —
    the property that makes '##' segmentations round-trippable.
    Deterministic: ties break on the form string."""
    words = words.filter(F.length("w") <= _UNI_MAX_WORD)
    forms = (
        _substring_candidates(words)
        .select(
            F.when(F.col("p_start") == 0, F.col("piece"))
            .otherwise(F.concat(F.lit("##"), F.col("piece")))
            .alias("form"),
            F.length("piece").alias("plen"),
            "n",
        )
        .groupBy("form", "plen")
        .agg(F.sum("n").cast("bigint").alias("wgt"))
    )
    singles = forms.filter(F.col("plen") == 1).select(
        F.col("form").alias("piece")
    )
    multi = (
        forms.filter(F.col("plen") > 1)
        .orderBy(F.desc("wgt"), F.asc("form"))
        .limit(n_multi)
        .select(F.col("form").alias("piece"))
    )
    return singles.unionByName(multi)


_WP_PIECE = (
    "CASE WHEN pos = 0 THEN substring(word, pos + 1, L)"
    " ELSE concat('##', substring(word, pos + 1, L)) END"
)


def wordpiece_encode(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Greedy longest-match-first segmentation of every word in a (w, n)
    table under a position-marked (piece) vocabulary: one output row per
    (word, n, piece) emission, in walk order across the unrolled steps.

    The walk is sequential per word, unrolled as <= _UNI_MAX_WORD
    supersteps (each advances >= 1 char): per step, the <= 4 candidate
    pieces at the cursor explode map-side, one broadcast join against the
    vocabulary keeps the matches, and a combinable MAX picks the longest
    — the same superstep discipline as unigram_viterbi, minus the DP
    state (greedy keeps only the cursor). Every frame is keyed on the
    DISTINCT word (vocabulary-bounded, never corpus-bounded); corpus
    encoding is a broadcast join of the result onto the token stream.
    Coverage: the single-char form at any cursor of any input word is in
    a vocabulary built from the same word table, so the walk always
    advances (the inner join never strands a word mid-walk)."""
    words = words.filter(F.length("w") <= _UNI_MAX_WORD)
    state = words.select(F.col("w").alias("word"), "n", F.lit(0).alias("pos"))
    outs: list[DataFrame] = []
    cand_expr = (
        "filter(transform(array(4, 3, 2, 1), L -> struct(L AS L,"
        " CASE WHEN pos + L <= length(word) THEN " + _WP_PIECE + " END AS piece)),"
        " c -> c.piece IS NOT NULL)"
    )
    for step in range(1, _UNI_MAX_WORD + 1):
        cand = state.select(
            "word", "n", "pos", F.explode(F.expr(cand_expr)).alias("c")
        ).select(
            "word",
            "n",
            "pos",
            F.col("c.L").alias("L"),
            F.col("c.piece").alias("piece"),
        )
        hit = (
            cand.join(F.broadcast(vocab), "piece")
            .groupBy("word", "n", "pos")
            .agg(F.max("L").alias("L"))
        )
        outs.append(hit.select("word", "n", F.expr(_WP_PIECE).alias("piece")))
        state = hit.select(
            "word", "n", (F.col("pos") + F.col("L")).alias("pos")
        ).filter(F.col("pos") < F.length("word"))
        # same cadence note as _viterbi_tables: frames are tiny, the cost
        # is the per-step job barrier, so checkpoint every 4th step only
        if step % 4 == 0:
            state = state.localCheckpoint()
    enc = outs[0]
    for o in outs[1:]:
        enc = enc.unionByName(o)
    return enc
