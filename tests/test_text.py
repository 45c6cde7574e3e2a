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


def test_s_stemmer_three_way_twin_parity(spark):
    # the same token list through the Spark CASE, the Python twin, and the
    # DuckDB SQL twin must agree exactly (the oracle gate depends on it)
    import duckdb

    from code_challenge___data_engineer___machinemax_spark.functions.text import (
        s_stem,
        s_stem_py,
        s_stem_sql,
    )

    words = [
        "queries", "flies", "ties", "engines", "tables", "goes", "sees",
        "toes", "shoes", "bus", "less", "class", "is", "as", "its", "this",
        "windows", "joins", "partitions", "express", "酒", "mas", "aies",
    ]
    want = {
        "queries": "query", "flies": "fly", "ties": "ty", "engines": "engine",
        "tables": "table", "goes": "goes", "sees": "sees", "toes": "toes",
        "shoes": "shoes", "bus": "bus", "less": "less", "class": "class",
        "is": "is", "as": "as", "its": "its", "this": "thi",
        "windows": "window", "joins": "join", "partitions": "partition",
        "express": "express", "酒": "酒", "mas": "mas", "aies": "aies",
    }
    py = {w: s_stem_py(w) for w in words}
    assert py == want

    df = spark.createDataFrame([(w,) for w in words], "t string")
    sp = {r.t: r.s for r in df.select("t", s_stem(F.col("t")).alias("s")).collect()}
    assert sp == want

    con = duckdb.connect()
    duck = dict(
        con.sql(
            "SELECT t, " + s_stem_sql("t") + " FROM (SELECT unnest(?) AS t)",
            params=[words],
        ).fetchall()
    )
    assert duck == want


def test_stemmed_search_matches_inflected_query(spark):
    from code_challenge___data_engineer___machinemax_spark.operators.search import (
        keyword_search,
        keyword_search_stemmed,
    )

    df = spark.createDataFrame(
        [(1, "the query planner"), (2, "a join strategy"), (3, "nothing here")],
        "doc_id long, text string",
    )
    # unstemmed: plural query tokens match nothing
    assert keyword_search(df, "queries joins").count() == 0
    hits = {r.doc_id for r in keyword_search_stemmed(df, "queries joins").collect()}
    assert hits == {1, 2}
    # and data-side plurals match a singular query
    df2 = spark.createDataFrame([(1, "many queries arrive")], "doc_id long, text string")
    assert {r.doc_id for r in keyword_search_stemmed(df2, "query").collect()} == {1}


def test_unigram_logprob_flags_garbled_text(spark):
    # rare-token documents must score lower (more negative per token) than
    # documents made of common tokens — the corpus-quality signal itself
    from code_challenge___data_engineer___machinemax_spark import plans

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((100, "zxqv jkwpf mmtr qqzi xbnv wplo zzrt aaqk dfgh jjwz"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    view = df  # reuse the query's internals via the operator path
    from pyspark.sql import functions as F
    from code_challenge___data_engineer___machinemax_spark.functions.text import tokenize

    occ = view.select("doc_id", F.explode(tokenize("text")).alias("token"))
    freq = occ.groupBy("token").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("bigint").alias("total"))
    li = (F.log(F.col("cnt").cast("double") / F.col("total")) * 1e6).cast("bigint")
    scored = (
        occ.join(freq, "token").crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sum(li).alias("lp"))
        .withColumn("per_token", F.col("lp") / F.col("n"))
    )
    got = {r.doc_id: r.per_token for r in scored.collect()}
    fluent_mean = sum(v for k, v in got.items() if k < 100) / 20
    assert got[100] < fluent_mean  # garbled doc is less probable per token


def test_winnowing_fingerprint_guarantees(spark):
    from code_challenge___data_engineer___machinemax_spark.functions.text import (
        winnowing_fingerprints,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        # same text with a word inserted up front: position shift must NOT
        # rewrite the whole fingerprint set (unlike a whole-doc digest)
        (2, "prefix " + base),
        # shares a >= w+k-1 = 8-token run with doc 1 -> guaranteed overlap
        (3, "unrelated start beta gamma delta epsilon zeta eta theta iota different end"),
        (4, "completely different words entirely here nothing shared at all today"),
        (5, "tiny doc"),  # < k tokens -> empty fingerprint set
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: set(r.fps) for r in df.select(
        "doc_id", winnowing_fingerprints("text").alias("fps")).collect()}

    assert fps[5] == set()
    assert fps[1] & fps[2], "insertion must preserve most fingerprints"
    assert len(fps[1] & fps[2]) / len(fps[1]) >= 0.5
    assert fps[1] & fps[3], "8-token shared run guarantees a shared fp"
    assert not (fps[1] & fps[4]), "no shared content, no shared fp"
    # compression: fingerprints are a strict subset of the gram count
    n_grams = len(base.split()) - 4 + 1
    assert 0 < len(fps[1]) < n_grams


def test_winnowing_rows_form_matches_array_form(spark):
    # the corpus-scale rows form (explode + lead + frame-min) must produce
    # exactly the array form's fingerprint set — including the edge docs:
    # fewer grams than w (single window), exactly w grams, < k tokens
    # (empty), repeated tokens (duplicate minima collapse via distinct)
    from code_challenge___data_engineer___machinemax_spark.functions.text import (
        winnowing_fingerprint_rows,
        winnowing_fingerprints,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four"),          # exactly k tokens -> 1 gram
        (3, "one two three four five six"), # 3 grams < w
        (4, "a b c d e f g h"),             # 5 grams == w -> 1 window
        (5, "tiny doc"),                    # < k tokens -> empty
        (6, "x y x y x y x y x y x y"),     # heavy repetition
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = {
        (r.doc_id, r.fp)
        for r in df.select(
            "doc_id", F.explode(winnowing_fingerprints("text")).alias("fp")
        ).collect()
    }
    new = {
        (r.doc_id, r.fp)
        for r in winnowing_fingerprint_rows(df, "doc_id", "text").collect()
    }
    assert old == new


def test_fold_accents_three_twins_and_folded_search(spark):
    from code_challenge___data_engineer___machinemax_spark.functions.text import (
        _ACCENTED,
        _FOLDED,
        fold_accents,
        fold_accents_py,
        tokenize_folded,
    )
    from code_challenge___data_engineer___machinemax_spark.operators.search import (
        keyword_search_folded,
    )

    assert len(_ACCENTED) == len(_FOLDED)
    sample = "café naïve françois übermaß łódź señor æther œuvre þorn"
    df = spark.createDataFrame([(1, sample)], "doc_id long, text string")
    spark_folded = df.select(fold_accents(F.lower(F.col("text"))).alias("f")).collect()[0].f
    assert spark_folded == fold_accents_py(sample)
    # multi-char folds expand (ß→ss, æ→ae, œ→oe, þ→th), not truncate
    assert spark_folded == "cafe naive francois ubermass lodz senor aether oeuvre thorn"

    corpus = spark.createDataFrame(
        [(1, "Le café est ouvert"), (2, "the cafe is open"), (3, "nothing here")],
        "doc_id long, text string",
    )
    # unaccented query finds the accented doc and vice versa; plain search
    # would miss doc 1 for 'cafe'
    assert {r.doc_id for r in keyword_search_folded(corpus, "cafe").collect()} == {1, 2}
    assert {r.doc_id for r in keyword_search_folded(corpus, "café").collect()} == {1, 2}
    toks = corpus.filter(F.col("doc_id") == 1).select(
        tokenize_folded("text").alias("t")
    ).collect()[0].t
    assert "cafe" in toks

    # the round-3 advice case: 'straße' must be reachable from 'strasse'
    de = spark.createDataFrame(
        [(1, "die straße ist lang"), (2, "the strasse is long")],
        "doc_id long, text string",
    )
    assert {r.doc_id for r in keyword_search_folded(de, "strasse").collect()} == {1, 2}
    assert {r.doc_id for r in keyword_search_folded(de, "straße").collect()} == {1, 2}


def test_analyzed_search_folds_and_stems_together(spark):
    from code_challenge___data_engineer___machinemax_spark.operators.search import (
        keyword_search_analyzed,
    )

    corpus = spark.createDataFrame(
        [(1, "les cafés sont ouverts"), (2, "the cafe is open"),
         (3, "many queries arrive"), (4, "nothing relevant")],
        "doc_id long, text string",
    )
    # 'cafes' (no accent, plural) must hit both the accented plural and the
    # plain singular; 'query' must hit the plural via stemming
    assert {r.doc_id for r in keyword_search_analyzed(corpus, "cafes").collect()} == {1, 2}
    assert {r.doc_id for r in keyword_search_analyzed(corpus, "café query").collect()} == {1, 2, 3}


def test_dsir_importance_weights_ranks_target_like_docs(spark, tmp_path):
    """DSIR semantics pinned on a crafted pool: the raw doc written in the
    target domain's vocabulary must out-score the off-domain raw doc
    (higher ln p_target - ln p_raw per token)."""
    import __spark_entry__ as mod

    target_text = "alpha beta gamma delta alpha beta gamma delta"
    docs = [
        (1, "src0", target_text),
        (2, "src1", "alpha beta gamma delta epsilon alpha beta"),
        (10, "src5", "alpha beta gamma delta alpha beta gamma"),  # target-like
        (11, "src6", "zork quux blarg wibble zork quux blarg wibble"),
        (12, "src7", None),  # null text never scores
    ]
    spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r
        for r in mod.queries()["dsir_importance_weights"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {10, 11}  # raw pool only, nulls dropped
    per_tok_10 = rows[10].logratio_e6 / rows[10].n_tokens
    per_tok_11 = rows[11].logratio_e6 / rows[11].n_tokens
    assert per_tok_10 > per_tok_11


def test_perplexity_terciles_head_is_fluent(spark, tmp_path):
    """Tercile semantics pinned: docs made of corpus-frequent tokens land
    in the head (tercile 1), rare-token gibberish in the tail (3)."""
    import __spark_entry__ as mod

    common = "the cat sat on the mat and the dog sat too"
    docs = (
        [(i, "srcA", common) for i in range(6)]
        + [(10 + i, "srcB", f"xq{i}z wubble{i} frobnitz{i} glark{i}") for i in range(3)]
    )
    spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = mod.queries()["perplexity_tercile_mix"](spark, str(tmp_path)).collect()
    by = {(r.source, r.tercile): r.n_docs for r in rows}
    assert by.get(("srcA", 1), 0) == 3  # 9 docs -> terciles of 3; head all srcA
    assert by.get(("srcB", 3), 0) == 3  # gibberish fills the tail
    assert ("srcB", 1) not in by


def test_quantile_normalization_equalizes_sources(spark, tmp_path):
    """After normalization both sources carry the SAME value multiset —
    the defining property of quantile normalization — and the within-
    source order is preserved."""
    import __spark_entry__ as mod

    docs = [
        (1, "A", "x", 10), (2, "A", "x", 20), (3, "A", "x", 30),
        (4, "B", "x", 100), (5, "B", "x", 200), (6, "B", "x", 300),
    ]
    spark.createDataFrame(
        docs, "doc_id long, source string, text string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = mod.queries()["quantile_normalized_scores"](spark, str(tmp_path)).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.n_chars, r.norm_chars))
    a = sorted(by_src["A"]); b = sorted(by_src["B"])
    assert [v for _, v in a] == [v for _, v in b] == [20, 100, 300]


def test_pmi_collocation_outranks_chance_pair(spark, tmp_path):
    """PMI semantics pinned: a token pair that ALWAYS co-occurs ('hong
    kong') scores higher than frequent-but-independent pairs."""
    import __spark_entry__ as mod

    filler = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    docs = []
    for i in range(10):
        # 'hong kong' always adjacent; filler tokens shuffle deterministically
        pad = " ".join(filler[i % 8:] + filler[: i % 8])
        docs.append((i, f"hong kong {pad} hong kong {pad}"))
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = mod.queries()["pmi_cooccurrence"](spark, str(tmp_path)).collect()
    assert rows, "no pairs cleared the min-count gate"
    top = rows[0]
    assert (top.w1, top.w2) == ("hong", "kong")


def test_entropy_uniform_vs_skewed(spark, tmp_path):
    """Entropy semantics pinned: a uniform 4-source mix hits ln(4) (within
    the e6 truncation), a fully-skewed mix scores 0."""
    import math

    import __spark_entry__ as mod

    docs = [(i, f"s{i % 4}", "one two") for i in range(40)]  # uniform sources
    spark.createDataFrame(docs, "doc_id long, source string, text string") \
        .withColumn("lang", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("en")) \
        .write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.dist: r for r in
            mod.queries()["corpus_entropy_report"](spark, str(tmp_path)).collect()}
    assert abs(rows["source"].entropy_nats_e6 - int(math.log(4) * 1e6)) <= 4
    assert rows["lang"].entropy_nats_e6 == 0          # single language
    assert rows["vocabulary"].entropy_nats_e6 == int(math.log(2) * 1e6)  # two equal tokens


def test_readability_hand_computed(spark, tmp_path):
    """Flesch arithmetic pinned on a hand-countable sentence: 'the cat sat
    on the mat.' = 6 words, 1 sentence, 6 single-vowel-group syllables."""
    import __spark_entry__ as mod

    docs = [(1, "the cat sat on the mat.")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    r = mod.queries()["readability_scores"](spark, str(tmp_path)).collect()[0]
    assert (r.words, r.sentences, r.syllables) == (6, 1, 6)
    # 206.835 - 1.015*6 - 84.6*1 = 116.145 -> 116145 scaled e3
    assert r.flesch_e3 == 116145


def test_zipf_fit_flags_template_corpus(spark, sf_dir):
    """The synthetic corpus is TEMPLATE-generated from a ~31-word pool
    with near-uniform draws — exactly the boilerplate-flooding failure
    mode the Zipf diagnostic exists to alarm on. The fit must therefore
    come out negative but FAR flatter than natural text's -1 (measured
    ~-0.18), over the full (small) vocabulary."""
    import __spark_entry__ as mod

    row = mod.queries()["zipf_rank_frequency"](spark, sf_dir).collect()[0]
    assert 10 < row.n_ranks <= 512
    assert row.top_tf > 0
    assert -600_000 < row.slope_e6 < -50_000  # flat: template alarm fires


def test_unigram_viterbi_hand_computed(spark):
    """Viterbi on a toy vocabulary: 'abab' must segment as ab+ab (2
    pieces, score 2*s(ab)) — strictly better than four singles — and a
    word with no multi-char cover falls back to singles."""
    from pyspark.sql import functions as F

    from code_challenge___data_engineer___machinemax_spark.operators.bpe import (
        unigram_viterbi,
    )

    words = spark.createDataFrame([("abab", 10), ("cd", 3)], "w: string, n: long")
    vocab = spark.createDataFrame(
        [("a", -2_000_000), ("b", -2_000_000), ("c", -3_000_000),
         ("d", -3_000_000), ("ab", -1_500_000)],
        "piece: string, s_e6: long",
    )
    got = {r.word: r for r in unigram_viterbi(words, vocab).collect()}
    assert got["abab"].n_pieces == 2
    assert got["abab"].score_e6 == -3_000_000  # 2 * s(ab)
    assert got["cd"].n_pieces == 2
    assert got["cd"].score_e6 == -6_000_000


def test_unigram_tokenizer_corpus_invariants(spark, sf_dir):
    """Every distinct word (all <= 12 chars on this corpus) gets a
    Viterbi row; piece counts respect the length-4 piece cap; scores are
    negative log-prob sums so strictly below zero."""
    import math

    import __spark_entry__ as mod
    from pyspark.sql import functions as F

    from code_challenge___data_engineer___machinemax_spark.operators.bpe import (
        word_frequencies,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_words = word_frequencies(d).count()
    rows = mod.queries()["unigram_tokenizer_scores"](spark, sf_dir).collect()
    assert len(rows) == n_words
    for r in rows:
        assert r.n_pieces >= math.ceil(len(r.word) / 4)
        assert r.n_pieces <= len(r.word)
        assert r.score_e6 < 0


def test_unigram_em_paths_toy_and_conservation(spark, sf_dir):
    """Toy: 'abab' path = [ab, ab], 'cd' = [c, d]. Corpus: total
    freq-weighted path length must equal sum over words of
    freq x n_pieces from the Viterbi score table — the path extraction
    and the forward DP agree on every word (conservation, not sampling)."""
    import __spark_entry__ as mod
    from code_challenge___data_engineer___machinemax_spark.operators.bpe import (
        unigram_viterbi_paths,
    )

    words = spark.createDataFrame([("abab", 10), ("cd", 3)], "w: string, n: long")
    vocab = spark.createDataFrame(
        [("a", -2_000_000), ("b", -2_000_000), ("c", -3_000_000),
         ("d", -3_000_000), ("ab", -1_500_000)],
        "piece: string, s_e6: long",
    )
    toy = sorted((r.word, r.piece) for r in unigram_viterbi_paths(words, vocab).collect())
    assert toy == [("abab", "ab"), ("abab", "ab"), ("cd", "c"), ("cd", "d")]

    refit = mod.queries()["unigram_em_refit"](spark, sf_dir).collect()
    scores = mod.queries()["unigram_tokenizer_scores"](spark, sf_dir).collect()
    assert sum(r.path_cnt for r in refit) == sum(r.n * r.n_pieces for r in scores)
    # unused pieces keep NULL refit scores; used ones move
    assert any(r.path_cnt == 0 and r.new_s_e6 is None for r in refit)
    assert all(r.new_s_e6 is not None for r in refit if r.path_cnt > 0)


def test_wordpiece_greedy_hand_computed(spark):
    # corpus: 'abcd' x3 + 'ab' x2 + 'cd' x1. Weighted multi-char forms:
    # 'ab' 5 (initial in abcd + ab), then a 3-tie broken by form string:
    # '##bc' < '##bcd' < '##cd' < 'abc' < 'abcd' — so n_multi=4 selects
    # {'ab', '##bc', '##bcd', '##cd'}. Greedy on 'abcd' must take the
    # LONGEST match at each cursor: 'ab' (4- and 3-char pieces absent),
    # then '##cd' — never 'a'+'##b', and '##bcd' stays unused because the
    # cursor is already past 'b'. 'cd' falls back to singles ('cd' bare
    # weighs only 1 and is not selected).
    from code_challenge___data_engineer___machinemax_spark.operators.bpe import (
        wordpiece_encode,
        wordpiece_vocab,
    )

    words = spark.createDataFrame(
        [("abcd", 3), ("ab", 2), ("cd", 1)], "w string, n long"
    )
    vocab = wordpiece_vocab(words, n_multi=4)
    vset = {r.piece for r in vocab.collect()}
    assert {"ab", "##bc", "##bcd", "##cd"} <= vset
    assert "cd" not in vset  # the bare form did not make the cut
    enc = wordpiece_encode(words, vocab).collect()
    by_word = {}
    for r in enc:
        by_word.setdefault(r.word, []).append(r.piece)
    assert sorted(by_word["abcd"]) == ["##cd", "ab"]
    assert by_word["ab"] == ["ab"]
    assert sorted(by_word["cd"]) == ["##d", "c"]
    # every word's pieces account for every character exactly once
    for w, pieces in by_word.items():
        assert sum(len(p.removeprefix("##")) for p in pieces) == len(w)
