"""Semantic unit tests for the round-4 pipeline queries — properties the
oracle/golden comparison can't express (stability across layouts, graph
correctness on planted inputs, funnel monotonicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as mod

_QS = mod.queries()


def test_triangles_on_planted_graph(spark):
    from code_challenge___data_engineer___machinemax_spark.operators.clustering import (
        triangles,
    )

    # one triangle (1,2,3), one dangling edge (3,4), one square without a
    # diagonal (5,6,7,8) — squares must NOT count
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6), (6, 7), (7, 8), (5, 8)],
        "id_a long, id_b long",
    )
    got = {(r.id_a, r.id_b, r.id_c) for r in triangles(edges).collect()}
    assert got == {(1, 2, 3)}
    # adding the diagonal closes two triangles of the square
    edges2 = edges.unionByName(
        spark.createDataFrame([(6, 8)], "id_a long, id_b long")
    )
    got2 = {(r.id_a, r.id_b, r.id_c) for r in triangles(edges2).collect()}
    assert got2 == {(1, 2, 3), (5, 6, 8), (6, 7, 8)}


def test_hash_split_stable_across_layouts(spark):
    from code_challenge___data_engineer___machinemax_spark.plans.pipeline_queries import (
        hash_split_bucket,
    )

    ids = spark.range(0, 2000)
    one = {r.id: r.b for r in ids.coalesce(1).select("id", hash_split_bucket("id").alias("b")).collect()}
    many = {r.id: r.b for r in ids.repartition(16).select("id", hash_split_bucket("id").alias("b")).collect()}
    assert one == many  # no partitioning dependence
    # roughly 80/10/10 over 2000 uniform hashes
    n_train = sum(1 for b in one.values() if b < 80)
    assert 1500 < n_train < 1700


def test_funnel_counts_are_monotone(spark, sf_dir):
    rows = {r.stage: r.n_users for r in _QS["funnel_conversion"](spark, sf_dir).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_funnel_requires_stage_order(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # user 1: proper view->click->purchase; user 2: click BEFORE view (must
    # not reach stage 2); user 3: purchase before click (stops at click)
    events = spark.createDataFrame(
        [
            (1, 1, "view", 0.0, base),
            (2, 1, "click", 0.0, base + dt.timedelta(minutes=1)),
            (3, 1, "purchase", 0.0, base + dt.timedelta(minutes=2)),
            (4, 2, "click", 0.0, base),
            (5, 2, "view", 0.0, base + dt.timedelta(minutes=1)),
            (6, 3, "view", 0.0, base),
            (7, 3, "purchase", 0.0, base + dt.timedelta(minutes=1)),
            (8, 3, "click", 0.0, base + dt.timedelta(minutes=2)),
        ],
        "event_id long, user_id long, event_type string, value double, ts timestamp",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        events.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        rows = {
            r.stage: r.n_users
            for r in _QS["funnel_conversion"](spark, tmp).collect()
        }
    assert rows == {"1_view": 3, "2_click": 2, "3_purchase": 1}


def test_sequence_packing_contiguous_and_ordered(spark, sf_dir):
    per_lang = (
        _QS["sequence_packing"](spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.min("pack_id").alias("lo"),
            F.max("pack_id").alias("hi"),
            F.count("*").alias("n"),
            F.sum("total_tokens").alias("tot"),
        )
        .collect()
    )
    for r in per_lang:
        assert r.lo == 0
        assert r.n == r.hi - r.lo + 1  # pack ids are contiguous per lang
        # conservation: sum over packs == sum over docs (already implied by
        # grouping, but pins the window didn't drop rows)
        assert r.tot > 0


def test_cohort_retention_offsets_bounded_by_cohort_size(spark, sf_dir):
    rows = _QS["cohort_retention"](spark, sf_dir).collect()
    base = {r.cohort_midx: r.n_customers for r in rows if r.month_offset == 0}
    for r in rows:
        assert r.month_offset >= 0
        # every cohort has an offset-0 row (its members' first month), and
        # retention never exceeds the cohort's size
        assert r.cohort_midx in base
        assert r.n_customers <= base[r.cohort_midx]


def test_ols_moments_solve_and_fit(spark, sf_dir):
    """Driver-side completion of the distributed OLS training pass: solve
    the 3x3 normal equations from the exact integer moments and check the
    fit beats the intercept-only baseline (token count correlates with
    n_chars by construction)."""
    import numpy as np

    r = _QS["ols_training_moments"](spark, sf_dir).collect()[0]
    xtx = np.array(
        [
            [r.n, r.s_c, r.s_v],
            [r.s_c, r.s_cc, r.s_cv],
            [r.s_v, r.s_cv, r.s_vv],
        ],
        dtype=np.float64,
    )
    xty = np.array([r.s_y, r.s_cy, r.s_vy], dtype=np.float64)
    beta = np.linalg.solve(xtx, xty)
    # residual sum of squares via the same moments: y'y is not collected,
    # but RSS relative ordering only needs the projection terms
    explained = beta @ xty
    baseline = r.s_y * r.s_y / r.n  # intercept-only model's explained sum
    assert explained > baseline  # the features genuinely reduce RSS
    assert beta[1] > 0  # more chars -> more tokens


def test_bpe_train_crafted_semantics(spark):
    """Hand-computed 3-step BPE run: corpus weighting, the (cnt desc, a, b)
    tie-break, greedy non-overlapping fusion, and a learned symbol
    participating in later merges."""
    from code_challenge___data_engineer___machinemax_spark.operators.bpe import bpe_train

    words = spark.createDataFrame([("banana", 10), ("bandana", 5)], "w string, n long")
    merges, final = bpe_train(words, iters=3)
    # step 1: (a,n) appears twice in each word -> 2*10 + 2*5 = 30
    # step 2: (an,a) and (b,an) tie at 15; 'an' < 'b' breaks the tie
    # step 3: (b,an) at 15 wins
    assert merges == [(1, "a", "n", 30), (2, "an", "a", 15), (3, "b", "an", 15)]
    syms = {r.w: r.syms for r in final.collect()}
    assert syms["banana"] == ["ban", "ana"]
    assert syms["bandana"] == ["ban", "d", "ana"]


def test_repetition_signals_crafted(spark, tmp_path):
    """Hand-computed Gopher repetition signals: a boilerplate-line doc, a
    degenerate bigram loop, a clean doc, a NULL text (excluded), and an
    empty text (zero signals, kept)."""
    clean = " ".join(f"w{i:02d}" for i in range(30))
    docs = [
        (1, "alpha beta gamma\ndup line here\ndup line here\nunique tail"),
        (2, "spam ham spam ham spam ham spam ham"),
        (3, clean),
        (4, None),
        (5, ""),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r.doc_id: r
        for r in _QS["repetition_signals"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1, 2, 3, 5}  # NULL text excluded
    # doc 1: "dup line here" (13 chars) twice of 53 line chars -> 26/53;
    # top bigram ties at 2 between "dup line"/"line here", lexicographic min
    r1 = rows[1]
    assert r1.dup_line_char_frac == round(26 / 53, 6)
    assert (r1.top_bigram, r1.top_bigram_count) == ("dup line", 2)
    assert r1.top_bigram_char_frac == round(2 * 7 / 46, 6)
    assert not r1.keep
    # doc 2: one line (no dup), "spam ham" x4 covers all 28 token chars
    r2 = rows[2]
    assert r2.dup_line_char_frac == 0.0
    assert (r2.top_bigram, r2.top_bigram_count) == ("spam ham", 4)
    assert r2.top_bigram_char_frac == 1.0
    assert not r2.keep
    # doc 3: all bigrams unique -> lexicographic min wins; under thresholds
    r3 = rows[3]
    assert (r3.top_bigram, r3.top_bigram_count) == ("w00 w01", 1)
    assert r3.dup_line_char_frac == 0.0
    assert r3.top_bigram_char_frac == round(6 / 90, 6)
    assert r3.keep
    # doc 5: no lines, no tokens -> zero signals, NULL top bigram, kept
    r5 = rows[5]
    assert (r5.dup_line_char_frac, r5.top_bigram, r5.top_bigram_count) == (0.0, None, 0)
    assert r5.top_bigram_char_frac == 0.0 and r5.keep


def test_source_mixture_weights_crafted(spark, tmp_path):
    """Hand-computed sqrt-temperature mixing: 4 vs 16 tokens gives exact
    integer weights 2e6 vs 4e6 -> mix 1/3 vs 2/3, flattening the 0.2/0.8
    raw token share."""
    docs = [
        (1, "a", "one two three four"),
        (2, "b", " ".join(f"t{i}" for i in range(16))),
    ]
    spark.createDataFrame(docs, "doc_id long, source string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r.source: r
        for r in _QS["source_mixture_weights"](spark, str(tmp_path)).collect()
    }
    assert rows["a"].total_tokens == 4 and rows["b"].total_tokens == 16
    assert (rows["a"].token_share, rows["b"].token_share) == (0.2, 0.8)
    assert rows["a"].mix_weight == round(1 / 3, 6)
    assert rows["b"].mix_weight == round(2 / 3, 6)
    # sqrt smoothing moved both sources toward uniform (0.5)
    assert rows["a"].token_share < rows["a"].mix_weight < 0.5
    assert 0.5 < rows["b"].mix_weight < rows["b"].token_share


def test_repetition_and_mixture_plan_shapes(spark, sf_dir):
    """Plan guards: repetition_signals keeps every window partitioned (no
    single-task global ordering) and joins exactly the two aggregated
    signal tables; source_mixture_weights broadcasts its one-row totals."""
    from tests.test_plans import explain_text

    rep = explain_text(_QS["repetition_signals"](spark, sf_dir))
    assert "Window" in rep
    # every Window operator carries a partition spec (doc_id)
    for line in rep.splitlines():
        if "Arguments" in line and "windowspecdefinition" in line:
            assert "doc_id" in line
    # two signal joins, not three: token_chars is inlined on the base
    assert rep.count("SortMergeJoin") + rep.count("ShuffledHashJoin") <= 2

    mix = explain_text(_QS["source_mixture_weights"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in mix or "BroadcastHashJoin" in mix
    assert "SortMergeJoin" not in mix


def test_c4_line_cleanse_crafted(spark, tmp_path):
    """C4 line rules pinned: terminal punctuation required, >= 3 tokens
    required, kept lines re-joined trimmed, empty result is '' not NULL."""
    docs = [
        (1, "Good sentence here.\nnav menu\nAnother good line!\nshort."),
        (2, "no punctuation at all\nhome | about | contact"),
        (3, '  Quoted words end."  \nx.'),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r.doc_id: r for r in _QS["c4_line_cleanse"](spark, str(tmp_path)).collect()}
    r1 = rows[1]
    assert (r1.n_lines, r1.n_kept) == (4, 2)  # menu line and 1-token line drop
    assert r1.cleaned_text == "Good sentence here.\nAnother good line!"
    r2 = rows[2]
    assert (r2.n_kept, r2.cleaned_text) == (0, "")
    r3 = rows[3]  # padded quote-terminated line kept and trimmed; "x." too short
    assert (r3.n_kept, r3.cleaned_text) == (1, 'Quoted words end."')


def test_k_anonymity_boundary(spark, tmp_path):
    """k=10 boundary pinned: a QI group with exactly 10 orders releases its
    revenue; 9 orders suppresses (count visible, revenue NULL)."""
    import datetime

    import __spark_entry__ as mod

    orders = [
        (i, 1 if i < 10 else 2, 100.0, datetime.datetime(2024, 3, 1))
        for i in range(19)  # custkey 1: 10 orders, custkey 2: 9 orders
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 7, "AUTO"), (2, 8, "BIKE")],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    rows = {
        r.c_nationkey: r
        for r in mod.queries()["k_anonymity_release"](spark, str(tmp_path)).collect()
    }
    assert rows[7].released and rows[7].revenue == 1000.0 and rows[7].n_orders == 10
    assert not rows[8].released and rows[8].revenue is None and rows[8].n_orders == 9


def test_pipeline_funnel_every_stage_drops(spark, tmp_path):
    """Composition pinned on a corpus where EVERY funnel stage removes
    documents: null text, short text, wrong language, an exact duplicate,
    and a benchmark-contaminated train doc."""
    import __spark_entry__ as mod

    long_en = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, "en", long_en),
        (2, "en", long_en),                      # exact dup of 1 -> dropped at stage 4
        (3, "en", "too short"),                  # dropped at stage 2
        (4, "fr", "le renard brun saute par dessus le chien paresseux"),  # stage 3
        (5, "en", None),                         # dropped at stage 2
        (10, "en", "alpha beta gamma delta epsilon zeta eta theta"),  # benchmark doc (id%10=0)
        (11, "en", "alpha beta gamma delta epsilon unrelated tail words here"),  # contaminated train doc
        (12, "en", "completely disjoint content about spark shuffles and joins"),
    ]
    spark.createDataFrame(docs, "doc_id long, lang string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r.stage_name: r for r in
            mod.queries()["pipeline_funnel_report"](spark, str(tmp_path)).collect()}
    assert rows["raw"].n_docs == 8
    assert rows["admitted"].n_docs == 6       # drops 3 (short) and 5 (null)
    assert rows["lang_en"].n_docs == 5        # drops 4 (fr)
    assert rows["exact_dedup"].n_docs == 4    # collapses 1/2
    # stage 5: benchmark doc 10 leaves the train split; doc 11 shares 3 of
    # its trigrams with it (>20%); docs 1 and 12 survive
    assert rows["decontaminated"].n_docs == 2
    assert rows["decontaminated"].n_tokens == len(long_en.split()) + 8


def test_cdc_merge_semantics_crafted(spark, tmp_path):
    """MERGE semantics pinned on a 5-row base: the updated key keeps its
    new value exactly once, the deleted key is gone, the insert lands,
    untouched rows survive."""
    import datetime

    import __spark_entry__ as mod

    dt = datetime.datetime(2024, 1, 1)
    orders = [
        # key, custkey, status, price, date, priority
        (3, 1, "O", 100.0, dt, "1-URGENT"),    # untouched (not %7/%13/%10)
        (14, 1, "O", 100.0, dt, "1-URGENT"),   # %7=0 -> updated to 110
        (26, 1, "F", 100.0, dt, "1-URGENT"),   # %13=0, %7!=0 -> deleted
        (91, 1, "F", 100.0, dt, "1-URGENT"),   # %7=0 AND %13=0 -> update wins
        (20, 1, "P", 50.0, dt, "1-URGENT"),    # %10=0 -> insert
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = {r.o_orderstatus: r for r in
            mod.queries()["cdc_merge_apply"](spark, str(tmp_path)).collect()}
    assert (rows["O"].n_rows, rows["O"].revenue) == (2, 210.0)   # 3 + updated 14
    assert (rows["F"].n_rows, rows["F"].revenue) == (1, 110.0)   # 91 updated, 26 deleted
    assert (rows["P"].n_rows, rows["P"].revenue) == (1, 50.0)    # insert


def test_snapshot_diff_counts_equal_delta_cardinalities(spark, tmp_path):
    """The diff must reconcile exactly with the CDC delta that produced
    the second snapshot: added == |I|, removed == |D|, changed == |U|."""
    import datetime

    import __spark_entry__ as mod

    dt = datetime.datetime(2024, 1, 1)
    rows = []
    for k in range(1, 200):
        rows.append((k, 1, "O", 100.0, dt, "1-URGENT"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    keys = list(range(1, 200))
    n_ins = sum(1 for k in keys if k % 10 == 0)
    base = [k for k in keys if k % 10 != 0]
    n_upd = sum(1 for k in base if k % 7 == 0)
    n_del = sum(1 for k in base if k % 13 == 0 and k % 7 != 0)
    r = mod.queries()["snapshot_diff"](spark, str(tmp_path)).collect()[0]
    assert (r.n_added, r.n_removed, r.n_changed) == (n_ins, n_del, n_upd)
    assert r.n_unchanged == len(base) - n_upd - n_del


def test_ols_by_segment_solves_planted_trend(spark, tmp_path):
    """The grouped moments must recover a planted linear trend per group:
    segment A has slope 200 cents/day, segment B slope -100, both exact."""
    import datetime

    import __spark_entry__ as mod

    rows, cust = [], []
    for seg, cks, slope, icpt in [("A", (1, 2), 200, 50_000), ("B", (3,), -100, 90_000)]:
        for ck in cks:
            cust.append((ck, seg))
        for day in range(10, 40):
            rows.append(
                (len(rows), cks[day % len(cks)],
                 (icpt + slope * day) / 100.0,
                 datetime.datetime(1970, 1, 1) + datetime.timedelta(days=day))
            )
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(cust, "c_custkey long, c_mktsegment string").write.parquet(
        str(tmp_path / "customer.parquet")
    )
    out = {r.c_mktsegment: r for r in
           mod.queries()["ols_by_segment"](spark, str(tmp_path)).collect()}
    for seg, want_slope, want_icpt in [("A", 200, 50_000), ("B", -100, 90_000)]:
        m = out[seg]
        den = m.n * m.s_xx - m.s_x * m.s_x
        slope = (m.n * m.s_xy - m.s_x * m.s_y) / den
        icpt = (m.s_y - slope * m.s_x) / m.n
        assert round(slope, 6) == want_slope, seg
        assert round(icpt, 6) == want_icpt, seg


def test_churn_classes_crafted(spark, tmp_path):
    """Label semantics pinned: active-recent is not churned, active-stale
    is churned, never-active is its own class."""
    import datetime

    import __spark_entry__ as mod

    d = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    orders = [
        (1, 10, "O", 10.0, d("2024-06-01"), "P"),   # cust 10: recent -> active
        (2, 11, "O", 10.0, d("2024-01-01"), "P"),   # cust 11: stale -> churned
        (3, 10, "O", 10.0, d("2024-01-05"), "P"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, "SEG"), (11, "SEG"), (12, "SEG")],  # 12 never ordered
        "c_custkey long, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    r = mod.queries()["churn_label_table"](spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.n_churned, r.n_never_active) == (3, 1, 1)
    assert r.churn_rate_e6 == 333333


def test_kneser_ney_hand_computed(spark, tmp_path):
    # train doc 0: "a b a b c" -> bigrams ab,ba,ab,bc
    #   c12: ab=2 ba=1 bc=1; c1: a=(2,1) b=(2,2); Ncont: a=1 b=1 c=1; Ntypes=3
    # scored doc 1: "a b d a"
    #   "a b": (4*2-3)*3 + 3*1*1 = 18 over 4*2*3=24 -> 750000
    #          (textbook check: max(2-.75,0)/2 + .75*(2/2)*(1/3)... with
    #           lambda = D*N1f/c1 = .75*1/2 -> .625 + .125 = .75)
    #   "b d": w1 seen, w2 unseen -> num 0 -> zero-prob token
    #   "d a": w1 unseen -> backoff Ncont(a)/Ntypes = 1/3 -> 333333
    docs = [(0, "a b a b c"), (1, "a b d a")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r.doc_id: r
        for r in _QS["kneser_ney_doc_scores"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1}
    r = rows[1]
    assert r.n_bigrams == 3
    assert r.kn_prob_sum_e6 == 750000 + 0 + 333333
    assert r.n_zero == 1


def test_cohens_kappa_hand_computed(spark, tmp_path):
    # en/fr corpus: 2 correct guesses, 1 unk, 1 wrong ->
    #   N=4 diag=2 rows(en2,fr2) cols(en2,fr1,unk1) pe_num=2*2+2*1=6
    #   kappa = (4*2-6)/(16-6) = 0.2
    docs = [
        (1, "en", "the of and"),
        (2, "fr", "le la et"),
        (3, "en", "xyz zz qq"),
        (4, "fr", "the of and"),
    ]
    spark.createDataFrame(docs, "doc_id long, lang string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    r = _QS["cohens_kappa_langid"](spark, str(tmp_path)).collect()[0]
    assert (r.n_items, r.n_agree) == (4, 2)
    assert (r.po_e6, r.pe_e6) == (500000, 375000)
    assert (r.kappa_num, r.kappa_den, r.kappa_e6) == (2, 10, 200000)


def test_cohens_kappa_negative_sign_split(spark, tmp_path):
    # systematic disagreement: kappa = -1; pins the sign-split scaling
    # (floor vs truncate divergence on negatives is the thing factored out)
    docs = [(1, "fr", "the of and"), (2, "en", "le la et")]
    spark.createDataFrame(docs, "doc_id long, lang string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    r = _QS["cohens_kappa_langid"](spark, str(tmp_path)).collect()[0]
    assert r.n_agree == 0
    assert r.kappa_e6 == -1000000
