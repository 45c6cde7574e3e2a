"""Sampling semantics: determinism, quota exactness, seed stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark import plans
from code_challenge___data_engineer___machinemax_spark.tables import load_table

_QS = plans.all_queries()


def test_stratified_sample_exact_quota_and_deterministic(spark, sf_dir):
    a = _QS["stratified_sample_per_source"](spark, sf_dir)
    per = {r.source: r.n for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n == 5 for n in per.values())
    ids1 = {r.doc_id for r in a.collect()}
    ids2 = {r.doc_id for r in _QS["stratified_sample_per_source"](spark, sf_dir).collect()}
    assert ids1 == ids2


def test_weighted_mix_quotas(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    totals = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r.lang: r.n
        for r in _QS["weighted_corpus_mix"](spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    import math

    for lang, n in got.items():
        w = {"en": 0.8, "de": 0.5}.get(lang, 0.2)
        assert n == math.ceil(totals[lang] * w)


def test_bernoulli_sample_seed_stable(spark, sf_dir):
    a = {r.lang: r.n_sampled for r in _QS["bernoulli_sample_stats"](spark, sf_dir).collect()}
    b = {r.lang: r.n_sampled for r in _QS["bernoulli_sample_stats"](spark, sf_dir).collect()}
    assert a == b  # same seed -> same sample
    total = sum(a.values())
    n = load_table(spark, sf_dir, "documents").count()
    assert 0.05 * n < total < 0.5 * n  # fraction=0.2 within loose tolerance


def test_token_budget_apportionment_sums_exactly(spark, tmp_path):
    """Hamilton-method invariants pinned: quotas are integers summing
    EXACTLY to the budget, ordered fairly by remainder."""
    import __spark_entry__ as mod

    # three sources with token masses 7, 5, 3 (sum 15) -> 1M budget:
    # floors 466666/333333/200000 (sum 999999), one leftover seat goes to
    # the largest remainder: 1M*7 % 15 = 10, 1M*5 % 15 = 5, 1M*3 % 15 = 0
    docs = [
        (1, "a", "t1 t2 t3 t4 t5 t6 t7"),
        (2, "b", "t1 t2 t3 t4 t5"),
        (3, "c", "t1 t2 t3"),
    ]
    spark.createDataFrame(docs, "doc_id long, source string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r.source: r.quota for r in
            mod.queries()["token_budget_apportionment"](spark, str(tmp_path)).collect()}
    assert sum(rows.values()) == 1_000_000
    assert rows == {"a": 466667, "b": 333333, "c": 200000}


def test_apportionment_invariants_random_masses(spark, tmp_path):
    """Hamilton invariants across randomized source masses: quotas always
    sum exactly to the budget and never differ from the exact proportional
    share by a full unit (no-deviation property of largest remainder)."""
    import random

    import __spark_entry__ as mod

    rng = random.Random(7)
    docs, did = [], 0
    masses = {f"s{i}": rng.randint(1, 40) for i in range(9)}
    for src, n_tok in masses.items():
        docs.append((did, src, " ".join(f"t{j}" for j in range(n_tok))))
        did += 1
    spark.createDataFrame(docs, "doc_id long, source string, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = mod.queries()["token_budget_apportionment"](spark, str(tmp_path)).collect()
    total_mass = sum(masses.values())
    assert sum(r.quota for r in rows) == 1_000_000
    for r in rows:
        exact = 1_000_000 * masses[r.source] / total_mass
        assert abs(r.quota - exact) < 1, (r.source, r.quota, exact)


def test_kfold_balance_within_one(spark, sf_dir):
    """Every (stratum, fold) cell is balanced to within one document, and
    fold sizes per stratum sum back to the stratum size."""
    import __spark_entry__ as mod

    rows = mod.queries()["stratified_kfold_counts"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.fold] = r.n_docs
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    sizes = {r.source: r.n for r in load_table(spark, sf_dir, "documents")
             .groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for src, folds in by_src.items():
        assert max(folds.values()) - min(folds.values()) <= 1, src
        assert sum(folds.values()) == sizes[src]


def test_embargo_kills_leaky_pairs(spark, sf_dir):
    """The embargo arm's leaky-pair count is structurally zero (train
    ends exactly one leakage horizon before the cutoff); the naive arm
    must show nonzero measured leakage on this order stream, at the cost
    of the embargo arm dropping ~30 days of training rows."""
    import __spark_entry__ as mod

    rows = {r.arm: r for r in mod.queries()["embargo_split_report"](spark, sf_dir).collect()}
    emb, nai = rows["embargo30"], rows["naive"]
    assert emb.n_leaky_pairs == 0
    assert nai.n_leaky_pairs > 0
    assert emb.n_train < nai.n_train
    assert emb.n_dropped > 0 and nai.n_dropped == 0
    assert emb.n_test == nai.n_test


def test_negative_sampling_prefers_popular_items(spark, sf_dir):
    """Inclusion probability is proportional to popularity: the top
    popularity quartile must receive strictly more sampled negatives than
    the bottom quartile, and the total draw is bounded by users x K."""
    import __spark_entry__ as mod
    from pyspark.sql import functions as F

    rows = {r.quartile: r for r in mod.queries()["negative_sampling_report"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[4].n_sampled > rows[1].n_sampled
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_users = o.select("o_custkey").distinct().count()
    assert 0 < sum(r.n_sampled for r in rows.values()) <= n_users * 4
