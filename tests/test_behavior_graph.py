"""Semantic invariant tests for the behavioral-analytics and graph
queries — properties the oracle/golden comparison can't express
(monotonicity, conservation, dominance, handshake parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as mod

_QS = mod.queries()


def test_cohort_retention_offset0_is_full(spark, sf_dir):
    rows = _QS["cohort_retention_matrix"](spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.active_users <= r.cohort_size
        assert 0 < r.retention_e6 <= 1_000_000
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r
    for cohort, cells in by_cohort.items():
        # every user is active in their own first week by construction
        assert 0 in cells, cohort
        assert cells[0].active_users == cells[0].cohort_size
        assert cells[0].retention_e6 == 1_000_000


def test_cohort_sizes_partition_users(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = _QS["cohort_retention_matrix"](spark, sf_dir).collect()
    total_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    # cohorts partition the user base: offset-0 cells sum to all users
    assert (
        sum(r.cohort_size for r in rows if r.week_offset == 0) == total_users
    )


def test_funnel_is_monotone(spark, sf_dir):
    rows = sorted(
        _QS["funnel_conversion_ordered"](spark, sf_dir).collect(),
        key=lambda r: r.step_idx,
    )
    assert [r.step for r in rows] == ["signup", "view", "click", "purchase"]
    for prev, cur in zip(rows, rows[1:]):
        # a user must pass step k-1 before step k
        assert cur.users <= prev.users
        assert 0 <= cur.conv_prev_e6 <= 1_000_000
        assert cur.conv_first_e6 <= prev.conv_first_e6
    assert rows[0].conv_prev_e6 == 1_000_000
    assert rows[0].conv_first_e6 == 1_000_000


def test_funnel_ordering_is_stricter_than_presence(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = _QS["funnel_conversion_ordered"](spark, sf_dir).collect()
    purchase_step = next(r for r in rows if r.step == "purchase")
    e = load_table(spark, sf_dir, "events")
    has_all = (
        e.filter(
            F.col("event_type").isin("signup", "view", "click", "purchase")
        )
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("k"))
        .filter(F.col("k") == 4)
        .count()
    )
    # ordered-sequence completion can never exceed unordered presence
    assert purchase_step.users <= has_all


def test_triangle_counts_conserve_total(spark, sf_dir):
    rows = _QS["triangle_participation"](spark, sf_dir).collect()
    assert rows, "support floor left no triangles at the test SF"
    # each triangle contributes exactly 3 node participations; with the
    # full (un-LIMITed) node set the sum is divisible by 3 — recompute
    # without the top-50 cut via the same registered plan's parent
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        _edges,
    )

    edges = _edges(spark, sf_dir)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    n_tri = (
        e1.join(e2, F.col("e2.x") == F.col("e1.y"))
        .join(
            e3,
            (F.col("e3.x") == F.col("e1.x"))
            & (F.col("e3.y") == F.col("e2.y")),
        )
        .count()
    )
    assert n_tri > 0
    # top-50 participation counts are bounded by the global triangle count
    for r in rows:
        assert 0 < r.n_triangles <= n_tri


def test_adamic_adar_pairs_are_nonadjacent_and_bounded(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        _edges,
    )

    rows = _QS["adamic_adar_links"](spark, sf_dir).collect()
    assert rows
    edge_set = {
        (r.x, r.y) for r in _edges(spark, sf_dir).collect()
    }
    # 1/ln(2) is the max per-neighbor contribution (deg >= 2)
    max_contrib = int(1e6 / 0.6931471805599453) + 1
    for r in rows:
        assert r.part_u < r.part_v
        assert (r.part_u, r.part_v) not in edge_set, "predicted an edge"
        assert r.common_neighbors >= 1
        assert 0 < r.aa_score_e6 <= r.common_neighbors * max_contrib


def test_daily_revenue_acf_shape_and_bounds(spark, sf_dir):
    rows = sorted(
        _QS["daily_revenue_acf"](spark, sf_dir).collect(),
        key=lambda r: r.lag,
    )
    assert [r.lag for r in rows] == list(range(1, 8))
    n0 = rows[0].n
    for r in rows:
        # correlation in [-1, 1]
        assert -1_000_000 <= r.acf_e6 <= 1_000_000
        # each extra lag loses exactly one aligned pair on a dense grid
        assert r.n == n0 - (r.lag - 1)


def test_woe_iv_cells_nonnegative_and_consistent(spark, sf_dir):
    rows = _QS["woe_iv_encoding"](spark, sf_dir).collect()
    feats = {}
    for r in rows:
        # (sg - sb) and ln(sg/sb) always share a sign -> IV cell >= 0
        assert r.iv_cell_e9 >= 0, (r.feature, r.bucket)
        g, b = feats.setdefault(r.feature, [0, 0])
        feats[r.feature] = [g + r.n_good, b + r.n_bad]
    assert set(feats) == {"mktsegment", "nation"}
    # both features stack the SAME labeled orders -> identical totals
    assert feats["mktsegment"] == feats["nation"]


def test_recsys_hitrate_counters_consistent(spark, sf_dir):
    (row,) = _QS["recsys_hitrate_eval"](spark, sf_dir).collect()
    assert 0 <= row.hits_at10 <= row.n_eval
    assert row.hitrate_e6 == row.hits_at10 * 1_000_000 // row.n_eval


def test_item_item_hot_user_cap_bounds_pairs(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.plans.recsys_queries import (
        item_item_similarity,
    )

    # cap = 1: every customer keeps at most one item, so NO co-occurrence
    # pair can form — the hard upper bound the cap contract promises (a
    # planted mega-basket customer contributes cap*(cap-1)/2 = 0 pairs)
    assert item_item_similarity(spark, sf_dir, max_user_items=1).count() == 0
    # cap far above every basket width: a no-op — identical to the exact
    # (oracle-parity) default, proving the cap only prunes above threshold
    exact = _QS["item_item_similarity"](spark, sf_dir).collect()
    capped = item_item_similarity(
        spark, sf_dir, max_user_items=1_000_000
    ).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, capped))
    # a binding small cap bounds the co matrix: with at most 3 items per
    # user, any pair's co-count <= the number of users, and the result
    # stays a valid top-3-per-item frame
    small = item_item_similarity(spark, sf_dir, max_user_items=3).collect()
    assert all(r.rk <= 3 for r in small)


def test_weighted_sample_keys_ordered_and_negative(spark, sf_dir):
    rows = _QS["weighted_priority_sample"](spark, sf_dir).collect()
    assert len(rows) == 200
    keys = [r.key_e9 for r in rows]
    assert keys == sorted(keys, reverse=True)
    for r in rows:
        assert r.key_e9 <= 0  # ln(u) <= 0 for u in (0, 1]
        assert r.weight > 0


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = _QS["weighted_priority_sample"](spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    mean_all = d.agg(F.avg("n_chars")).first()[0]
    mean_sample = sum(r.weight for r in rows) / len(rows)
    # length-proportional sampling must pull the sample mean above the
    # corpus mean (a uniform draw would straddle it)
    assert mean_sample > mean_all


def test_streamed_unconverted_views_eviction_boundary(spark, sf_dir):
    import datetime

    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = _QS["streamed_unconverted_views"](spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    vb = e.filter("event_type='view'").select(
        F.col("user_id").alias("u"), F.col("ts").alias("vts"),
        F.col("event_id").alias("vid"))
    pb = e.filter("event_type='purchase'").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
    m = vb.join(
        pb, F.expr("pu = u AND pts >= vts AND pts <= vts + interval 1 hour"))
    # inner half == the batch join, bit-for-bit on counts
    assert sum(r.n_pairs for r in rows) == m.count()
    unmatched = vb.join(m.select("vid").distinct(), "vid", "left_anti")
    maxv = e.filter("event_type='view'").agg(F.max("ts")).collect()[0][0]
    maxp = e.filter("event_type='purchase'").agg(F.max("ts")).collect()[0][0]
    wm = min(maxv, maxp) - datetime.timedelta(hours=2)
    n_closed = unmatched.filter(
        F.expr(f"vts + interval 1 hour < timestamp'{wm}'")).count()
    n_unc = sum(r.n_unconverted for r in rows)
    # outer half: exactly the watermark-closed unmatched views, and the
    # open tail (inside the horizon) is genuinely withheld
    assert n_unc == n_closed
    assert n_unc < unmatched.count()


def test_kcore_membership_is_dense_subgraph(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        _edges,
    )

    rows = _QS["kcore_membership"](spark, sf_dir).collect()
    assert rows, "no 3-core at the test SF"
    edges = [(r.x, r.y) for r in _edges(spark, sf_dir).collect()]

    # sequential replay of the bounded peel: 4 rounds of drop-below-3,
    # then the emitting round — the engine's distributed supersteps must
    # reproduce the naive loop exactly
    import collections

    def degrees(alive):
        d = collections.Counter()
        for x, y in edges:
            if x in alive and y in alive:
                d[x] += 1
                d[y] += 1
        return d

    alive = {n for e in edges for n in e}
    for _ in range(4):
        alive = {n for n, d in degrees(alive).items() if d >= 3}
    expected = {n: d for n, d in degrees(alive).items() if d >= 3}
    assert {r.part: r.core_deg for r in rows} == expected
    for r in rows:
        assert r.core_deg >= 3


def test_label_propagation_matches_sequential_bfs(spark, sf_dir):
    """The distributed supersteps must reproduce a naive sequential
    multi-source BFS: seeds = top-8 by degree (ties: min id), label =
    nearest seed's id with smallest-label tie-break, 4 hops."""
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        _edges,
    )

    rows = _QS["label_propagation_seeded"](spark, sf_dir).collect()
    assert rows, "no communities at the test SF"
    edges = [(r.x, r.y) for r in _edges(spark, sf_dir).collect()]

    import collections

    adj = collections.defaultdict(set)
    deg = collections.Counter()
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
        deg[x] += 1
        deg[y] += 1
    seeds = sorted(deg, key=lambda n: (-deg[n], n))[:8]
    state = {s: (0, s) for s in seeds}
    for _ in range(4):
        nxt = dict(state)
        for n, (d, lab) in state.items():
            for nb in adj[n]:
                cand = (d + 1, lab)
                if nb not in nxt or cand < nxt[nb]:
                    nxt[nb] = min(cand, nxt.get(nb, cand))
            # own state never worsens
        state = nxt
    expected = collections.defaultdict(list)
    for n, (d, lab) in state.items():
        expected[lab].append((n, d))
    got = {r.label: (r.n_members, r.min_member, r.max_dist) for r in rows}
    want = {
        lab: (
            len(members),
            min(n for n, _ in members),
            max(d for _, d in members),
        )
        for lab, members in expected.items()
    }
    assert got == want
    # every seed labels itself at distance 0, so its own community exists
    for s in seeds:
        assert s in got


def test_shapley_attribution_hand_computed(spark, tmp_path):
    # user 1: click then purchase -> touch mask {click}
    # user 2: purchase with no prior touches -> empty mask (baseline)
    # user 3: purchase, then a view AFTER it -> post-conversion touch
    #         must not count -> empty mask
    # Shapley: only click ever flips a coalition's value (+1 conversion),
    # so phi_click = 1 (x24 = 24) and every other channel gets 0.
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    events = [
        (1, t(0), 1, "click", 0.0, ""),
        (2, t(1), 1, "purchase", 1.0, ""),
        (3, t(0), 2, "purchase", 1.0, ""),
        (4, t(0), 3, "purchase", 1.0, ""),
        (5, t(1), 3, "view", 0.0, ""),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    rows = {
        r.channel: r
        for r in _QS["shapley_channel_attribution"](spark, str(tmp_path)).collect()
    }
    assert rows["click"].phi_x24 == 24
    assert rows["error"].phi_x24 == 0
    assert rows["signup"].phi_x24 == 0
    assert rows["view"].phi_x24 == 0
    # v(full) = all 3 converters visible on every channel row
    assert all(r.v_with_all_ge == 3 for r in rows.values())


def test_shapley_efficiency_invariant(spark, sf_dir):
    # sum of Shapley credits == 24 * (v(all channels) - v(no channels)):
    # exactly the conversions that had at least one pre-purchase touch
    rows = _QS["shapley_channel_attribution"](spark, sf_dir).collect()
    total = sum(r.phi_x24 for r in rows)
    assert total % 24 == 0
    assert 0 < total // 24 <= rows[0].v_with_all_ge


def test_policy_replay_hand_computed(spark, tmp_path):
    # user 1 trains on day 2 (even): 2 clicks + 1 view -> policy 'click';
    # eval day 3 (odd): click $1, view $5, click $2 -> 2 of 3 matched,
    # matched mass 300c, per-match 150c, per-logged 800c//3 = 266c.
    # user 2 has eval activity but NO training days -> excluded entirely.
    import datetime as dt

    d2 = lambda h: dt.datetime(2024, 1, 2, h)  # noqa: E731
    d3 = lambda h: dt.datetime(2024, 1, 3, h)  # noqa: E731
    events = [
        (1, d2(1), 1, "click", 0.5, ""),
        (2, d2(2), 1, "click", 0.5, ""),
        (3, d2(3), 1, "view", 0.5, ""),
        (4, d3(1), 1, "click", 1.0, ""),
        (5, d3(2), 1, "view", 5.0, ""),
        (6, d3(3), 1, "click", 2.0, ""),
        (7, d3(4), 2, "view", 9.0, ""),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = _QS["policy_replay_eval"](spark, str(tmp_path)).collect()[0]
    assert (r.n_eval_events, r.n_matched, r.matched_value_c) == (3, 2, 300)
    assert (r.value_per_match_c, r.value_per_logged_c) == (150, 266)
    assert r.match_rate_e6 == 666666


def test_seeded_walks_forced_path_and_determinism(spark, tmp_path):
    # one edge (1,2) with support 2: degree 1 everywhere, so every step is
    # forced -> walks strictly alternate 1,2,1,2,1 / 2,1,2,1,2 for both
    # walk ids regardless of the hash values
    rows = [(100, 1), (100, 2), (200, 1), (200, 2)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = _QS["seeded_random_walks"](spark, str(tmp_path)).collect()
    walks = {}
    for r in out:
        walks.setdefault((r.start_node, r.walk_id), {})[r.step] = r.node
    assert len(walks) == 4  # 2 nodes x 2 walks
    for (start, _), path in walks.items():
        seq = [path[s] for s in range(5)]
        other = 2 if start == 1 else 1
        assert seq == [start, other, start, other, start]
    # and the whole corpus is run-to-run deterministic
    again = _QS["seeded_random_walks"](spark, str(tmp_path)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_seeded_walks_steps_follow_edges(spark, sf_dir):
    # every consecutive (step, step+1) hop must be a real co-purchase edge
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        _edges,
    )

    walks = _QS["seeded_random_walks"](spark, sf_dir)
    e = _edges(spark, sf_dir)
    und = set()
    for r in e.collect():
        und.add((r.x, r.y))
        und.add((r.y, r.x))
    byw = {}
    for r in walks.collect():
        byw.setdefault((r.start_node, r.walk_id), {})[r.step] = r.node
    for path in byw.values():
        for s in range(4):
            assert (path[s], path[s + 1]) in und


def test_hits_toy_graph_hand_computed(spark):
    """hits_scores on a 2-hub / 2-authority toy graph reproduces the
    hand-run recurrence (h0=1 -> a1 -> h1 -> a2, sum-normalized with floor
    division after every step)."""
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        _HITS_SCALE as S,
    )
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        hits_scores,
    )

    pairs = spark.createDataFrame([(1, 10), (1, 20), (2, 10)], "c: long, s: long")
    h1n, a2n = hits_scores(pairs)

    a1n = {10: 2 * S // 3, 20: 1 * S // 3}
    h1 = {1: a1n[10] + a1n[20], 2: a1n[10]}
    h_tot = sum(h1.values())
    h1n_exp = {c: v * S // h_tot for c, v in h1.items()}
    a2 = {10: h1n_exp[1] + h1n_exp[2], 20: h1n_exp[1]}
    a_tot = sum(a2.values())
    a2n_exp = {s: v * S // a_tot for s, v in a2.items()}

    assert {r.c: r.score for r in h1n.collect()} == h1n_exp
    assert {r.s: r.score for r in a2n.collect()} == a2n_exp


def test_hits_roles_and_score_bounds(spark, sf_dir):
    """Query-level invariants at gate scale: <=20 rows per role, every
    score in (0, SCALE] — normalized frames sum to <= SCALE so no single
    node can exceed it — and the top authority outranks the role's median
    (the scores are not degenerate)."""
    from code_challenge___data_engineer___machinemax_spark.plans.graph_queries import (
        _HITS_SCALE as S,
    )

    rows = mod.queries()["hits_hub_authority"](spark, sf_dir).collect()
    for role in ("authority", "hub"):
        scores = sorted((r.score_e9 for r in rows if r.role == role), reverse=True)
        assert 0 < len(scores) <= 20
        assert all(0 < v <= S for v in scores)
        assert scores[0] >= scores[len(scores) // 2]
