"""Operator-level tests: as-of join (both implementations), approx distinct
error bound."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.operators.asof import (
    asof_join,
    asof_join_pandas,
)
from code_challenge___data_engineer___machinemax_spark import plans


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def asof_data(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(20), "p2"), (1, _ts(5), "p0"), (2, _ts(30), "p3"),
         (3, _ts(7), "p4")],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 100), (1, _ts(15), 101), (1, _ts(20), 102), (2, _ts(40), 103)],
        "user_id int, ts timestamp, rv int",
    )
    return left, right


EXPECT = {
    "p0": None,  # no right row at or before 00:05
    "p1": 100,  # 00:08 latest <= 00:10
    "p2": 102,  # inclusive: right at exactly 00:20 matches
    "p3": None,  # right row is after the left ts
    "p4": None,  # key with no right rows at all
}


def test_asof_join_window_impl(asof_data):
    left, right = asof_data
    got = {r.tag: r.rv for r in
           asof_join(left, right, "user_id", "ts", "ts", ["rv"]).collect()}
    assert got == EXPECT


def test_asof_join_pandas_impl_matches(asof_data):
    left, right = asof_data
    got = {r.tag: (r.rv, r.matched_ts) for r in
           asof_join_pandas(left, right, "user_id", "ts", "ts", ["rv"]).collect()}
    want = {r.tag: (r.rv, r.matched_ts) for r in
            asof_join(left, right, "user_id", "ts", "ts", ["rv"]).collect()}
    assert got == want


def test_asof_tie_on_right_ts_is_deterministic(spark):
    left = spark.createDataFrame([(1, _ts(10))], "user_id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 7), (1, _ts(5), 9)], "user_id int, ts timestamp, rv int"
    )
    rows = asof_join(left, right, "user_id", "ts", "ts", ["rv"], right_seq="rv").collect()
    assert rows[0].rv == 9  # max right_seq wins the tie


def test_approx_distinct_error_bound(spark, sf_dir):
    rows = plans.all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(2, 0.1 * r.exact_users)


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """approx_percentile must land within ~1% rank error of the exact
    interpolated percentile (accuracy=10000 -> eps=1e-4; we assert a loose
    1% value-rank bound via the exact empirical CDF)."""
    from code_challenge___data_engineer___machinemax_spark import plans

    qs = plans.all_queries()
    approx = {r.o_orderstatus: r.asDict() for r in qs["approx_order_percentiles"](spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    import pyspark.sql.functions as F

    vals = {
        row.o_orderstatus: sorted(v.o_totalprice for v in rows)
        for row, rows in (
            (r, o.filter(F.col("o_orderstatus") == r.o_orderstatus).collect())
            for r in o.select("o_orderstatus").distinct().collect()
        )
    }
    for status, cols in approx.items():
        xs = vals[status]
        n = len(xs)
        for q in (25, 50, 75, 90):
            a = cols[f"p{q}"]
            # rank of the approx answer in the exact sorted values
            import bisect

            rank = bisect.bisect_left(xs, a) / n
            assert abs(rank - q / 100) <= 0.02, (status, q, rank)


def test_pit_join_attributes_to_regime_at_ship_time(spark, tmp_path):
    """The PIT property pinned: a line SHIPPED during regime 2 is
    attributed to regime 2 even though its order was placed in regime 1;
    a line shipped before any history maps to 'none'."""
    import datetime

    import __spark_entry__ as mod

    d = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    orders = [
        # custkey 1: priority A from 2024-01-01, B from 2024-03-01
        (100, 1, "O", 10.0, d("2024-01-01"), "A"),
        (101, 1, "O", 10.0, d("2024-03-01"), "B"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    lines = [
        (100, 1, 100.0, d("2024-04-01")),   # ordered under A, SHIPPED under B
        (100, 2, 50.0, d("2024-01-15")),    # shipped under A
        (100, 3, 25.0, d("2023-12-01")),    # shipped before any history
    ]
    spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber long, l_extendedprice double, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = {r.priority_at_ship: r for r in
            mod.queries()["pit_priority_revenue"](spark, str(tmp_path)).collect()}
    assert rows["B"].n_lines == 1 and rows["B"].revenue == 100.0
    assert rows["A"].n_lines == 1 and rows["A"].revenue == 50.0
    assert rows["none"].n_lines == 1 and rows["none"].revenue == 25.0


def test_kmv_theta_sketch_invariants(spark, sf_dir):
    """theta (max union-sample hash) never exceeds either per-set theta,
    k_union == k when both sets are >= k, and n_common <= k_union."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    rows = get("kmv_theta_set_ops").fn(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5 types, 2)
    for r in rows:
        assert 0 < r.n_common <= r.k_union <= 64
        assert r.theta_hash > 0


def test_phrase_search_adjacency_and_order(spark, sf_dir):
    """Phrase match requires adjacency AND order: every phrase hit must
    also be an AND-token hit, reversed phrases match different documents,
    and a nonsense phrase matches nothing."""
    from pyspark.sql import functions as F

    from code_challenge___data_engineer___machinemax_spark.functions.text import tokenize
    from code_challenge___data_engineer___machinemax_spark.operators.search import (
        phrase_search,
    )
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    hits = phrase_search(d, "doc_id", "merge vector").collect()
    assert len(hits) > 0
    assert all(r.n_occurrences >= 1 for r in hits)

    both_tokens = {
        r.doc_id
        for r in d.filter(
            F.array_contains(tokenize("text"), "merge")
            & F.array_contains(tokenize("text"), "vector")
        ).collect()
    }
    assert {r.doc_id for r in hits} <= both_tokens
    assert len(both_tokens) > len(hits)  # adjacency is strictly stronger

    assert phrase_search(d, "doc_id", "qqq zzz").count() == 0


def test_skyline_orders_is_pareto_frontier(spark, sf_dir):
    """No skyline row may be dominated by ANY order (checked against the
    full table driver-side), and every non-skyline order must be dominated
    by some skyline row (frontier completeness)."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    sky = [
        (r.o_totalprice, r.o_orderdate)
        for r in get("skyline_orders").fn(spark, sf_dir).collect()
    ]
    assert 0 < len(sky) < 100
    allr = [
        (r.o_totalprice, r.o_orderdate)
        for r in load_table(spark, sf_dir, "orders").collect()
    ]

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and (a[0] > b[0] or a[1] > b[1])

    for s in sky:
        assert not any(dominates(a, s) for a in allr)
    skyset = set(sky)
    for a in allr:
        if a not in skyset:
            assert any(dominates(s, a) for s in sky)


def test_cusum_changepoint_finds_planted_step(spark, tmp_path):
    """A series with a level shift must put the changepoint at the last
    hour of the old regime with the closed-form CUSUM value: 5 hours of 1
    event then 5 hours of 5 events -> mean 3, scaled cusum at t=5 is
    |cum*10 - 5*30| = 100."""
    import datetime

    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    rows = []
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    for h in range(10):
        n = 1 if h < 5 else 5
        for i in range(n):
            rows.append(("click", base + datetime.timedelta(hours=h, minutes=i)))
    spark.createDataFrame(rows, "event_type string, ts timestamp").write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = get("cusum_changepoint").fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_hours == 10 and r.total_events == 30
    assert r.changepoint_hour == base + datetime.timedelta(hours=4)
    assert r.max_abs_cusum == 100


def test_hybrid_rrf_fusion_invariants(spark, sf_dir):
    """RRF output must be internally consistent: every score equals the
    contribution formula applied to the surfaced ranks, ranks stay within
    the top-50 candidate depth, at least one arm is present per row, and
    ordering is (score desc, doc_id)."""
    from code_challenge___data_engineer___machinemax_spark.plans.registry import get

    rows = get("hybrid_search_rrf").fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10

    def contrib(rank):
        return 0 if rank is None else 1_000_000 // (60 + rank)

    for r in rows:
        assert r.bm25_rank is not None or r.cos_rank is not None
        for rk in (r.bm25_rank, r.cos_rank):
            assert rk is None or 1 <= rk <= 50
        assert r.rrf_e6 == contrib(r.bm25_rank) + contrib(r.cos_rank)
    keys = [(-r.rrf_e6, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_event_transition_matrix_is_stochastic(spark, sf_dir):
    """Row-stochasticity under floor scaling: per from_type the prob_e6
    sum lands in (1e6 - n_types, 1e6], and total transitions equal
    (events - users), each user's chain contributing len-1 pairs."""
    from collections import defaultdict

    from code_challenge___data_engineer___machinemax_spark.plans.registry import get
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = get("event_transition_matrix").fn(spark, sf_dir).collect()
    by_from = defaultdict(lambda: [0, 0])
    for r in rows:
        by_from[r.from_type][0] += r.prob_e6
        by_from[r.from_type][1] += r.n_transitions
    n_types = len({r.to_type for r in rows})
    for psum, _ in by_from.values():
        assert 1_000_000 - n_types < psum <= 1_000_000

    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(v[1] for v in by_from.values()) == n_events - n_users


def test_theil_sen_hand_computed(spark, tmp_path):
    # monthly revenues 100c, 200c, 250c -> pairwise slopes 100/1, 150/2,
    # 50/1 -> sorted 50, 75, 100 -> lower median (rank 2) = 75 = 150/2
    import datetime as dt

    orders = [
        (1, dt.date(1995, 1, 15), 1.00),
        (2, dt.date(1995, 2, 15), 2.00),
        (3, dt.date(1995, 3, 15), 2.50),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["theil_sen_trend"](spark, str(tmp_path)).collect()[0]
    assert (r.n_points, r.n_pairs) == (3, 3)
    assert (r.med_dy_c, r.med_dx) == (150, 2)
    assert r.slope_e6_c_per_month == 75_000_000


def test_theil_sen_ignores_one_outlier_month(spark, tmp_path):
    # a perfect +100c/month trend with ONE wild outlier month: the median
    # pairwise slope stays 100c/month (OLS would be dragged far off)
    import datetime as dt

    orders = [
        (m, dt.date(1995, m, 15), float(m) if m != 4 else 90.0)
        for m in range(1, 8)
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["theil_sen_trend"](spark, str(tmp_path)).collect()[0]
    assert r.slope_e6_c_per_month == 100_000_000


def test_emd_ks_hand_computed(spark, tmp_path):
    # views at 100c and 200c (mass 1/2 each) vs one purchase at 300c:
    # W1 = 0.5*200 + 0.5*100 = 150c; KS = 1.0 (F_view=1, F_purchase=0
    # on [200, 300)). Cross-multiplied integers: den = 2*1,
    # emd_num = 1*100 + 2*100 = 300, ks_num = 2.
    events = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "view", 1.00, ""),
        (2, datetime(2024, 1, 1, 0, 1), 1, "view", 2.00, ""),
        (3, datetime(2024, 1, 1, 0, 2), 2, "purchase", 3.00, ""),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["distribution_emd_ks"](spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (2, 1)
    assert (r.emd_num, r.den) == (300, 2)
    assert r.emd_c_e3 == 150_000
    assert (r.ks_num, r.ks_e6) == (2, 1_000_000)


def test_emd_zero_for_identical_distributions(spark, tmp_path):
    # identical value multisets -> W1 = 0 and KS = 0
    events = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "view", 5.00, ""),
        (2, datetime(2024, 1, 1, 0, 1), 1, "view", 7.00, ""),
        (3, datetime(2024, 1, 1, 0, 2), 2, "purchase", 5.00, ""),
        (4, datetime(2024, 1, 1, 0, 3), 2, "purchase", 7.00, ""),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as mod

    r = mod.queries()["distribution_emd_ks"](spark, str(tmp_path)).collect()[0]
    assert (r.emd_num, r.ks_num) == (0, 0)
