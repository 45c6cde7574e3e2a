"""Product/behavioral analytics over the events stream: weekly cohort
retention and the ordered multi-step conversion funnel.

These are the two reports every event-log consumer builds first, and they
generalize the reference's aggregate reporting surface (index.py:144,212
count rollups; api.py:22-26 filtered retrieval) from one-shot counts to
cohorted time-offset and ordered-sequence semantics.

Both queries follow the repo's exact-arithmetic discipline: every count is
an int64, every rate is an integer DIV of scaled counts (floor == trunc on
non-negative inputs), so the DuckDB oracle compare is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query


@query(
    "cohort_retention_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS active_week
        FROM events
    ), sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week
    ), cells AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.active_week) // 7
                    AS INT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS active_users
        FROM firsts f JOIN activity a ON f.user_id = a.user_id
        GROUP BY 1, 2
    )
    SELECT c.cohort_week AS cohort_week, c.week_offset, c.active_users,
           s.cohort_size,
           CAST(c.active_users * 1000000 // s.cohort_size AS BIGINT)
               AS retention_e6
    FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users are cohorted by the ISO week
    of their first event; each (cohort, week-offset) cell counts the
    distinct users from that cohort active in that later week, with the
    retention share as an exact integer-DIV rate.

    Scale: two fact-sized passes, both keyed on user_id — the first-event
    aggregate and the distinct (user, week) activity reduction — then one
    user-dimension-sized equi-join on user_id (co-partitioned; AQE
    broadcasts the firsts side when the user dimension is small). The
    output grid is cohorts x offsets — weeks², never fact-sized. No
    windows, no per-row Python. Rates are active*1e6 DIV cohort_size on
    int64 counts: floor division of non-negative integers, identical in
    both engines."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    cells = (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("active_users"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            F.expr("active_users * 1000000 DIV cohort_size")
            .cast("bigint")
            .alias("retention_e6"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "funnel_conversion_ordered",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        WHERE e.event_type = 'view' GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s4 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), tot AS (
        SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n1,
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n2,
               CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n3,
               CAST((SELECT COUNT(*) FROM s4) AS BIGINT) AS n4
    ), steps AS (
        SELECT 1 AS step_idx, 'signup' AS step, n1 AS users, n1 AS prev_users,
               n1 AS first_users FROM tot
        UNION ALL
        SELECT 2, 'view', n2, n1, n1 FROM tot
        UNION ALL
        SELECT 3, 'click', n3, n2, n1 FROM tot
        UNION ALL
        SELECT 4, 'purchase', n4, n3, n1 FROM tot
    )
    SELECT CAST(step_idx AS INT) AS step_idx, step, users,
           CAST(CASE WHEN prev_users = 0 THEN 0
                     ELSE users * 1000000 // prev_users END AS BIGINT)
               AS conv_prev_e6,
           CAST(CASE WHEN first_users = 0 THEN 0
                     ELSE users * 1000000 // first_users END AS BIGINT)
               AS conv_first_e6
    FROM steps
    ORDER BY step_idx
    """,
)
def funnel_conversion_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> click -> purchase: a user
    reaches step k only with an event of that type STRICTLY AFTER their
    step-(k-1) timestamp — the order-sensitive semantics that a bare
    per-type count-distinct funnel gets wrong.

    Scale: each stage filters the fact table by one event type (pushed to
    the scan) and aggregates MIN(ts) per user after an equi-join on
    user_id against the previous stage's user-dimension frame — four
    user-keyed passes, every join co-partitioned on user_id, reached-user
    frames shrink monotonically (broadcast candidates under AQE). The
    final report is assembled from four scalar counts with stack() — one
    4-row output, rates as integer DIV of e6-scaled counts."""
    e = load_table(spark, sf_dir, "events")

    def first_after(step_type: str, prev: DataFrame) -> DataFrame:
        # each stage frame is user-dimension sized and consumed twice
        # (next stage + its scalar count) — pinned, the four stages scan
        # the fact table once each instead of cascading re-derivations
        # (10 scans un-pinned)
        return (
            e.filter(F.col("event_type") == step_type)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_prev"))
            .localCheckpoint()
        )

    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_prev"))
        .localCheckpoint()
    )
    s2 = first_after("view", s1)
    s3 = first_after("click", s2)
    s4 = first_after("purchase", s3)
    tot = (
        s1.agg(F.count("*").cast("bigint").alias("n1"))
        .crossJoin(s2.agg(F.count("*").cast("bigint").alias("n2")))
        .crossJoin(s3.agg(F.count("*").cast("bigint").alias("n3")))
        .crossJoin(s4.agg(F.count("*").cast("bigint").alias("n4")))
    )
    steps = tot.select(
        F.expr(
            "stack(4, 1, 'signup', n1, n1,"
            " 2, 'view', n2, n1,"
            " 3, 'click', n3, n2,"
            " 4, 'purchase', n4, n3)"
            " AS (step_idx, step, users, prev_users)"
        ),
        F.col("n1").alias("first_users"),
    )
    return (
        steps.select(
            F.col("step_idx").cast("int").alias("step_idx"),
            "step",
            "users",
            F.expr(
                "CASE WHEN prev_users = 0 THEN 0"
                " ELSE users * 1000000 DIV prev_users END"
            )
            .cast("bigint")
            .alias("conv_prev_e6"),
            F.expr(
                "CASE WHEN first_users = 0 THEN 0"
                " ELSE users * 1000000 DIV first_users END"
            )
            .cast("bigint")
            .alias("conv_first_e6"),
        )
        .orderBy("step_idx")
    )


@query(
    "frequent_event_sequences",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS t1,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    triples AS (SELECT * FROM seq WHERE t3 IS NOT NULL),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triples FROM triples),
    pat AS (
        SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS occurrences,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM triples GROUP BY t1, t2, t3
    )
    SELECT t1, t2, t3, occurrences, n_users,
           CAST(trunc(CAST(occurrences AS DOUBLE) * 125 / n_triples * 1e6)
                AS BIGINT) AS lift_e6
    FROM pat CROSS JOIN tot
    WHERE occurrences * 125 >= n_triples
    """,
)
def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining over the event stream: consecutive
    3-event type sequences per user (ordered by time with event_id
    tie-break), kept when they occur MORE often than the uniform
    expectation (lift >= 1 against the 5^3 pattern space) — the length-3,
    order-sensitive counterpart of markov_next_event_accuracy's lag-1
    transitions and frequent_triples' unordered baskets. Emits occurrence
    count, distinct-user support, and the trunc-scaled lift.

    Determinism/scale: the two LEAD windows are per-user (never global)
    and share one exchange; patterns reduce to the <=125-row type-cube, so
    the lift join is a one-row broadcast. The RELATIVE frequency floor
    (occurrences * |patterns| >= total) is the scale knob — the same
    minimum-support lesson as the co-purchase graph (SCALE.md round 4):
    an absolute floor densifies with volume, a relative one keeps the
    pattern set scale-invariant."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    tot = seq.agg(F.count("*").cast("bigint").alias("n_triples"))
    pat = seq.groupBy("t1", "t2", "t3").agg(
        F.count("*").cast("bigint").alias("occurrences"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    return (
        pat.crossJoin(F.broadcast(tot))
        .filter(F.col("occurrences") * 125 >= F.col("n_triples"))
        .select(
            "t1",
            "t2",
            "t3",
            "occurrences",
            "n_users",
            (
                F.col("occurrences").cast("double")
                * 125
                / F.col("n_triples")
                * 1e6
            )
            .cast("bigint")
            .alias("lift_e6"),
        )
    )


@query(
    "multi_touch_attribution",
    oracle="""
    WITH purchases AS (
        SELECT event_id AS pid, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT event_id AS tid, user_id, event_type AS channel, ts
        FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    attributed AS (
        SELECT p.pid, t.tid, t.channel, t.ts,
               COUNT(*) OVER (PARTITION BY p.pid) AS k,
               ROW_NUMBER() OVER (PARTITION BY p.pid
                                  ORDER BY t.ts, t.tid) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY p.pid
                                  ORDER BY t.ts DESC, t.tid DESC) AS rn_last
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.ts < p.pts
         AND t.ts >= p.pts - INTERVAL 7 DAY
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT pid) AS BIGINT) AS purchases_touched,
           CAST(SUM(1000000 // k) AS BIGINT) AS linear_credit_e6,
           CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch,
           CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch
    FROM attributed
    GROUP BY channel
    """,
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase distributes credit
    across the user's view/click/signup touchpoints in the preceding 7
    days, reported per channel under three standard models at once —
    linear (1/k per touch, exact integer 1e6 DIV k so per-purchase credit
    sums to <= 1e6 with the DIV remainder dropped identically in both
    engines), first-touch, and last-touch. The batch twin of
    streamed_purchase_attribution's stream-stream join: same
    interval-bounded user-keyed pairing, richer credit accounting.

    Scale: the purchase-touch pairing is an equi-join on user_id with the
    time interval as a residual filter — fan-out is bounded by per-user
    activity in the 7-day window, never cross-user; the credit windows are
    keyed per purchase (frames = that purchase's touches); the rollup
    collapses to the channel domain. At 100 TB the same join wants the
    events table bucketed by user_id (DEPLOY L1), which removes the
    shuffle entirely."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    t = e.filter(F.col("event_type").isin("view", "click", "signup")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        "ts",
    )
    joined = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    )
    wk = W.partitionBy("pid")
    wf = W.partitionBy("pid").orderBy("ts", "tid")
    wl = W.partitionBy("pid").orderBy(F.desc("ts"), F.desc("tid"))
    attributed = joined.select(
        "pid",
        "tid",
        "channel",
        F.count("*").over(wk).alias("k"),
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return attributed.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_touches"),
        F.countDistinct("pid").cast("bigint").alias("purchases_touched"),
        F.sum(F.expr("1000000 div k")).cast("bigint").alias("linear_credit_e6"),
        F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("first_touch"),
        F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("last_touch"),
    )


@query(
    "shapley_channel_attribution",
    oracle="""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS pts FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touched AS (
        SELECT DISTINCT c.user_id,
               CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                                 WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS bit
        FROM conv c JOIN events e
          ON e.user_id = c.user_id AND e.ts < c.pts
         AND e.event_type IN ('click', 'error', 'signup', 'view')
    ),
    umask AS (
        SELECT c.user_id, COALESCE(SUM(t.bit), 0) AS mask
        FROM conv c LEFT JOIN touched t ON t.user_id = c.user_id
        GROUP BY c.user_id
    ),
    mcnt AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM umask GROUP BY mask),
    subsets AS (SELECT unnest(range(16)) AS s),
    v AS (
        SELECT s, CAST(COALESCE(SUM(m.cnt), 0) AS BIGINT) AS val
        FROM subsets LEFT JOIN mcnt m ON (m.mask & subsets.s) = m.mask
        GROUP BY s
    ),
    ch AS (
        SELECT * FROM (VALUES ('click', 1), ('error', 2),
                              ('signup', 4), ('view', 8)) AS t(channel, bit)
    )
    SELECT ch.channel,
           CAST(SUM(
               CASE bit_count(CAST(vw.s AS BIGINT))
                    WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
               * (vwith.val - vw.val)) AS BIGINT) AS phi_x24,
           CAST(MAX(vwith.val) AS BIGINT) AS v_with_all_ge
    FROM ch
    JOIN v vw ON (vw.s & ch.bit) = 0
    JOIN v vwith ON vwith.s = vw.s + ch.bit
    GROUP BY ch.channel
    """,
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value multi-touch attribution (the game-theoretic credit
    model next to multi_touch_attribution's linear/first/last heuristics):
    players are the four pre-purchase channels, the coalition value v(S)
    is the number of converters (users with a purchase) whose before-
    first-purchase touch set is contained in S, and each channel's credit
    is its exact Shapley value scaled by 4! = 24 so every weight
    |S|!(4-|S|-1)! is an integer (6,2,2,6) — no factorial division, exact
    BIGINT end to end. By efficiency, sum(phi_x24) = 24*(v(full) -
    v(empty)): credit for all conversions that had any touchpoint,
    split by marginal contribution over all channel orderings.

    Scale shape: everything heavy is user-keyed — one purchase agg and one
    user equi-join with the time filter residual (bucketable by user_id,
    DEPLOY L1); the game itself then lives on the 16-row mask domain: a
    broadcast containment join against the <=16-row mask-count frame and a
    16x4 subset-pair join. The 2^k lattice is driver-visible tiny for any
    realistic channel count (k<=20), while v(S) stays a distributed
    aggregate — the standard trick that makes exact Shapley tractable for
    attribution (Zhao et al. 2018)."""
    e = load_table(spark, sf_dir, "events")
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    touched = (
        conv.join(
            e.filter(
                F.col("event_type").isin("click", "error", "signup", "view")
            ).select(F.col("user_id").alias("t_user"), "event_type", "ts"),
            (F.col("t_user") == F.col("user_id")) & (F.col("ts") < F.col("pts")),
        )
        .select("user_id", bit.alias("bit"))
        .distinct()
    )
    umask = (
        conv.join(touched, "user_id", "left")
        .groupBy("user_id")
        .agg(F.coalesce(F.sum("bit"), F.lit(0)).alias("mask"))
    )
    mcnt = umask.groupBy("mask").agg(F.count("*").cast("bigint").alias("cnt"))
    subsets = spark.range(16).select(F.col("id").alias("s"))
    v = (
        subsets.join(
            F.broadcast(mcnt),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("val"))
    )
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)], "channel string, bit int"
    )
    vw = v.select(F.col("s").alias("s0"), F.col("val").alias("v0"))
    vwith = v.select(F.col("s").alias("s1"), F.col("val").alias("v1"))
    weight = (
        F.when(F.bit_count("s0") == 0, 6)
        .when(F.bit_count("s0") == 1, 2)
        .when(F.bit_count("s0") == 2, 2)
        .otherwise(6)
    )
    return (
        ch.join(F.broadcast(vw), F.col("s0").bitwiseAND(F.col("bit")) == 0)
        .join(F.broadcast(vwith), F.col("s1") == F.col("s0") + F.col("bit"))
        .groupBy("channel")
        .agg(
            F.sum(weight * (F.col("v1") - F.col("v0"))).cast("bigint").alias("phi_x24"),
            F.max("v1").cast("bigint").alias("v_with_all_ge"),
        )
    )
