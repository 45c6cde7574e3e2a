"""Telemetry / time-series shapes: regular-grid resampling with forward
fill, interval-overlap joins, and robust (median/MAD) outlier detection.

These are the operations a machine-telemetry analytics surface runs on an
event stream once it lands: fill sensor gaps onto an hourly grid, join
activity intervals against reference windows, and flag anomalous readings
without assuming normality. Every oracle is exact: counts and scaled-int
value sums for the grid, and the doubled-median trick (2*quantile_cont of
an int column is integer-valued, hence bit-comparable across engines) for
the robust statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query


@query(
    "events_gap_fill",
    oracle="""
    WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(trunc(value * 1000000) AS BIGINT)) AS BIGINT) AS v_e6
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1 FROM agg GROUP BY 1
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    )
    SELECT g.event_type, g.hour,
           COALESCE(a.n, 0) AS n,
           last_value(a.v_e6 IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_e6_filled,
           CAST(CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
    FROM grid g LEFT JOIN agg a USING (event_type, hour)
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream onto a dense per-type hourly grid and
    forward-fill the exact scaled-int value sum across gap hours — the
    standard telemetry densification (a silent sensor still has a row per
    hour, carrying its last observed reading).

    Scale: the expensive input is reduced FIRST (groupBy event_type, hour —
    partial map-side combine; output is bounded by types x hours, not by
    raw events), the grid is generated from a types-sized bounds frame via
    sequence+explode (no driver loop, no cross join), and the left join +
    forward-fill window both key on (event_type, hour) / event_type — one
    co-partitioned shuffle, window partitions bounded by the calendar, not
    the data volume. v_e6 is the trunc(value*1e6) int idiom shared with the
    streaming rollups, so the fill is bit-exact cross-engine."""
    e = load_table(spark, sf_dir, "events")
    agg = (
        e.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.expr("CAST(value * 1e6 AS BIGINT)").alias("v_i"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"), F.sum("v_i").alias("v_e6"))
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    joined = grid.join(agg, ["event_type", "hour"], "left")
    return joined.select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"),
        F.last("v_e6", ignorenulls=True).over(w).alias("v_e6_filled"),
        F.when(F.col("n").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
    )


@query(
    "session_peak_overlap",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sno
        FROM gaps
    ), sessions AS (
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end
        FROM sess GROUP BY user_id, sno
    ), hourly AS (
        SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
        FROM events GROUP BY 1
    ), peak AS (
        SELECT hour FROM hourly ORDER BY n DESC, hour LIMIT 24
    ), spanned AS (
        SELECT s.user_id, s.session_start, s.session_end,
               unnest(generate_series(date_trunc('hour', s.session_start),
                                      date_trunc('hour', s.session_end),
                                      INTERVAL 1 HOUR)) AS hour
        FROM sessions s
    )
    SELECT sp.user_id, sp.session_start,
           CAST(COUNT(*) AS BIGINT) AS n_peak_hours
    FROM spanned sp JOIN peak p USING (hour)
    WHERE sp.hour < sp.session_end
    GROUP BY sp.user_id, sp.session_start
    """,
)
def session_peak_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per user session (30-minute-gap islands,
    session_end = last event + gap, matching the streaming session_window
    semantics), count how many of the corpus's 24 busiest hours the session
    interval [start, end) overlaps. Sessions with zero peak overlap drop
    out (inner join semantics).

    Scale: the classic range-join-to-equi-join rewrite — instead of a
    theta join on interval overlap (which Spark would plan as a broadcast
    nested loop), each session explodes into the hour buckets it spans
    (bounded by session length / 1h, small by construction of the 30-min
    gap rule) and overlap becomes an equi-join on the hour bucket. The
    peak-hour side is 24 rows — broadcast. The sessionization window
    partitions by user_id (bounded per-user), and the final regroup keys
    on (user_id, session_start) — already co-partitioned with the
    session window's shuffle."""
    e = load_table(spark, sf_dir, "events")
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(uw) > 1800)
        | F.lag("ts").over(uw).isNull()
    ).cast("int")
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = (
        e.select("user_id", "ts", "event_id")
        .withColumn("new_session", gap)
        .withColumn("sno", F.sum("new_session").over(run))
        .groupBy("user_id", "sno")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("interval 30 minutes")).alias("session_end"),
        )
    )
    peak = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "hour")
        .limit(24)
        .select("hour")
    )
    spanned = sessions.select(
        "user_id",
        "session_start",
        "session_end",
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', session_start),"
                " date_trunc('hour', session_end), interval 1 hour)"
            )
        ).alias("hour"),
    ).filter(F.col("hour") < F.col("session_end"))
    return (
        spanned.join(F.broadcast(peak), "hour")
        .groupBy("user_id", "session_start")
        .agg(F.count("*").cast("bigint").alias("n_peak_hours"))
    )


@query(
    "value_mad_outliers",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(trunc(value * 100) AS BIGINT) AS v_c
        FROM events WHERE value IS NOT NULL
    ), med AS (
        SELECT event_type,
               CAST(2 * quantile_cont(v_c, 0.5) AS BIGINT) AS med2
        FROM v GROUP BY 1
    ), dev AS (
        SELECT v.event_type, v.v_c, ABS(2 * v.v_c - m.med2) AS d2, m.med2
        FROM v JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type,
               CAST(2 * quantile_cont(d2, 0.5) AS BIGINT) AS mad4
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           ANY_VALUE(d.med2) AS med2,
           ANY_VALUE(m.mad4) AS mad4,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN 2 * d.d2 > 3 * m.mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: median / median-absolute-deviation
    on the cent-quantized value, flagging readings with |v - median| >
    3*MAD — the distribution-free anomaly gate telemetry uses instead of
    z-scores (one stuck sensor shifts a mean, not a median).

    Exactness: medians are interpolated, so they can land on .5 — both
    engines therefore carry DOUBLED statistics (med2 = 2*median of ints,
    mad4 = 4*MAD), which are integer-valued by construction; the outlier
    test 2*|2v - med2| > 3*mad4 is the 3-MAD rule in pure int64 arithmetic.
    Spark's exact `percentile` and DuckDB's `quantile_cont` interpolate
    identically on the sorted ints.

    Scale: two aggregations over event_type (tiny domain) with the
    per-type medians joined back via broadcast; exact percentile does sort
    per group — at real scale the same shape swaps `percentile` for
    `approx_percentile` with no plan change, which the docring notes
    rather than silently doing (the oracle pins the exact variant)."""
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("value").isNotNull()).select(
        "event_type", F.expr("CAST(value * 100 AS BIGINT)").alias("v_c")
    )
    med = v.groupBy("event_type").agg(
        (2 * F.percentile(F.col("v_c"), F.lit(0.5))).cast("bigint").alias("med2")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med2",
        F.abs(2 * F.col("v_c") - F.col("med2")).alias("d2"),
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.percentile(F.col("d2"), F.lit(0.5))).cast("bigint").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med2").alias("med2"),
            F.any_value("mad4").alias("mad4"),
            F.count("*").cast("bigint").alias("n"),
            F.sum((2 * F.col("d2") > 3 * F.col("mad4")).cast("int"))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "cusum_changepoint",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, COUNT(*) AS n_hours,
               CAST(SUM(c) AS BIGINT) AS total_events
        FROM hourly GROUP BY 1
    ), cum AS (
        SELECT event_type, h,
               SUM(c) OVER (PARTITION BY event_type ORDER BY h) AS cum_c,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS t
        FROM hourly
    ), dev AS (
        SELECT c.event_type, c.h,
               c.cum_c * tot.n_hours - c.t * tot.total_events AS cusum
        FROM cum c JOIN tot USING (event_type)
    ), best AS (
        SELECT event_type, h, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ABS(cusum) DESC, h) AS rn
        FROM dev
    )
    SELECT b.event_type, tot.n_hours, tot.total_events,
           b.h AS changepoint_hour,
           CAST(ABS(b.cusum) AS BIGINT) AS max_abs_cusum
    FROM best b JOIN tot USING (event_type)
    WHERE b.rn = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the hourly event-count series of
    each event type: the hour t* maximizing |sum_{i<=t}(c_i - mean)| is
    the classic single-changepoint estimator (Page 1954; the offline
    max-|CUSUM| form). Kept exact-integer by scaling the deviation sum by
    n_hours: cum(c)*n_hours - t*total == n_hours * sum(c_i - mean), so no
    division and both engines agree bit-for-bit.

    Scale: the corpus-sized work is one partial-agg shuffle to hourly
    counts; everything after runs per event_type over calendar-bounded
    frames (hours in range — ~3.6k rows/type regardless of event volume,
    the audited-tiny-frame convention). The argmax is a row_number over
    the same per-type frame, never a global window."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("c"))
    tot = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"), F.sum("c").alias("total_events")
    )
    w = W.partitionBy("event_type").orderBy("h")
    cum = hourly.select(
        "event_type",
        "h",
        F.sum("c").over(w).alias("cum_c"),
        F.row_number().over(w).alias("t"),
    )
    dev = cum.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "h",
        "n_hours",
        "total_events",
        (F.col("cum_c") * F.col("n_hours") - F.col("t") * F.col("total_events")).alias(
            "cusum"
        ),
    )
    best_w = W.partitionBy("event_type").orderBy(F.abs(F.col("cusum")).desc(), F.asc("h"))
    return (
        dev.withColumn("rn", F.row_number().over(best_w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_hours",
            "total_events",
            F.col("h").alias("changepoint_hour"),
            F.abs(F.col("cusum")).cast("bigint").alias("max_abs_cusum"),
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ), cnt AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (
        SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from
        FROM cnt GROUP BY 1
    )
    SELECT c.from_type, c.to_type, c.n_transitions,
           CAST(FLOOR(c.n_transitions * 1000000.0 / t.n_from) AS BIGINT)
               AS prob_e6
    FROM cnt c JOIN tot t USING (from_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event stream:
    for every (from_type, to_type) pair, the count of consecutive
    occurrences and the transition probability floor-scaled to 1e-6 —
    the behavioral model behind next-action prediction and anomalous-
    session scoring (the event-level sibling of the token-level
    `bigram_logprob_scores` LM).

    Scale: the sequence window partitions by user_id (the same
    deterministic (ts, event_id) ordering `event_sessions` pins) — frames
    are per-user streams, never global; the output is |types|² rows, so
    everything after the one partial-agg shuffle is metadata-sized. The
    1e6-scaled floor division (n*1e6 exact in double far beyond these
    counts) keeps the probabilities bit-comparable cross-engine."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cnt = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n_transitions"))
    tot = cnt.groupBy("from_type").agg(
        F.sum("n_transitions").cast("bigint").alias("n_from")
    )
    return cnt.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.floor(F.col("n_transitions") * 1000000.0 / F.col("n_from"))
        .cast("bigint")
        .alias("prob_e6"),
    )


@query(
    "seasonal_naive_backtest",
    oracle="""
    WITH train AS (
        SELECT CAST(ts AS DATE) AS d, CAST(extract(hour FROM ts) AS INT) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
        GROUP BY 1, 2
    ), train_grid AS (
        SELECT CAST(gd.d AS DATE) AS d, CAST(gh.h AS INT) AS h
        FROM (SELECT unnest(generate_series(DATE '2024-01-01',
                                            DATE '2024-01-24',
                                            INTERVAL 1 DAY)) AS d) gd,
             (SELECT unnest(range(24)) AS h) gh
    ), profile AS (
        SELECT CAST(datediff('day', DATE '2024-01-01', g.d) % 7 AS INT) AS dow,
               g.h,
               CAST(SUM(COALESCE(t.n, 0)) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS slots
        FROM train_grid g LEFT JOIN train t ON g.d = t.d AND g.h = t.h
        GROUP BY 1, 2
    ), test AS (
        SELECT CAST(ts AS DATE) AS d, CAST(extract(hour FROM ts) AS INT) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
          AND ts < TIMESTAMP '2024-01-31 00:00:00'
        GROUP BY 1, 2
    ), test_grid AS (
        SELECT CAST(gd.d AS DATE) AS d, CAST(gh.h AS INT) AS h
        FROM (SELECT unnest(generate_series(DATE '2024-01-25',
                                            DATE '2024-01-30',
                                            INTERVAL 1 DAY)) AS d) gd,
             (SELECT unnest(range(24)) AS h) gh
    )
    SELECT g.d, g.h AS hour,
           CAST(datediff('day', DATE '2024-01-01', g.d) % 7 AS INT) AS dow,
           CAST(p.total // p.slots AS BIGINT) AS pred_n,
           CAST(COALESCE(t.n, 0) AS BIGINT) AS actual_n,
           CAST(abs(p.total // p.slots - COALESCE(t.n, 0)) AS BIGINT) AS abs_err
    FROM test_grid g
    JOIN profile p
      ON p.dow = CAST(datediff('day', DATE '2024-01-01', g.d) % 7 AS INT)
     AND p.h = g.h
    LEFT JOIN test t ON g.d = t.d AND g.h = t.h
    ORDER BY g.d, g.h
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest on the event stream: learn the
    weekly profile (mean hourly event count per (weekday, hour) slot) from
    the first 24 days of the window, forecast every hour of the 6-day
    holdout from the profile, and score per-slot absolute error — the
    baseline every capacity-planning / anomaly model must beat.

    Both the train and test calendars are generated DENSE (sequence +
    explode of literal date ranges x 24 hours), so silent hours count as
    zeros on both sides — a profile learned only from observed rows would
    overestimate. The profile mean is an integer floor division of exact
    counts by the calendar-derived slot count (no floats anywhere), and
    the weekday index is days-since-Monday-Jan-1 mod 7, identical
    arithmetic in both engines (engine-native dayofweek() numbering
    disagrees). Scale: events reduce FIRST to (date, hour) counts — the
    only fact-sized pass, map-side combinable; the grids, profile (168
    rows), and the backtest join are calendar-sized. The same plan
    re-pointed at a rolling date literal is the nightly forecast job."""
    e = load_table(spark, sf_dir, "events")
    train = (
        e.filter(F.col("ts") < F.lit("2024-01-25 00:00:00").cast("timestamp"))
        .groupBy(
            F.col("ts").cast("date").alias("d"),
            F.hour("ts").cast("int").alias("h"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    hours = spark.range(24).select(F.col("id").cast("int").alias("h"))
    train_grid = (
        spark.sql(
            "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-24')) AS d"
        ).crossJoin(hours)
    )
    profile = (
        train_grid.join(train, ["d", "h"], "left")
        .groupBy(
            F.expr(
                "CAST(datediff(d, DATE '2024-01-01') % 7 AS INT)"
            ).alias("dow"),
            "h",
        )
        .agg(
            F.sum(F.coalesce("n", F.lit(0))).cast("bigint").alias("total"),
            F.count("*").cast("bigint").alias("slots"),
        )
    )
    test = (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-31 00:00:00").cast("timestamp"))
        )
        .groupBy(
            F.col("ts").cast("date").alias("d"),
            F.hour("ts").cast("int").alias("h"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    test_grid = (
        spark.sql(
            "SELECT explode(sequence(DATE '2024-01-25', DATE '2024-01-30')) AS d"
        )
        .crossJoin(hours)
        .withColumn(
            "dow", F.expr("CAST(datediff(d, DATE '2024-01-01') % 7 AS INT)")
        )
    )
    return (
        test_grid.join(F.broadcast(profile), ["dow", "h"])
        .join(test, ["d", "h"], "left")
        .select(
            "d",
            F.col("h").alias("hour"),
            "dow",
            F.expr("total DIV slots").alias("pred_n"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("actual_n"),
            F.expr(
                "CAST(abs(total DIV slots - COALESCE(n, 0)) AS BIGINT)"
            ).alias("abs_err"),
        )
        .orderBy("d", "hour")
    )


# Shared by open_orders_daily (concurrency) and order_interval_coverage
# (union): an order spans its order date to its last shipment, clamped so
# close >= open, with orders lacking lineitems spanning a single day.
# One definition, two interval views (review finding: the close-date
# semantics must not be able to drift between them).
_ORDER_SPAN_SQL = """
    comp AS (
        SELECT l_orderkey, CAST(MAX(CAST(l_shipdate AS DATE)) AS DATE) AS close_d
        FROM lineitem GROUP BY 1
    ), span AS (
        SELECT o.o_custkey AS custkey, o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS open_d,
               GREATEST(COALESCE(c.close_d, CAST(o.o_orderdate AS DATE)),
                        CAST(o.o_orderdate AS DATE)) AS close_d
        FROM orders o LEFT JOIN comp c ON o.o_orderkey = c.l_orderkey
    )"""


def _order_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, o_orderkey, open_d, close_d) — the Spark twin of
    _ORDER_SPAN_SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    comp = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("close_d")
    )
    return o.join(comp, o.o_orderkey == comp.l_orderkey, "left").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("open_d"),
        F.greatest(
            F.coalesce("close_d", F.col("o_orderdate").cast("date")),
            F.col("o_orderdate").cast("date"),
        ).alias("close_d"),
    )


@query(
    "open_orders_daily",
    oracle=f"""
    WITH {_ORDER_SPAN_SQL}, deltas AS (
        SELECT open_d AS d, CAST(1 AS BIGINT) AS delta FROM span
        UNION ALL
        SELECT CAST(close_d + 1 AS DATE), CAST(-1 AS BIGINT) FROM span
    ), daily AS (
        SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY d
    )
    SELECT d, net,
           CAST(SUM(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_orders
    FROM daily ORDER BY d
    """,
)
def open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order concurrency curve: an order is open from its order
    date until its last lineitem ships; the curve is how many are open on
    each calendar day — the classic interval-stabbing / backlog metric,
    computed as boundary deltas (+1 at open, -1 the day after close) and
    one running sum, NEVER by expanding each order into its covered days.

    Scale: the fact tables reduce immediately — lineitem to a per-order
    max-shipdate (map-side combinable), orders join it co-partitioned on
    the order key, and the +/-1 deltas collapse by DAY before any window
    runs. The running sum's frame is calendar-sized (one row per day), so
    the single-partition window is bounded by the date span, not the data
    volume — the same benign post-aggregation pattern as
    monthly_revenue_running; at a multi-decade span, range-partition by
    year and prefix-sum the per-partition totals. All counts are exact
    int64."""
    span = _order_spans(spark, sf_dir)
    deltas = span.select(
        F.col("open_d").alias("d"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        span.select(
            F.date_add("close_d", 1).alias("d"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("net"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "d", "net", F.sum("net").over(w).cast("bigint").alias("open_orders")
    ).orderBy("d")


@query(
    "markov_next_event_accuracy",
    oracle="""
    WITH train_pairs AS (
        SELECT prev, event_type AS next FROM (
            SELECT event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
        ) WHERE prev IS NOT NULL
    ), model AS (
        SELECT prev, next AS pred FROM (
            SELECT prev, next, ROW_NUMBER() OVER (
                PARTITION BY prev ORDER BY COUNT(*) DESC, next) AS rk
            FROM train_pairs GROUP BY prev, next
        ) WHERE rk = 1
    ), test_pairs AS (
        SELECT prev, event_type AS next FROM (
            SELECT event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        ) WHERE prev IS NOT NULL
    )
    SELECT t.prev, m.pred,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN t.next = m.pred THEN 1 ELSE 0 END) AS BIGINT)
               AS hits,
           CAST(trunc(CAST(SUM(CASE WHEN t.next = m.pred THEN 1 ELSE 0 END)
                           AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT) AS acc_e6
    FROM test_pairs t JOIN model m ON t.prev = m.prev
    GROUP BY t.prev, m.pred ORDER BY t.prev
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event prediction backtest: learn argmax
    P(next | prev) from consecutive same-user event pairs in the first 24
    days, then score top-1 accuracy per antecedent type on the holdout —
    the eval loop on top of event_transition_matrix's descriptive view.

    Scale: both pair extractions are ONE lag window per user partition
    (the sessionization shuffle this suite already pays everywhere);
    transition counts collapse to a types^2 frame, so model fitting and
    the argmax window are constant-size; the eval joins the holdout pairs
    against the broadcast types-sized model. Pairs straddling the split
    boundary are excluded on both sides by construction (the lag runs
    inside each filtered window), so train and test never share an
    observation. Ties in the argmax break lexicographically; accuracy is
    one shared-expression double over exact counts, trunc-scaled."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")

    def pairs(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col("event_type").alias("next"),
                F.lag("event_type").over(w).alias("prev"),
            )
            .filter(F.col("prev").isNotNull())
        )

    split = F.lit("2024-01-25 00:00:00").cast("timestamp")
    train_pairs = pairs(e.filter(F.col("ts") < split))
    test_pairs = pairs(e.filter(F.col("ts") >= split))
    wm = W.partitionBy("prev").orderBy(F.desc("cnt"), F.asc("next"))
    model = (
        train_pairs.groupBy("prev", "next")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("prev", F.col("next").alias("pred"))
    )
    return (
        test_pairs.join(F.broadcast(model), "prev")
        .groupBy("prev", "pred")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("next") == F.col("pred"), 1).otherwise(0))
            .cast("bigint")
            .alias("hits"),
        )
        .withColumn(
            "acc_e6",
            F.expr(
                "CAST(CAST(hits AS DOUBLE) / CAST(n_pairs AS DOUBLE) * 1e6"
                " AS BIGINT)"
            ),
        )
        .orderBy("prev")
    )


@query(
    "order_interval_coverage",
    oracle=f"""
    WITH {_ORDER_SPAN_SQL}, flagged AS (
        SELECT custkey, o_orderkey, open_d, close_d,
               CASE WHEN MAX(close_d) OVER (
                        PARTITION BY custkey ORDER BY open_d, close_d, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                 OR open_d > MAX(close_d) OVER (
                        PARTITION BY custkey ORDER BY open_d, close_d, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS is_new
        FROM span
    ), islands AS (
        SELECT custkey, open_d, close_d,
               SUM(is_new) OVER (
                   PARTITION BY custkey ORDER BY open_d, close_d, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    ), merged AS (
        SELECT custkey, island,
               MIN(open_d) AS start_d, MAX(close_d) AS end_d
        FROM islands GROUP BY custkey, island
    )
    SELECT custkey,
           CAST(COUNT(*) AS BIGINT) AS n_busy_periods,
           CAST(SUM(datediff('day', start_d, end_d) + 1) AS BIGINT)
               AS covered_days
    FROM merged GROUP BY custkey ORDER BY custkey
    """,
)
def order_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per customer: each order spans order date
    to last shipment; overlapping or touching spans merge, and the report
    is how many distinct busy periods each customer has and how many
    calendar days they cover — the interval-union complement of
    open_orders_daily's concurrency view (union length vs stabbing
    count).

    The merge is the classic running-max sweep: within each customer,
    order spans sorted by start open a NEW island exactly when their
    start exceeds the max end seen so far (the 1-PRECEDING frame keeps
    the current row out of its own comparison), then a running sum of
    the new-island flags numbers the islands — two window passes over
    the SAME customer partitioning, one exchange. Scale: per-customer
    frames are order-count bounded; the merged output is
    customer-dimension sized. Everything is integer date arithmetic."""
    span = _order_spans(spark, sf_dir)
    w_prev = (
        W.partitionBy("custkey")
        .orderBy("open_d", "close_d", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = span.select(
        "custkey",
        "o_orderkey",
        "open_d",
        "close_d",
        F.when(
            F.max("close_d").over(w_prev).isNull()
            | (F.col("open_d") > F.max("close_d").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    # the same (.., o_orderkey) total order as w_prev: ties in (open, close)
    # would otherwise let the engines disagree on which twin row carries
    # the is_new flag into which island (review finding)
    w_run = (
        W.partitionBy("custkey")
        .orderBy("open_d", "close_d", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(w_run))
    merged = islands.groupBy("custkey", "island").agg(
        F.min("open_d").alias("start_d"), F.max("close_d").alias("end_d")
    )
    return (
        merged.groupBy("custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_busy_periods"),
            F.sum(F.datediff("end_d", "start_d") + 1)
            .cast("bigint")
            .alias("covered_days"),
        )
        .orderBy("custkey")
    )


@query(
    "conversion_latency_quantiles",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS first_purchase
        FROM events GROUP BY user_id
    ), lat AS (
        SELECT user_id,
               epoch_us(first_purchase) - epoch_us(first_view) AS lat_us
        FROM firsts
        WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    ), ranked AS (
        SELECT lat_us, ROW_NUMBER() OVER (ORDER BY lat_us, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM lat
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN lat_us END)
                AS BIGINT) AS p50_us,
           CAST(MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN lat_us END)
                AS BIGINT) AS p90_us,
           CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN lat_us END)
                AS BIGINT) AS p99_us
    FROM ranked
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user whose first purchase
    follows their first view, the view->purchase latency, summarized as
    exact nearest-rank P50/P90/P99 in microseconds — the product-analytics
    companion to funnel_conversion (how MANY convert) and
    streamed_purchase_attribution (WHICH purchases attribute).

    Latencies are exact integer microsecond differences of the two
    per-user firsts (one conditional-MIN pass over events — no join, no
    window on the fact). The quantiles are nearest-rank over the
    converted-users frame (user-dimension sized): rank = the integer
    (p*n + 99) DIV 100, no float, the same idiom as
    winsorized_segment_stats — at this frame size the single ordered
    window is the benign post-aggregation pattern; a fact-sized
    percentile would use scalable_ntile instead. One output row."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lat = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        "user_id",
        (
            F.unix_micros("first_purchase") - F.unix_micros("first_view")
        ).alias("lat_us"),
    )
    w = W.orderBy("lat_us", "user_id")
    ranked = lat.select(
        "lat_us",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.max(
            F.when(F.expr("rn = (50 * n + 99) DIV 100"), F.col("lat_us"))
        ).cast("bigint").alias("p50_us"),
        F.max(
            F.when(F.expr("rn = (90 * n + 99) DIV 100"), F.col("lat_us"))
        ).cast("bigint").alias("p90_us"),
        F.max(
            F.when(F.expr("rn = (99 * n + 99) DIV 100"), F.col("lat_us"))
        ).cast("bigint").alias("p99_us"),
    )


@query(
    "clamped_stock_balance",
    oracle="""
    WITH moves AS (
        SELECT l_partkey AS part, CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS BIGINT)
                        ELSE -CAST(l_quantity AS BIGINT) END) AS BIGINT) AS x
        FROM lineitem WHERE l_partkey <= 100
        GROUP BY 1, 2
    ), pref AS (
        SELECT part, d, x,
               SUM(x) OVER (PARTITION BY part ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
        FROM moves
    ), runs AS (
        SELECT part, d, x, prefix,
               MIN(prefix) OVER (PARTITION BY part ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
        FROM pref
    )
    SELECT part, d, x,
           CAST(prefix - LEAST(run_min, 0) AS BIGINT) AS balance
    FROM runs ORDER BY part, d
    """,
)
def clamped_stock_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-clamped running stock balance per part: returns ('R') restock
    (+qty), other shipments draw down (-qty), and the balance can never
    go negative — the sequential recurrence b_t = max(0, b_{t-1} + x_t)
    every inventory/credit ledger needs, which LOOKS like it requires a
    recursive scan but collapses to the Lindley closed form
    b_t = prefix_t - min(0, min_{s<=t} prefix_s): a prefix sum and a
    running min, two stacked windows over the SAME partitioning.

    That closed form is the scale story: the naive formulation is a
    per-key sequential loop (applyInPandas state, or a recursion DuckDB
    caps at default depth), while this plan is two window passes sharing
    one exchange on the part key — pure codegen, no Python, no iteration,
    identical on both engines. Day-collapsed moves bound each frame by
    the calendar; the part <= 100 filter bounds the checked output (the
    plan is per-key independent, so the filter pushes to the scan)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 100)
    moves = (
        li.groupBy(
            F.col("l_partkey").alias("part"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.col("l_quantity").cast("bigint"),
                ).otherwise(-F.col("l_quantity").cast("bigint"))
            )
            .cast("bigint")
            .alias("x")
        )
    )
    w = (
        W.partitionBy("part")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pref = moves.select(
        "part",
        "d",
        "x",
        F.sum("x").over(w).alias("prefix"),
    ).withColumn("run_min", F.min("prefix").over(w))
    return pref.select(
        "part",
        "d",
        "x",
        (F.col("prefix") - F.least(F.col("run_min"), F.lit(0)))
        .cast("bigint")
        .alias("balance"),
    ).orderBy("part", "d")


# Lag-correlation assembly: Pearson over exact int64 moments, one shared
# IEEE tree; trunc toward zero on both engines (Spark CAST truncates,
# DuckDB gets an explicit trunc()). Degenerate variance -> 0.
_ACF_CASE = (
    "CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0 THEN 0"
    " ELSE {inner} END"
)
_ACF_INNER = (
    "CAST(n * sxy - sx * sy AS DOUBLE)"
    " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
    " * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1e6"
)
_ACF_E6 = _ACF_CASE.format(inner=f"CAST(trunc({_ACF_INNER}) AS BIGINT)")
_ACF_E6_SPARK = _ACF_CASE.format(inner=f"CAST({_ACF_INNER} AS BIGINT)")


@query(
    "daily_revenue_acf",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(trunc(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS rev
        FROM orders GROUP BY 1
    ), bounds AS (
        SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily
    ), grid AS (
        SELECT d0, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gd
        FROM bounds
    ), series AS (
        SELECT CAST(date_diff('day', g.d0, CAST(g.gd AS DATE)) AS BIGINT)
                   AS idx,
               COALESCE(dy.rev, 0) // 1000 AS kd
        FROM grid g LEFT JOIN daily dy ON CAST(g.gd AS DATE) = dy.d
    ), lags AS (
        SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag
    ), mom AS (
        SELECT l.lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.kd) AS BIGINT) AS sx,
               CAST(SUM(b.kd) AS BIGINT) AS sy,
               CAST(SUM(a.kd * a.kd) AS BIGINT) AS sxx,
               CAST(SUM(b.kd * b.kd) AS BIGINT) AS syy,
               CAST(SUM(a.kd * b.kd) AS BIGINT) AS sxy
        FROM lags l
        CROSS JOIN series a
        JOIN series b ON b.idx = a.idx + l.lag
        GROUP BY 1
    )
    SELECT CAST(lag AS INT) AS lag, n,
           CAST({_ACF_E6} AS BIGINT) AS acf_e6
    FROM mom ORDER BY lag
    """,
)
def daily_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile of daily order revenue at lags 1..7: the
    Pearson correlation between the zero-filled daily revenue series and
    its lag-shifted copy — the seasonality detector that tells a
    forecasting pipeline which seasonal-naive period to use (the
    companion diagnostic to `seasonal_naive_backtest`).

    The calendar is generated DENSE from the observed date bounds
    (sequence + explode on a 1-row bounds frame), so silent days enter as
    zeros instead of silently contracting the lag alignment. Revenue is
    reduced to whole kilodollars BEFORE the moment sums — n*sxx then
    stays far inside int64 at 100x this scale (whole dollars would
    overflow at the 10x replica, the ab_test_welch lesson). Scale: the
    only fact-sized pass is the per-day aggregate (map-side combined);
    the series frame is calendar-sized, the 7-lag alignment self-join is
    an equi-join on the shifted day index, and the correlation is one
    shared IEEE expression over six exact int64 moments per lag — 7
    output rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.col("o_orderdate").cast("date").alias("d"),
            F.expr("CAST(o_totalprice AS BIGINT)").alias("rev_d"),
        )
        .groupBy("d")
        .agg(F.sum("rev_d").cast("bigint").alias("rev"))
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        "d0", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("gd")
    )
    series = (
        grid.join(daily, grid["gd"] == daily["d"], "left")
        .select(
            F.datediff("gd", "d0").cast("bigint").alias("idx"),
            F.expr("COALESCE(rev, 0) DIV 1000").alias("kd"),
        )
    )
    lags = spark.range(1, 8).select(F.col("id").cast("bigint").alias("lag"))
    a, b = series.alias("a"), series.alias("b")
    mom = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("b.idx") == F.col("a.idx") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("a.kd").cast("bigint").alias("sx"),
            F.sum("b.kd").cast("bigint").alias("sy"),
            F.sum(F.col("a.kd") * F.col("a.kd")).cast("bigint").alias("sxx"),
            F.sum(F.col("b.kd") * F.col("b.kd")).cast("bigint").alias("syy"),
            F.sum(F.col("a.kd") * F.col("b.kd")).cast("bigint").alias("sxy"),
        )
    )
    return mom.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.expr(_ACF_E6_SPARK).cast("bigint").alias("acf_e6"),
    ).orderBy("lag")


@query(
    "mahalanobis_outliers",
    oracle="""
    WITH v AS (
        SELECT event_id, CAST(trunc(value * 100) AS BIGINT) AS v_c,
               CAST(hour(ts) AS BIGINT) AS h
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v_c) AS BIGINT) AS sx, CAST(SUM(h) AS BIGINT) AS sy,
               CAST(SUM(v_c * v_c) AS BIGINT) AS sxx,
               CAST(SUM(h * h) AS BIGINT) AS syy,
               CAST(SUM(v_c * h) AS BIGINT) AS sxy
        FROM v
    ),
    scored AS (
        SELECT v.event_id, v.v_c, v.h,
               CAST(trunc((
                   (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                       * (v_c - CAST(sx AS DOUBLE) / n) * (v_c - CAST(sx AS DOUBLE) / n)
                 - 2.0 * (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                       * (v_c - CAST(sx AS DOUBLE) / n) * (h - CAST(sy AS DOUBLE) / n)
                 + (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                       * (h - CAST(sy AS DOUBLE) / n) * (h - CAST(sy AS DOUBLE) / n)
               ) / (
                   (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                 * (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                 - (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                 * (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               ) * 1000) AS BIGINT) AS d2_e3
        FROM v CROSS JOIN m
    )
    SELECT event_id, v_c, h, d2_e3 FROM scored
    ORDER BY d2_e3 DESC, event_id LIMIT 50
    """,
)
def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier detection: squared Mahalanobis distance of each
    event's (value, hour-of-day) pair from the corpus distribution — the
    covariance-aware companion to the univariate value_mad_outliers: a
    reading can be unremarkable on each axis yet anomalous jointly (a big
    value at an hour where big values never occur), and Mahalanobis is
    what catches that. Top-50 most anomalous events reported.

    Determinism: the six sufficient moments (n, Sx, Sy, Sxx, Syy, Sxy) are
    exact int64 sums; the 2x2 covariance inverse is the closed-form
    quadratic d2 = (Vyy*zx^2 - 2Vxy*zx*zy + Vxx*zy^2)/det evaluated by one
    shared double tree per row, trunc-scaled to e3 BEFORE the top-k
    ordering so rank comparisons happen on integers.

    Scale: one partial+final agg produces a single 6-moment row, broadcast
    back by a cross join; scoring is a projection and the top-50 is
    TakeOrderedAndProject (per-partition heaps, no sort shuffle). At
    petabyte row counts int64 moments of cent-scaled values approach
    overflow — the same promotion DECIMAL(38) discipline as the decimal
    money aggregates applies there (documented, not silently done: the
    oracle pins int64 at test SF)."""
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("value").isNotNull()).select(
        "event_id",
        F.expr("CAST(value * 100 AS BIGINT)").alias("v_c"),
        F.hour("ts").cast("bigint").alias("h"),
    )
    m = v.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v_c").cast("bigint").alias("sx"),
        F.sum("h").cast("bigint").alias("sy"),
        F.sum(F.col("v_c") * F.col("v_c")).cast("bigint").alias("sxx"),
        F.sum(F.col("h") * F.col("h")).cast("bigint").alias("syy"),
        F.sum(F.col("v_c") * F.col("h")).cast("bigint").alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n_d
    my = F.col("sy").cast("double") / n_d
    vxx = F.col("sxx").cast("double") / n_d - mx * mx
    vyy = F.col("syy").cast("double") / n_d - my * my
    vxy = F.col("sxy").cast("double") / n_d - mx * my
    zx = F.col("v_c") - mx
    zy = F.col("h") - my
    d2 = (vyy * zx * zx - 2.0 * vxy * zx * zy + vxx * zy * zy) / (
        vxx * vyy - vxy * vxy
    )
    scored = v.crossJoin(F.broadcast(m)).select(
        "event_id", "v_c", "h", (d2 * 1000).cast("bigint").alias("d2_e3")
    )
    return scored.orderBy(F.desc("d2_e3"), F.asc("event_id")).limit(50)


@query(
    "theil_sen_trend",
    oracle="""
    WITH monthly AS (
        SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS m,
               CAST(SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT b.rev_c - a.rev_c AS dy, b.m - a.m AS dx, a.m AS m1
        FROM monthly a JOIN monthly b ON b.m > a.m
    ),
    ranked AS (
        SELECT dy, dx,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(dy AS DOUBLE) / dx, dx, m1) AS rk,
               COUNT(*) OVER () AS n_pairs
        FROM pairs
    )
    SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_points,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(dy AS BIGINT) AS med_dy_c,
           CAST(dx AS BIGINT) AS med_dx,
           CAST(CASE WHEN dy >= 0 THEN (1000000 * dy) // dx
                ELSE -((1000000 * (-dy)) // dx) END AS BIGINT)
               AS slope_e6_c_per_month
    FROM ranked WHERE rk = (n_pairs + 1) // 2
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: the median of all
    pairwise slopes (dy/dx over month pairs) — the estimator that ignores
    up to ~29% outlier contamination where OLS (ols_by_segment's machinery)
    chases it. The median slope is selected EXACTLY: slopes are integer
    fractions (cent dy over month dx), ordered by their double quotient —
    exact here because two distinct fractions with dx <= n_months differ
    by >= 1/n_months^2 in absolute value while double rounding error at
    these magnitudes is ~1e-8 of that — with (dx, first-month) closing
    the total order for equal fractions; the lower median (rank
    (n+1)//2) is the deterministic pick. The slope is reported as the
    exact (dy, dx) fraction plus a sign-split trunc(1e6*dy/dx) scaling
    (the kappa discipline: floor-vs-truncate divergence on negatives is
    factored out).

    Scale shape: the only corpus-sized work is the monthly aggregate
    (one map-side-combined pass over orders); the pairwise-slope frame is
    calendar-sized (months^2/2 ~ 2.7k rows for 6 years) — the broadcast
    theta self-join and the unpartitioned rank window both live on that
    post-aggregation frame, the audited-benign pattern shared with the
    ACF/seasonal queries."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m")
        )
        .agg(F.sum(F.expr("CAST(o_totalprice * 100 AS BIGINT)")).cast("bigint").alias("rev_c"))
        .localCheckpoint()
    )
    a = monthly.select(F.col("m").alias("m1"), F.col("rev_c").alias("r1"))
    b = monthly.select(F.col("m").alias("m2"), F.col("rev_c").alias("r2"))
    pairs = (
        a.join(F.broadcast(b), F.col("m2") > F.col("m1"))
        .select(
            (F.col("r2") - F.col("r1")).alias("dy"),
            (F.col("m2") - F.col("m1")).alias("dx"),
            "m1",
        )
    )
    w = W.orderBy(F.expr("CAST(dy AS DOUBLE) / dx"), F.col("dx"), F.col("m1"))
    ranked = pairs.select(
        "dy",
        "dx",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(W.partitionBy()).alias("n_pairs"),
    )
    n_points = monthly.agg(F.count("*").cast("bigint").alias("n_points"))
    return (
        ranked.filter(F.col("rk") == F.expr("(n_pairs + 1) div 2"))
        .crossJoin(F.broadcast(n_points))
        .select(
            "n_points",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("dy").cast("bigint").alias("med_dy_c"),
            F.col("dx").cast("bigint").alias("med_dx"),
            F.expr(
                "CAST(CASE WHEN dy >= 0 THEN (1000000 * dy) div dx"
                " ELSE -((1000000 * (-dy)) div dx) END AS BIGINT)"
            ).alias("slope_e6_c_per_month"),
        )
    )


@query(
    "distribution_emd_ks",
    oracle="""
    WITH vals AS (
        SELECT CAST(trunc(value * 100) AS BIGINT) AS x,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    pts AS (
        SELECT x, CAST(SUM(a) AS BIGINT) AS ca, CAST(SUM(b) AS BIGINT) AS cb
        FROM vals GROUP BY x
    ),
    tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
        FROM pts
    ),
    walk AS (
        SELECT x,
               SUM(ca) OVER (ORDER BY x) AS cum_a,
               SUM(cb) OVER (ORDER BY x) AS cum_b,
               LEAD(x) OVER (ORDER BY x) AS next_x
        FROM pts
    ),
    terms AS (
        SELECT ABS(cum_a * tot.nb - cum_b * tot.na) AS d,
               COALESCE(next_x - x, 0) AS gap
        FROM walk, tot
    )
    SELECT tot.na AS n_a, tot.nb AS n_b,
           CAST(SUM(d * gap) AS BIGINT) AS emd_num,
           CAST(tot.na * tot.nb AS BIGINT) AS den,
           CAST((1000 * SUM(d * gap)) // (tot.na * tot.nb) AS BIGINT)
               AS emd_c_e3,
           CAST(MAX(d) AS BIGINT) AS ks_num,
           CAST((1000000 * MAX(d)) // (tot.na * tot.nb) AS BIGINT) AS ks_e6
    FROM terms, tot GROUP BY tot.na, tot.nb
    """,
)
def distribution_emd_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D optimal transport (Wasserstein-1 / earth-mover's
    distance) AND the Kolmogorov-Smirnov statistic between the view-value
    and purchase-value distributions — the two classic distribution-shift
    measures next to the binned PSI family, computed EXACTLY instead of
    on a histogram: W1 = integral |F_a - F_b| dx collapses to a sum over
    the distinct cent values of |cum_a*n_b - cum_b*n_a| * gap (an integer
    once both CDFs are put over the common denominator n_a*n_b), and KS
    is the max of the same cross-multiplied differences. Emitted as the
    exact (numerator, denominator) pair plus trunc-scaled readouts
    (emd at 1e3 rather than 1e6 so the product stays inside int64 up to
    ~sf10; the full-precision pair is there for any consumer).

    Scale shape: one conditional aggregation collapses the fact stream to
    the distinct-cent-value domain (<= 49k rows whatever the data
    volume — value-domain-sized, not data-sized), and the CDF walk's
    unpartitioned windows run on that post-aggregation frame — the same
    audited-benign class as the calendar-sized ACF/seasonal windows. At
    an unbounded value domain the walk swaps to the two-pass
    global_prefix_sum machinery unchanged."""
    e = load_table(spark, sf_dir, "events")
    vals = e.filter(F.col("event_type").isin("view", "purchase")).select(
        F.expr("CAST(value * 100 AS BIGINT)").alias("x"),
        (F.col("event_type") == "view").cast("int").alias("a"),
        (F.col("event_type") == "purchase").cast("int").alias("b"),
    )
    pts = vals.groupBy("x").agg(
        F.sum("a").cast("bigint").alias("ca"), F.sum("b").cast("bigint").alias("cb")
    )
    tot = pts.agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    w = W.orderBy("x")
    walk = pts.select(
        "x",
        F.sum("ca").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum_a"),
        F.sum("cb").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum_b"),
        F.lead("x").over(w).alias("next_x"),
    )
    terms = walk.crossJoin(F.broadcast(tot)).select(
        F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")).alias("d"),
        F.coalesce(F.col("next_x") - F.col("x"), F.lit(0)).alias("gap"),
        "na",
        "nb",
    )
    return terms.groupBy("na", "nb").agg(
        F.sum(F.expr("d * gap")).cast("bigint").alias("emd_num"),
        F.expr("first(na * nb)").cast("bigint").alias("den"),
        F.expr("(1000 * SUM(d * gap)) div first(na * nb)")
        .cast("bigint")
        .alias("emd_c_e3"),
        F.max("d").cast("bigint").alias("ks_num"),
        F.expr("(1000000 * MAX(d)) div first(na * nb)").cast("bigint").alias("ks_e6"),
    ).select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        "emd_num", "den", "emd_c_e3", "ks_num", "ks_e6",
    )


@query(
    "holt_linear_backtest",
    oracle="""
    WITH RECURSIVE m AS (
        SELECT CAST(row_number() OVER (ORDER BY mon) AS INT) AS i,
               strftime(mon, '%Y-%m') AS month, rev_c
        FROM (SELECT date_trunc('month', o_orderdate) AS mon,
                     CAST(SUM(CAST(trunc(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS rev_c
              FROM orders GROUP BY 1)
    ),
    hw(i, month, rev_c, l, b, fc) AS (
        SELECT i, month, rev_c, rev_c * 1000, CAST(0 AS BIGINT), rev_c * 1000
        FROM m WHERE i = 1
        UNION ALL
        SELECT m.i, m.month, m.rev_c,
               (m.rev_c * 1000 + hw.l + hw.b) // 2,
               ((m.rev_c * 1000 + hw.l + hw.b) // 2 - hw.l + hw.b) // 2,
               hw.l + hw.b
        FROM hw JOIN m ON m.i = hw.i + 1
    )
    SELECT i AS month_idx, month, rev_c,
           l AS level_k, b AS trend_k, fc AS forecast_k,
           CAST(abs(rev_c * 1000 - fc) AS BIGINT) AS abs_err_k
    FROM hw ORDER BY month_idx
    """,
)
def holt_linear_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing over monthly revenue
    with a one-step-ahead forecast backtest — the trend-aware upgrade on
    `ewma_order_values` (level only) and the recursive counterpart of
    `theil_sen_trend` (one global slope): level and trend update each
    month as l_t = (y_t + l_{t-1} + b_{t-1}) DIV 2,
    b_t = (l_t - l_{t-1} + b_{t-1}) DIV 2 (alpha = beta = 1/2), and the
    forecast for month t is l_{t-1} + b_{t-1}, scored as data.

    Exactness: values carry as milli-cent int64 (rev_c * 1000); both
    sides TRUNCATE divisions toward zero (DuckDB's // truncates on
    negatives — measured, the trend column goes negative where trunc and
    floor diverge — so the Python fold mirrors trunc explicitly), making
    every level/trend/forecast bit-identical.

    Scale: the recurrence is sequential BY DEFINITION, but its state
    frame is calendar-bounded — the distributed work is the one
    map-side-combinable monthly aggregation over the fact table; the
    <=months-row fold then runs on the driver (the SPRT offset-fold /
    BPE-merge discipline: driver holds calendar-sized state, never data).
    At 100 TB the plan is unchanged — the scan grows, the fold does not.
    DuckDB replays the same recurrence as a recursive CTE (the BFS-oracle
    discipline), so the fold itself is value-checked, not trusted."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
            .alias("month")
        )
        .agg(
            F.sum(F.expr("CAST(o_totalprice * 100 AS BIGINT)"))
            .cast("bigint")
            .alias("rev_c")
        )
        .orderBy("month")
        .collect()  # calendar-bounded: one row per month, ever
    )
    def tdiv2(a: int) -> int:
        # truncate-toward-zero halving: DuckDB's // semantics on negatives
        return a // 2 if a >= 0 else -((-a) // 2)

    rows = []
    l_prev = b_prev = 0
    for i, r in enumerate(monthly, start=1):
        yk = r.rev_c * 1000
        if i == 1:
            l_cur, b_cur, fc = yk, 0, yk
        else:
            fc = l_prev + b_prev
            l_cur = tdiv2(yk + fc)
            b_cur = tdiv2(l_cur - l_prev + b_prev)
        rows.append((i, r.month, r.rev_c, l_cur, b_cur, fc, abs(yk - fc)))
        l_prev, b_prev = l_cur, b_cur
    return spark.createDataFrame(
        rows,
        "month_idx: int, month: string, rev_c: bigint, level_k: bigint,"
        " trend_k: bigint, forecast_k: bigint, abs_err_k: bigint",
    ).orderBy("month_idx")
