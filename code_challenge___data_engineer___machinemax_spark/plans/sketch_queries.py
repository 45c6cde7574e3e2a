"""Sketch-family operators under the exact value gate.

Probabilistic summaries are how a 100 TB engine answers cardinality /
heavy-hitter questions without a full shuffle of the key domain — but the
usual objection is that sketches are untestable. Not so: with a
deterministic hash (md5, byte-identical in Spark and DuckDB) the ENTIRE
sketch state is a pure function of the data, so the DuckDB oracle can
rebuild the same registers / cells and the comparison is exact int64 — the
same value-gate discipline the repo uses for k-means and PageRank. The
engine's built-in approx variants (`approx_count_distinct`,
`approx_percentile`) stay covered by their rows-only queries; these
queries pin the sketch MATH itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

# HyperLogLog layout: 2 hex chars -> 256 registers (p=8); the remaining 13
# hex chars are a 52-bit suffix whose leading-zero count is the register
# candidate. rho = 53 - bitlength(suffix), with the all-zero suffix pinned
# to the max rank 53.
_HLL_RHO = """CAST(CASE WHEN {sfx} = 0 THEN 53
                   ELSE 53 - length(bin({sfx})) END AS INT)"""

# Count-min layout: depth 4 x width 512; row r's bucket for key k is the
# first 8 md5 hex chars of 'r:k' mod 512.
_CMS_D, _CMS_W = 4, 512

# Bloom layout: m bits, k hash functions; hash i's bit for key x is the
# first 8 md5 hex chars of 'i:x' mod m. The member set (customers with a
# recent urgent order) is ~23% of the probe universe, so both the
# no-false-negative guarantee AND a realized FP count are observable.
_BLOOM_M, _BLOOM_K = 4096, 3
_BLOOM_KEY_PRED = "o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '2001-01-01'"


@query(
    "hll_user_registers",
    oracle=f"""
    WITH h AS (
        SELECT event_type,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 2))
                    AS BIGINT) AS reg,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 3, 13))
                    AS BIGINT) AS sfx
        FROM events
    )
    SELECT event_type, reg,
           MAX({_HLL_RHO.format(sfx="sfx")}) AS max_rho
    FROM h GROUP BY event_type, reg
    """,
)
def hll_user_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register state (p=8, 256 registers) for the distinct-user
    count per event type, built from first principles: md5 prefix selects
    the register, the leading-zero rank of the 52-bit suffix is the
    candidate, and the register holds the max rank. The register table IS
    the mergeable sketch — the estimate is the standard harmonic-mean
    formula over these rows (float, so the oracle pins the registers, not
    the estimate; `approx_distinct_users` covers the built-in estimator).

    Scale: this is the whole point of HLL on a cluster — max() is
    commutative, so Spark's partial aggregation reduces every partition to
    at most types x 256 rows before the shuffle; the final state is
    KB-sized regardless of input volume, and unioning two corpora is a
    register-wise max (the same merge Spark's own approx_count_distinct
    does inside its ImperativeAggregate)."""
    e = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    sfx = F.conv(F.substring(h, 3, 13), 16, 10).cast("bigint")
    rho = (
        F.when(sfx == 0, 53)
        .otherwise(53 - F.length(F.bin(sfx)))
        .cast("int")
    )
    return (
        e.select(
            "event_type",
            F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint").alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH cells AS (
        SELECT r,
               CAST(('0x' || substring(
                        md5(r || ':' || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_CMS_W} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events, (SELECT unnest(['0','1','2','3']) AS r)
        GROUP BY 1, 2
    ), probes AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 25 = 0
    ), probe_rows AS (
        SELECT p.user_id, r,
               CAST(('0x' || substring(
                        md5(r || ':' || CAST(p.user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_CMS_W} AS bucket
        FROM probes p, (SELECT unnest(['0','1','2','3']) AS r)
    ), est AS (
        SELECT pr.user_id, MIN(c.c) AS est_n
        FROM probe_rows pr JOIN cells c USING (r, bucket)
        GROUP BY pr.user_id
    ), truth AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
        FROM events WHERE user_id % 25 = 0 GROUP BY user_id
    )
    SELECT e.user_id, e.est_n, t.true_n, e.est_n - t.true_n AS overcount
    FROM est e JOIN truth t USING (user_id)
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 512) over per-user event counts,
    probed for the deterministic heavy-hitter candidate set (user_id % 25
    = 0): estimate = min over the 4 rows' cells, reported against the true
    count (overcount >= 0 is the CMS guarantee; the oracle would catch a
    broken hash by the estimates, not just the sketch, diverging).

    Scale: the sketch is a FIXED 2048-cell table however large the input —
    partial aggregation collapses each partition to <= 2048 rows, the
    shuffle moves KBs, and the probe join broadcasts. This is the
    frequency-query shape (abuse/top-talker detection) that at 100 TB
    replaces a full user_id groupBy when only point estimates are needed;
    the exact `truth` side here exists for the gate, not the production
    path."""
    e = load_table(spark, sf_dir, "events")
    rows = F.explode(F.array(*[F.lit(str(r)) for r in range(_CMS_D)])).alias("r")

    def bucket(key: F.Column) -> F.Column:
        cell = F.md5(F.concat(F.col("r"), F.lit(":"), key.cast("string")))
        return F.conv(F.substring(cell, 1, 8), 16, 10).cast("bigint") % _CMS_W

    cells = (
        e.select("user_id", rows)
        .select("r", bucket(F.col("user_id")).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )
    probes = (
        e.filter(F.col("user_id") % 25 == 0)
        .select("user_id")
        .distinct()
        .select("user_id", rows)
        .select("user_id", "r", bucket(F.col("user_id")).alias("bucket"))
    )
    est = (
        F.broadcast(probes)
        .join(cells, ["r", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_n"))
    )
    truth = (
        e.filter(F.col("user_id") % 25 == 0)
        .groupBy("user_id")
        .agg(F.count("*").alias("true_n"))
    )
    return est.join(truth, "user_id").select(
        "user_id",
        "est_n",
        "true_n",
        (F.col("est_n") - F.col("true_n")).alias("overcount"),
    )


@query(
    "bloom_membership_report",
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT o_custkey FROM orders WHERE {_BLOOM_KEY_PRED}
    ), hs AS (
        SELECT unnest([{", ".join(repr(str(i)) for i in range(_BLOOM_K))}]) AS i
    ), bits AS (
        SELECT DISTINCT
               CAST(('0x' || substring(
                        md5(i || ':' || CAST(o_custkey AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_BLOOM_M} AS pos
        FROM keys, hs
    ), probe AS (
        SELECT c_custkey, i,
               CAST(('0x' || substring(
                        md5(i || ':' || CAST(c_custkey AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_BLOOM_M} AS pos
        FROM customer, hs
    ), hit AS (
        SELECT p.c_custkey, COUNT(b.pos) AS n_hit
        FROM probe p LEFT JOIN bits b USING (pos)
        GROUP BY p.c_custkey
    ), truth AS (
        SELECT c.c_custkey, (k.o_custkey IS NOT NULL) AS actual_member
        FROM customer c LEFT JOIN keys k ON c.c_custkey = k.o_custkey
    )
    SELECT t.actual_member, h.n_hit = {_BLOOM_K} AS bloom_positive,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM truth t JOIN hit h USING (c_custkey)
    GROUP BY 1, 2
    """,
)
def bloom_membership_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (m=4096 bits, k=3 md5-derived hashes) built over the
    customers holding a recent urgent order (~23% of customers), then
    probed for EVERY customer and scored against ground truth: one row per
    (actual_member, bloom_positive) cell. The no-false-negative guarantee
    means the (true, false) cell must be empty — a golden test pins that —
    while the (false, true) cell is the realized FP count for this m/k/n
    (nonzero at the gate SF, so the probabilistic behavior itself is under
    the value gate, not just the happy path). The oracle rebuilds the
    identical bit set, so a broken hash or bit layout shifts the cells.

    Scale: the filter state is the distinct set-bit table — at most m rows
    regardless of key volume, reduced map-side by partial distinct before a
    KB-sized shuffle, and mergeable across corpora by union (bitwise OR).
    The probe broadcasts those <= m rows and never shuffles the probed
    table. In production m grows with the expected key count (constant
    bits-per-key keeps FP fixed); it is a literal here so both engines
    agree. This is the membership-sketch shape that at 100 TB replaces the
    exact anti-join when a bounded FP rate is acceptable (seen-URL checks,
    decontamination pre-filters fronting the exact gram join); the exact
    `truth` side here exists for the gate, not the production path."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    hs = F.explode(F.array(*[F.lit(str(i)) for i in range(_BLOOM_K)])).alias("i")

    def pos(key: F.Column) -> F.Column:
        h = F.md5(F.concat(F.col("i"), F.lit(":"), key.cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BLOOM_M

    keys = o.filter(F.expr(_BLOOM_KEY_PRED)).select("o_custkey").distinct()
    bits = (
        keys.select("o_custkey", hs)
        .select(pos(F.col("o_custkey")).alias("pos"))
        .distinct()
    )
    probe = c.select("c_custkey", hs).select(
        "c_custkey", pos(F.col("c_custkey")).alias("pos")
    )
    hit = (
        probe.join(F.broadcast(bits.withColumn("set_", F.lit(1))), "pos", "left")
        .groupBy("c_custkey")
        .agg(F.count("set_").alias("n_hit"))
    )
    truth = c.select("c_custkey").join(
        keys.withColumnRenamed("o_custkey", "c_custkey").withColumn(
            "member_", F.lit(1)
        ),
        "c_custkey",
        "left",
    ).select("c_custkey", F.col("member_").isNotNull().alias("actual_member"))
    return (
        truth.join(hit, "c_custkey")
        .groupBy(
            "actual_member",
            (F.col("n_hit") == _BLOOM_K).alias("bloom_positive"),
        )
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


@query(
    "priority_sample_docs",
    oracle="""
    SELECT doc_id, source,
           md5(CAST(doc_id AS VARCHAR)) AS priority
    FROM documents
    ORDER BY priority, doc_id
    LIMIT 200
    """,
)
def priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample: the 200 documents with the smallest
    md5(doc_id) priority — a hash-ordered 'reservoir' that is reproducible
    across runs, engines and partitionings (unlike rand()-based sampling,
    which the rows-only bernoulli query covers), and composable: the
    union of two corpora's priority samples contains the union's sample.

    Scale: Catalyst plans ORDER BY + LIMIT as TakeOrderedAndProject — each
    partition keeps its local top-200 and only k rows per partition reach
    the driver-side merge; no global sort materializes. This is how you
    cut a fixed-size eval slice from a 100 TB corpus in one pass."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(200)
    )


# KMV / theta layout: per set, the k smallest 60-bit hashes (15 md5 hex
# chars) of the member keys. theta = the k-th smallest hash of the UNION
# sample; any union-sample hash is below every per-set theta, so sketch
# membership equals true set membership for those hashes and the
# intersection counter is exact over the sample.
_KMV_K = 64


@query(
    "kmv_theta_set_ops",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substring(md5(
                        CAST(user_id AS VARCHAR) || ':'
                        || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events
    ), sketch AS (
        SELECT event_type, hv FROM (
            SELECT event_type, hv,
                   row_number() OVER (PARTITION BY event_type ORDER BY hv)
                       AS rn
            FROM h)
        WHERE rn <= {_KMV_K}
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM events) a
        JOIN (SELECT DISTINCT event_type FROM events) b
          ON a.event_type < b.event_type
    ), merged AS (
        SELECT DISTINCT p.type_a, p.type_b, s.hv
        FROM pairs p
        JOIN sketch s ON s.event_type IN (p.type_a, p.type_b)
    ), union_sketch AS (
        SELECT type_a, type_b, hv FROM (
            SELECT type_a, type_b, hv,
                   row_number() OVER (PARTITION BY type_a, type_b
                                      ORDER BY hv) AS rn
            FROM merged)
        WHERE rn <= {_KMV_K}
    )
    SELECT u.type_a, u.type_b,
           MAX(u.hv) AS theta_hash,
           COUNT(*) AS k_union,
           CAST(SUM(CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_common
    FROM union_sketch u
    LEFT JOIN sketch sa ON sa.event_type = u.type_a AND sa.hv = u.hv
    LEFT JOIN sketch sb ON sb.event_type = u.type_b AND sb.hv = u.hv
    GROUP BY u.type_a, u.type_b
    """,
)
def kmv_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta-sketch) set operations over the active user-day sets
    (user_id x event date — high-cardinality, partially overlapping) of
    every event-type pair: the union sketch's k-th smallest hash (theta),
    its realized size, and the exact count of union-sample hashes present
    in BOTH sets — the state behind theta-sketch union/intersection
    estimates (union_est = (k-1)/theta_frac, intersect_est = n_common/k x
    union_est; the estimates are float, so the oracle pins the integer
    sketch state, same discipline as `hll_user_registers`).

    Scale: the per-set sketch is built two-stage — a salted local
    row_number (per (set, hv % 16) slice) keeps every window frame
    partition-local, then the final per-set rank runs over <= 16k
    surviving rows; no set-sized window anywhere. Everything after is
    sketch-vs-sketch algebra on <= sets x k rows — KB-sized regardless of
    input volume, and mergeable: the union sketch of two corpora is the
    k smallest of the concatenated sketches, which is exactly what the
    pair join computes."""
    from pyspark.sql import Window as W

    k = _KMV_K
    e = load_table(spark, sf_dir, "events")
    key = F.concat_ws(
        ":",
        F.col("user_id").cast("string"),
        F.col("ts").cast("date").cast("string"),
    )
    h = e.select(
        "event_type",
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint").alias("hv"),
    ).distinct()

    salted = h.withColumn("__salt", (F.col("hv") % 16).cast("int"))
    local_w = W.partitionBy("event_type", "__salt").orderBy("hv")
    survivors = (
        salted.withColumn("__rn", F.row_number().over(local_w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    final_w = W.partitionBy("event_type").orderBy("hv")
    # the finished sketch (types x k rows, KB) fans out into the type
    # spine and both set arms — pinned so the fact-sized distinct +
    # salted ranking runs once (8 scans un-pinned; recompute-tree audit)
    sketch = (
        survivors.withColumn("__rn", F.row_number().over(final_w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .localCheckpoint()
    )

    types = sketch.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    sa = sketch.select(F.col("event_type").alias("type_a"), "hv")
    sb = sketch.select(F.col("event_type").alias("type_b"), "hv")
    merged = (
        pairs.join(sa, "type_a")
        .select("type_a", "type_b", "hv")
        .unionByName(pairs.join(sb, "type_b").select("type_a", "type_b", "hv"))
        .distinct()
    )
    # union-sketch rank: frames are <= 2k rows per pair (post-sketch
    # algebra, metadata-sized — the audited-window convention)
    pair_w = W.partitionBy("type_a", "type_b").orderBy("hv")
    union_sketch = (
        merged.withColumn("__rn", F.row_number().over(pair_w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    flagged = (
        union_sketch.join(
            sa.withColumn("__in_a", F.lit(1)), ["type_a", "hv"], "left"
        )
        .join(sb.withColumn("__in_b", F.lit(1)), ["type_b", "hv"], "left")
    )
    return flagged.groupBy("type_a", "type_b").agg(
        F.max("hv").alias("theta_hash"),
        F.count("*").alias("k_union"),
        F.sum(
            (F.col("__in_a").isNotNull() & F.col("__in_b").isNotNull()).cast("int")
        )
        .cast("bigint")
        .alias("n_common"),
    )


@query(
    "hll_register_rollup",
    oracle=f"""
    WITH h AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 2))
                    AS BIGINT) AS reg,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 3, 13))
                    AS BIGINT) AS sfx
        FROM events
    ), r AS (
        SELECT week, day, reg, {_HLL_RHO.format(sfx="sfx")} AS rho FROM h
    ), daily AS (
        SELECT week, day, reg, MAX(rho) AS max_rho
        FROM r GROUP BY week, day, reg
    ), merged AS (
        SELECT week, reg, MAX(max_rho) AS max_rho
        FROM daily GROUP BY week, reg
    ), direct AS (
        SELECT week, reg, MAX(rho) AS max_rho
        FROM r GROUP BY week, reg
    )
    SELECT d.week,
           CAST(COUNT(*) AS BIGINT) AS n_regs,
           CAST(SUM(d.max_rho) AS BIGINT) AS sum_rho_direct,
           CAST(SUM(m.max_rho) AS BIGINT) AS sum_rho_merged,
           CAST(SUM(CASE WHEN m.max_rho IS NULL OR m.max_rho <> d.max_rho
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
    FROM direct d LEFT JOIN merged m ON m.week = d.week AND m.reg = d.reg
    GROUP BY d.week
    ORDER BY d.week
    """,
)
def hll_register_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-rollup table pattern: HLL registers built PER DAY, then
    rolled up to weeks by register-wise max, compared register-by-
    register against sketches built directly from the week's raw rows —
    n_mismatch == 0 per week IS the mergeability law (max is
    commutative/associative/idempotent), held as checked data rather
    than asserted. This is the lakehouse pre-aggregation contract: keep
    KB-sized daily sketch rows, answer any coarser distinct-count
    rollup (week/month/all-time, any subset of days) WITHOUT touching
    the fact table again — the pattern `streamed_cms_heavy_hitters`
    pins for count-min across waves, completed here for HLL across
    calendar grains.

    Scale: the daily register table is <= days x 256 rows (map-side
    reduced before its only shuffle); the weekly rollup reads ONLY that
    table. The `direct` arm re-scans raw events purely to hold the
    equality under the value gate — production never runs it."""
    e = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))
    sfx = F.conv(F.substring(h, 3, 13), 16, 10).cast("bigint")
    rho = (
        F.when(sfx == 0, 53).otherwise(53 - F.length(F.bin(sfx))).cast("int")
    )
    r = e.select(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint").alias("reg"),
        rho.alias("rho"),
    )
    daily = r.groupBy("week", "day", "reg").agg(F.max("rho").alias("max_rho"))
    merged = daily.groupBy("week", "reg").agg(F.max("max_rho").alias("m_rho"))
    direct = r.groupBy("week", "reg").agg(F.max("rho").alias("d_rho"))
    joined = direct.join(merged, ["week", "reg"], "left")
    return (
        joined.groupBy("week")
        .agg(
            F.count("*").cast("bigint").alias("n_regs"),
            F.sum("d_rho").cast("bigint").alias("sum_rho_direct"),
            F.sum("m_rho").cast("bigint").alias("sum_rho_merged"),
            F.sum(
                F.when(
                    F.col("m_rho").isNull() | (F.col("m_rho") != F.col("d_rho")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_mismatch"),
        )
        .orderBy("week")
    )


@query(
    "quantile_bin_sketch",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               strftime(l_shipdate, '%Y-%m') AS shard,
               CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
                   // 51200 AS bin
        FROM lineitem
    ),
    sub AS (
        SELECT l_returnflag, shard, bin, COUNT(*) AS c
        FROM b GROUP BY l_returnflag, shard, bin
    ),
    sk AS (
        SELECT l_returnflag, bin, CAST(SUM(c) AS BIGINT) AS cnt
        FROM sub GROUP BY l_returnflag, bin
    ),
    cum AS (
        SELECT l_returnflag, bin, cnt,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum
        FROM sk
    ),
    tot AS (
        SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_bins
        FROM sk GROUP BY l_returnflag
    )
    SELECT c.l_returnflag,
           MAX(t.n_rows) AS n_rows,
           MAX(t.n_bins) AS n_bins,
           CAST(MIN(CASE WHEN c.cum >= (t.n_rows * 50 + 99) // 100
                         THEN c.bin END) * 51200 AS BIGINT) AS p50_lo_cents,
           CAST(MIN(CASE WHEN c.cum >= (t.n_rows * 90 + 99) // 100
                         THEN c.bin END) * 51200 AS BIGINT) AS p90_lo_cents,
           CAST(MIN(CASE WHEN c.cum >= (t.n_rows * 99 + 99) // 100
                         THEN c.bin END) * 51200 AS BIGINT) AS p99_lo_cents
    FROM cum c JOIN tot t USING (l_returnflag)
    GROUP BY c.l_returnflag
    """,
)
def quantile_bin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin quantile sketch — the quantile member of the
    sketch family (HLL registers, CMS cells, KMV synopses, Bloom bits,
    and now equi-width histogram bins, all under the exact value gate):
    per return flag, bin l_extendedprice into $512 buckets (exact cents
    // 51200, positive so floor == trunc), build per-(flag, ship-month)
    sub-sketches, merge them by summing counts — the shard-level build +
    register-merge that makes a sketch deployable across 100 TB of
    ingest waves — and read p50/p90/p99 as the lower edge of the first
    bin whose cumulative count reaches ceil(q*n/100). Estimate error is
    structurally <= one bin width ($512), the classic equi-width
    histogram bound; `approx_order_percentiles` covers the engine's
    built-in KLL-style estimator, this pins the sketch math itself.

    Scale: the sub-sketch agg partial-reduces map-side to at most
    (flags x months x bins) rows before its only shuffle; the merge and
    the cumulative-sum window run over the KB-sized sketch (bins per
    flag ~ price-range/512), never the fact table. Merging two corpora's
    sketches is the same count-sum — associative like the HLL
    register max (`hll_register_rollup` pins that law where it is
    non-trivial; for sums it holds by construction)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM").alias("shard"),
        F.expr(
            "CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) div 51200"
        ).alias("bin"),
    )
    sub = base.groupBy("l_returnflag", "shard", "bin").agg(F.count("*").alias("c"))
    # the merged sketch is KB-sized and fans out to both the cumulative
    # read and the totals — checkpoint it so the fact scan runs ONCE
    # (without this the cum and tot branches each re-scan lineitem)
    sk = (
        sub.groupBy("l_returnflag", "bin")
        .agg(F.sum("c").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    cum = sk.withColumn(
        "cum", F.sum("cnt").over(W.partitionBy("l_returnflag").orderBy("bin"))
    )
    tot = sk.groupBy("l_returnflag").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_bins"),
    )

    def lo(q: int):
        target = F.expr(f"(n_rows * {q} + 99) div 100")
        return (
            F.min(F.when(F.col("cum") >= target, F.col("bin"))) * 51200
        ).cast("bigint")

    return (
        cum.join(tot, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("n_bins").alias("n_bins"),
            lo(50).alias("p50_lo_cents"),
            lo(90).alias("p90_lo_cents"),
            lo(99).alias("p99_lo_cents"),
        )
    )
