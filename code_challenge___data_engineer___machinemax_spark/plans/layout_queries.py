"""Data-layout queries: Z-order (Morton) clustering and the file-skipping
statistics it buys.

At 100 TB the fastest scan is the one that never happens: lakehouse tables
(Delta OPTIMIZE ZORDER, Iceberg sort orders) keep per-file min/max column
stats and prune files whose bounding box misses the predicate. A table
sorted LINEARLY on one key prunes on that key only — every file spans the
full range of every other column. Interleaving the bits of two keys into a
single Morton code and range-partitioning on THAT bounds every file in
BOTH dimensions at once, so predicates on either column skip files.

The query below builds both layouts over `orders` (x = o_custkey, y =
order day) with equal-depth 16-file assignment and reports each file's
bounding box plus whether a canonical probe range on each dimension would
touch it — the exact manifest-pruning decision, as data. Everything is
integer arithmetic on bits, so the DuckDB oracle is value-exact.

Reference parity: the reference system has no layout surface (its store is
a Mongo collection, apitestmongo.py:37); this is north-star scale surface,
same family as DEPLOY.md's L1-L5 persisted layouts. The physical writer is
sources/zorder.py:write_zordered (footer-stats pruning pinned by
tests/test_layouts.py); this query puts the same decision data under the
DuckDB value gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import scalable_ntile
from ..sources.zorder import morton_code
from ..tables import load_table
from .registry import query

# 12 bits per dimension -> 24-bit Morton code. sf0.01 keys fit (custkey
# <= 1499, order day <= 2404); the & mask makes the semantics explicit and
# keeps the oracle identical if they ever don't. Production would use the
# same interleave at 21 bits/dim (63-bit code) — the expression shape is
# the same loop, unrolled by Catalyst into one codegen stage.
_BITS = 12
_MASK = (1 << _BITS) - 1
_FILES = 16

# Probe rectangles: one per dimension, each ~4% of the key range. The
# linear-by-x layout can only prune on x; z-order prunes on both.
_PROBE_X = (100, 199)
_PROBE_Y = (1200, 1299)


def _morton_sql(x: str, y: str, bits: int = _BITS) -> str:
    """Naive per-bit interleave for the DuckDB oracle — deliberately a
    DIFFERENT formulation than the Spark side's magic-number bit spread
    (sources/zorder.py:_spread_bits), so the oracle independently
    cross-checks the fast path instead of replaying it."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "zorder_layout",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               (o_custkey & {_MASK}) AS x,
               (date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                & {_MASK}) AS y
        FROM orders
    ), z AS (
        SELECT o_orderkey, x, y, ({_morton_sql("x", "y")}) AS zval FROM base
    ), files AS (
        SELECT 'zorder' AS layout,
               ntile({_FILES}) OVER (ORDER BY zval, o_orderkey) AS file_id,
               x, y
        FROM z
        UNION ALL
        SELECT 'linear' AS layout,
               ntile({_FILES}) OVER (ORDER BY x, o_orderkey) AS file_id,
               x, y
        FROM z
    )
    SELECT layout, CAST(file_id AS INT) AS file_id,
           COUNT(*) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y,
           CAST(MIN(x) <= {_PROBE_X[1]} AND MAX(x) >= {_PROBE_X[0]} AS INT)
               AS probe_x_hit,
           CAST(MIN(y) <= {_PROBE_Y[1]} AND MAX(y) >= {_PROBE_Y[0]} AS INT)
               AS probe_y_hit
    FROM files
    GROUP BY layout, file_id
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear clustering of `orders` into 16 equal-depth files,
    with per-file min/max bounds and probe-overlap flags — the manifest a
    lakehouse writer would persist, computed as a query so the pruning win
    is observable: under `linear` (sorted by custkey) every file spans the
    whole date range, so the date probe touches all 16 files; under
    `zorder` both dimensions are bounded, so each probe touches a strict
    subset.

    Scale: the Morton code is a pure bit-interleave projection (no UDF, no
    shuffle); file assignment is equal-depth via `scalable_ntile`
    (range-repartition + per-partition window — no single-partition global
    window, operators/ranking.py:100); the stats roll up with one
    partial-agg shuffle on (layout, file_id). At 100 TB this is exactly
    `df.repartitionByRange(z).sortWithinPartitions(z).write(...)` plus
    parquet footer stats — the query keeps the decision data, not the
    rewrite, so the oracle can check it."""
    o = load_table(spark, sf_dir, "orders")
    # deliberately NOT pinned (round-10 A/B): localCheckpoint'ing this
    # frame was measured ~1.7x SLOWER than re-deriving it per
    # scalable_ntile pass — the scan + Morton projection is a cheap
    # codegen'd map while the checkpoint pays a full write+read cycle
    base = o.select(
        "o_orderkey",
        F.col("o_custkey").bitwiseAND(F.lit(_MASK)).alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
        .cast("bigint")
        .bitwiseAND(F.lit(_MASK))
        .alias("y"),
    ).withColumn("zval", morton_code(F.col("x"), F.col("y")))

    zfiles = scalable_ntile(
        base, _FILES, [F.asc("zval"), F.asc("o_orderkey")], tile_col="file_id"
    ).select(F.lit("zorder").alias("layout"), "file_id", "x", "y")
    lfiles = scalable_ntile(
        base, _FILES, [F.asc("x"), F.asc("o_orderkey")], tile_col="file_id"
    ).select(F.lit("linear").alias("layout"), "file_id", "x", "y")

    files = zfiles.unionByName(lfiles)
    return files.groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        ((F.min("x") <= _PROBE_X[1]) & (F.max("x") >= _PROBE_X[0]))
        .cast("int")
        .alias("probe_x_hit"),
        ((F.min("y") <= _PROBE_Y[1]) & (F.max("y") >= _PROBE_Y[0]))
        .cast("int")
        .alias("probe_y_hit"),
    )


def _hilbert_sql_ctes(bits: int = _BITS) -> str:
    """Chained-CTE DuckDB twin of sources.zorder.with_hilbert: the
    top-down quadrant recurrence is sequential, so it unrolls one
    (rx/ry-label, rotate) CTE pair per level — the pagerank/bellman-ford
    unroll discipline. New state is emitted under fresh names (nd/nhx/nhy)
    and renamed in the next CTE so DuckDB's lateral column aliasing can
    never bind a reference to the just-computed value."""
    n = 1 << bits
    keys = "o_orderkey, x, y"
    parts = [
        f"""h0 AS (
        SELECT {keys}, CAST(0 AS BIGINT) AS nd,
               CAST(x AS BIGINT) AS nhx, CAST(y AS BIGINT) AS nhy
        FROM base)"""
    ]
    quad = (
        "CASE WHEN rx = 0 AND ry = 0 THEN 0"
        " WHEN rx = 0 THEN 1 WHEN ry = 0 THEN 3 ELSE 2 END"
    )
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        parts.append(f"""r{i} AS (
        SELECT {keys}, nd AS d, nhx AS hx, nhy AS hy,
               CASE WHEN (nhx // {s}) % 2 = 1 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (nhy // {s}) % 2 = 1 THEN 1 ELSE 0 END AS ry
        FROM h{i})""")
        parts.append(f"""h{i + 1} AS (
        SELECT {keys},
               d + {s * s} * ({quad}) AS nd,
               CASE WHEN ry = 1 THEN hx WHEN rx = 1 THEN {n - 1} - hy
                    ELSE hy END AS nhx,
               CASE WHEN ry = 1 THEN hy WHEN rx = 1 THEN {n - 1} - hx
                    ELSE hx END AS nhy
        FROM r{i})""")
    parts.append(
        f"hil AS (SELECT {keys}, nd AS hval FROM h{bits})"
    )
    return ",\n    ".join(parts)


@query(
    "hilbert_layout",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               (o_custkey & {_MASK}) AS x,
               (date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                & {_MASK}) AS y
        FROM orders
    ),
    {_hilbert_sql_ctes()},
    z AS (
        SELECT o_orderkey, x, y, ({_morton_sql("x", "y")}) AS zval FROM base
    ), files AS (
        SELECT 'hilbert' AS layout,
               ntile({_FILES}) OVER (ORDER BY hval, o_orderkey) AS file_id,
               x, y
        FROM hil
        UNION ALL
        SELECT 'zorder' AS layout,
               ntile({_FILES}) OVER (ORDER BY zval, o_orderkey) AS file_id,
               x, y
        FROM z
    )
    SELECT layout, CAST(file_id AS INT) AS file_id,
           COUNT(*) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y,
           CAST(MIN(x) <= {_PROBE_X[1]} AND MAX(x) >= {_PROBE_X[0]} AS INT)
               AS probe_x_hit,
           CAST(MIN(y) <= {_PROBE_Y[1]} AND MAX(y) >= {_PROBE_Y[0]} AS INT)
               AS probe_y_hit
    FROM files
    GROUP BY layout, file_id
    """,
)
def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve vs Z-order clustering of `orders` into 16 equal-depth
    files — the locality upgrade on `zorder_layout`: Morton order jumps
    diagonally across the grid between quadrants (bit interleave is cheap
    but discontinuous), while the Hilbert curve moves one grid cell per
    step everywhere (pinned by the adjacency property test), so
    equal-depth file cuts cover tighter (x, y) boxes and probe rectangles
    overlap fewer files. Delta Lake ships exactly this pair of layout
    choices (OPTIMIZE ZORDER BY vs liquid clustering's Hilbert default);
    this query emits both manifests side by side so the pruning win is
    data, not doctrine.

    Exactness: the curve index is pure integer bit arithmetic unrolled
    per level (sources/zorder.py:with_hilbert — linear expression growth
    via named state columns), value-identical to the oracle's chained-CTE
    replay; file stats and probe flags are MIN/MAX/COUNT over int64.

    Scale: no UDF, no shuffle for the index itself (a 12-stage fused
    projection); file assignment is `scalable_ntile` (range repartition,
    no global window); stats roll up with one partial-agg shuffle on
    (layout, file_id). The production write path is
    repartitionByRange(hval) + sortWithinPartitions — identical cost to a
    single-column sorted ingest."""
    from ..sources.zorder import with_hilbert

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_custkey").bitwiseAND(F.lit(_MASK)).alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
        .cast("bigint")
        .bitwiseAND(F.lit(_MASK))
        .alias("y"),
    )
    hil = with_hilbert(base, "x", "y", _BITS, "hval")
    z = base.withColumn("zval", morton_code(F.col("x"), F.col("y")))

    hfiles = scalable_ntile(
        hil, _FILES, [F.asc("hval"), F.asc("o_orderkey")], tile_col="file_id"
    ).select(F.lit("hilbert").alias("layout"), "file_id", "x", "y")
    zfiles = scalable_ntile(
        z, _FILES, [F.asc("zval"), F.asc("o_orderkey")], tile_col="file_id"
    ).select(F.lit("zorder").alias("layout"), "file_id", "x", "y")

    files = hfiles.unionByName(zfiles)
    return files.groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        ((F.min("x") <= _PROBE_X[1]) & (F.max("x") >= _PROBE_X[0]))
        .cast("int")
        .alias("probe_x_hit"),
        ((F.min("y") <= _PROBE_Y[1]) & (F.max("y") >= _PROBE_Y[0]))
        .cast("int")
        .alias("probe_y_hit"),
    )


# --- per-file bloom-filter skipping ---------------------------------------
# Parquet-style per-file bloom filters: m bits / k md5-derived hashes per
# file (the bloom_membership_report bit derivation, one filter per file).
_BF_M = 4096
_BF_K = 3
# deterministic probe set: a thin arithmetic slice of customers, present
# at every SF (~1/37 of the dimension)
_BF_PROBE_PRED = "c_custkey % 37 = 5"


@query(
    "bloom_file_skipping",
    oracle=f"""
    WITH filed AS (
        SELECT CAST(ntile({_FILES}) OVER (ORDER BY o_orderdate, o_orderkey)
                    AS INT) AS file_id,
               o_custkey
        FROM orders
    ), keys AS (
        SELECT DISTINCT file_id, o_custkey FROM filed
    ), hs AS (
        SELECT unnest([{", ".join(repr(str(i)) for i in range(_BF_K))}]) AS i
    ), bits AS (
        SELECT DISTINCT file_id,
               CAST(('0x' || substring(
                        md5(i || ':' || CAST(o_custkey AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_BF_M} AS pos
        FROM keys, hs
    ), stats AS (
        SELECT file_id, COUNT(*) AS n_rows,
               MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck
        FROM filed GROUP BY file_id
    ), probes AS (
        SELECT c_custkey AS pk FROM customer WHERE {_BF_PROBE_PRED}
    ), probe_bits AS (
        SELECT pk, i,
               CAST(('0x' || substring(
                        md5(i || ':' || CAST(pk AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_BF_M} AS pos
        FROM probes, hs
    ), bloom_hits AS (
        SELECT pb.pk, b.file_id
        FROM probe_bits pb JOIN bits b USING (pos)
        GROUP BY pb.pk, b.file_id
        HAVING COUNT(DISTINCT pb.i) = {_BF_K}
    ), verdicts AS (
        SELECT s.file_id, p.pk,
               CAST(p.pk BETWEEN s.min_ck AND s.max_ck AS INT) AS mm,
               CAST(bh.file_id IS NOT NULL AS INT) AS bl,
               CAST(k.file_id IS NOT NULL AS INT) AS tr
        FROM stats s CROSS JOIN probes p
        LEFT JOIN bloom_hits bh ON bh.file_id = s.file_id AND bh.pk = p.pk
        LEFT JOIN keys k ON k.file_id = s.file_id AND k.o_custkey = p.pk
    )
    SELECT v.file_id, CAST(MAX(s.n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(v.mm) AS BIGINT) AS minmax_touches,
           CAST(SUM(v.bl) AS BIGINT) AS bloom_touches,
           CAST(SUM(v.tr) AS BIGINT) AS true_touches
    FROM verdicts v JOIN stats s USING (file_id)
    GROUP BY v.file_id
    ORDER BY v.file_id
    """,
)
def bloom_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file bloom-filter skipping vs min/max stats on a DATE-sorted
    ingest of `orders` — the third leg of the file-skipping family: under
    a time-sorted layout every file spans ~the whole customer domain, so
    the min/max manifest (zorder_layout's pruning mechanism) touches all
    16 files for any customer probe; a per-file bloom filter over the
    point-lookup key (what parquet's column bloom filters and Iceberg
    puffin files persist) skips most files anyway. Emits, per file, how
    many of the probe keys each pruning strategy would touch next to the
    ground truth — bloom_touches >= true_touches always (no false
    negatives), minmax_touches ~ all probes.

    Exactness: same md5 bit derivation as `bloom_membership_report`
    (m=4096, k=3), integer counts — the realized false-positive mass per
    file is itself under the value gate.

    Scale: file assignment is `scalable_ntile`; the per-file filter state
    is the DISTINCT (file_id, pos) table — <= 16 x m rows whatever the
    row count, map-side-reduced; probes are a broadcast dimension slice;
    the verdict frame is (files x probes)-sized. Production writes the
    bit sets into the footer/manifest at ingest (one pass, mergeable by
    OR) and the reader ANDs probe bits — this query keeps the decision
    data queryable so the skip rate is measurable, not asserted."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    filed = scalable_ntile(
        o.select("o_orderkey", "o_orderdate", "o_custkey"),
        _FILES,
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        tile_col="file_id",
    ).select("file_id", "o_custkey")
    keys = filed.distinct()
    hs = F.explode(F.array(*[F.lit(str(i)) for i in range(_BF_K)])).alias("i")

    def pos(key) -> F.Column:
        h = F.md5(F.concat(F.col("i"), F.lit(":"), key.cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BF_M

    bits = (
        keys.select("file_id", "o_custkey", hs)
        .select("file_id", pos(F.col("o_custkey")).alias("pos"))
        .distinct()
    )
    stats = filed.groupBy("file_id").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
    )
    probes = c.filter(F.expr(_BF_PROBE_PRED)).select(F.col("c_custkey").alias("pk"))
    probe_bits = probes.select("pk", hs).select(
        "pk", F.col("i"), pos(F.col("pk")).alias("pos")
    )
    bloom_hits = (
        F.broadcast(probe_bits)
        .join(bits, "pos")
        .groupBy("pk", "file_id")
        .agg(F.count_distinct("i").alias("nh"))
        .filter(F.col("nh") == _BF_K)
        .select("pk", "file_id", F.lit(1).alias("bl"))
    )
    # probe-restrict the truth side BEFORE the broadcast: keys is
    # (files x key-domain)-sized, truth-for-probes is (files x probes)
    truth = (
        keys.join(F.broadcast(probes), keys.o_custkey == probes.pk)
        .select("file_id", "pk", F.lit(1).alias("tr"))
    )
    verdicts = (
        stats.crossJoin(F.broadcast(probes))
        .join(F.broadcast(bloom_hits), ["file_id", "pk"], "left")
        .join(F.broadcast(truth), ["file_id", "pk"], "left")
        .select(
            "file_id",
            "n_rows",
            F.col("pk").between(F.col("min_ck"), F.col("max_ck"))
            .cast("int")
            .alias("mm"),
            F.coalesce(F.col("bl"), F.lit(0)).alias("bl"),
            F.coalesce(F.col("tr"), F.lit(0)).alias("tr"),
        )
    )
    return (
        verdicts.groupBy("file_id")
        .agg(
            F.max("n_rows").cast("bigint").alias("n_rows"),
            F.sum("mm").cast("bigint").alias("minmax_touches"),
            F.sum("bl").cast("bigint").alias("bloom_touches"),
            F.sum("tr").cast("bigint").alias("true_touches"),
        )
        .orderBy("file_id")
    )


@query(
    "schema_evolution_rollup",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1
                THEN ['app', 'store', 'web'][CAST(o_orderkey % 3 + 1 AS INT)]
                ELSE 'unknown' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_c
    FROM orders
    GROUP BY 1 ORDER BY channel
    """,
)
def schema_evolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read path: the orders table was written in two
    snapshots whose schema changed between them (v2 added ``o_channel``;
    stores.ensure_evolution_store). The query reads BOTH snapshots as one
    relation with mergeSchema — Spark reconciles the footers, rows from
    the old snapshot surface NULL for the added column — then coalesces
    the NULLs to 'unknown' and rolls revenue up per channel. The oracle
    derives the identical result from the base orders table, so the gate
    checks the evolution read end-to-end (file listing, footer merge,
    NULL back-fill, cent-exact sums).

    Scale: mergeSchema's cost is FOOTER reconciliation at planning time
    (per file, driver-side) — data-side cost is unchanged columnar scan;
    at 100 TB you bound it by evolving per-partition (new files only) and
    pinning the merged schema in the catalog after the first read. The
    agg is one small-key groupBy with map-side combine."""
    from ..stores import ensure_evolution_store

    root = ensure_evolution_store(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/v1", f"{root}/v2"
    )
    return (
        merged.select(
            F.coalesce(F.col("o_channel"), F.lit("unknown")).alias("channel"),
            F.expr("CAST(o_totalprice * 100 AS BIGINT)").alias("cents"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_c"),
        )
        .orderBy("channel")
    )
