"""Graph analytics over the co-purchase graph: triangle participation
counts, Adamic-Adar link prediction, and k-core peeling.

The graph is the support-floored co-purchase projection of the order log
(nodes = parts, an edge where two parts are bought together in >= 2
orders — the same edge derivation as `association_rules`), extending the
repo's traversal surface (`bfs_hops_from_customer`,
`bellman_ford_hops`, `pagerank_customer_supplier`) with the two classic
neighborhood-structure primitives: closed-wedge counting and weighted
common-neighbor scoring. Generalizes the reference's link-graph surface
(index.py:158-165 extracts links and classifies them by site) from
per-page link lists to whole-graph structure.

Exactness: triangle counts are pure int64; Adamic-Adar contributions are
per-neighbor trunc(1e6/ln(deg)) integers summed with int64 addition
(order-independent — the per-cell-trunc-then-int-sum idiom shared with
`psi_drift_report` / `gini_feature_scores`), so both engines emit
identical BIGINTs. ln() evaluates identically across engines per the
established entropy idiom.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query


def _stored_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mutual-top-16 co-purchase edge list read from the persisted L9
    store (``basket_edges/`` in ``stores.ensure_copurchase_store``) — the
    ingest-time artifact the ``_from_store`` graph twins share. Identical
    rows to :func:`_edges` by construction (the store writes that exact
    DataFrame once per data signature)."""
    from ..stores import ensure_copurchase_store

    path = ensure_copurchase_store(spark, sf_dir)
    return spark.read.parquet(os.path.join(path, "basket_edges"))

# Shared oracle fragments for the co-purchase graph. _EDGES_RAW_SQL is
# the support->=2 canonical edge list with its weight; _EDGES_SQL caps it
# to the MUTUAL top-16 neighborhood (an edge survives iff each endpoint
# ranks the other in its top 16 by (support desc, id)) — the structural
# guard for the QUADRATIC consumers (wedge joins, supersteps): degree is
# hard-bounded by 16, so wedge cost is bounded whatever the data does.
# History: round 4 used a RELATIVE floor (support >= baskets/7500) for the
# same purpose; it bounded the pathological 10x replica (identical copies
# inflate support 10x over a fixed catalog) but on organically scaled data
# the catalog grows with volume, per-pair support stays ~3, and the
# relative floor left the graph EMPTY past sf0.01 (measured: 0 edges at
# sf0.1). The degree cap bounds the same cost without emptying anything;
# at the sf0.01 driver gate the two graphs are identical (max degree 13).
_EDGES_RAW_SQL = """
        SELECT a.item AS x, b.item AS y, COUNT(*) AS w
        FROM (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
              FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
              FROM lineitem) b
          ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
"""

_EDGES_SQL = f"""
        WITH __raw AS ({_EDGES_RAW_SQL}),
        __sym AS (
            SELECT x AS node, y AS other, w FROM __raw
            UNION ALL
            SELECT y, x, w FROM __raw
        ),
        __rk AS (
            SELECT node, other,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY w DESC, other) AS r
            FROM __sym
        )
        SELECT a.node AS x, a.other AS y
        FROM __rk a JOIN __rk b ON b.node = a.other AND b.other = a.node
        WHERE a.node < a.other AND a.r <= 16 AND b.r <= 16
"""


def _edges(
    spark: SparkSession, sf_dir: str, mutual_top_k: int | None = 16
) -> DataFrame:
    """Canonical (x < y) co-purchase edges: support >= 2, then (by
    default) capped to the mutual top-``mutual_top_k`` neighborhood.

    The basket self-join fans out k(k-1)/2 per order with k bounded by
    order width (<= 7 lineitems here) — per-row constant work keyed on
    the basket, never a cross product. The mutual-kNN cap hard-bounds
    every node's degree, which bounds the quadratic wedge-join /
    superstep cost downstream structurally (see _EDGES_SQL history note:
    the round-4 relative support floor achieved the bound only by
    emptying organically scaled graphs). Linear-cost consumers (the walk
    sampler) pass ``mutual_top_k=None`` for the raw floored graph."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    raw = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
    )
    if mutual_top_k is None:
        return raw.select("x", "y")
    from pyspark.sql import Window as W

    sym = raw.select(
        F.col("x").alias("node"), F.col("y").alias("other"), "w"
    ).unionAll(raw.select(F.col("y").alias("node"), F.col("x").alias("other"), "w"))
    rk = sym.withColumn(
        "r",
        F.row_number().over(W.partitionBy("node").orderBy(F.desc("w"), F.asc("other"))),
    )
    # mutual check via ONE pair-keyed aggregation (round-10 optimization):
    # each unordered pair appears exactly twice in the ranked symmetric
    # view (once per direction), so "both endpoints rank each other in
    # their top k" <=> both directional rows survive the rank filter <=>
    # the pair-keyed count of surviving rows is 2. The previous
    # (node, other)-keyed self-join of the ranked view shuffled it twice
    # and sorted both sides; this groups the filtered view once.
    return (
        rk.filter(F.col("r") <= mutual_top_k)
        .groupBy(
            F.least("node", "other").alias("x"),
            F.greatest("node", "other").alias("y"),
        )
        .agg(F.count("*").alias("__both"))
        .filter(F.col("__both") == 2)
        .select("x", "y")
    )


# shared by triangle_participation and its _from_store twin
_TRIANGLE_ORACLE = f"""
    WITH edges AS ({_EDGES_SQL}
    ), tri AS (
        SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM edges e1
        JOIN edges e2 ON e2.x = e1.y
        JOIN edges e3 ON e3.x = e1.x AND e3.y = e2.y
    ), nodes AS (
        SELECT a AS part FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY part
    ORDER BY n_triangles DESC, part
    LIMIT 50
    """


def _triangle_report(edges: DataFrame) -> DataFrame:
    """Oriented wedge-close tail shared by triangle_participation and its
    _from_store twin."""
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.x") == F.col("e1.y"))
        .join(
            e3,
            (F.col("e3.x") == F.col("e1.x"))
            & (F.col("e3.y") == F.col("e2.y")),
        )
        .select(
            F.col("e1.x").alias("a"),
            F.col("e1.y").alias("b"),
            F.col("e2.y").alias("c"),
        )
    )
    nodes = tri.select(F.expr("stack(3, a, b, c) AS (part)"))
    return (
        nodes.groupBy("part")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "part")
        .limit(50)
    )


@query("triangle_participation", oracle=_TRIANGLE_ORACLE)
def triangle_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the co-purchase graph: for
    every part, how many closed triples it sits in (top-50) — the local
    clustering signal behind community/cohesion analytics.

    Scale: edges are stored id-oriented (x < y), so a triangle a<b<c is
    enumerated exactly once as the wedge (a,b)+(b,c) closed by the
    equi-join probe (a,c) — the standard oriented wedge-close that keeps
    fan-out at sum(outdeg²) instead of the unoriented sum(deg²); the
    production knob at 100 TB is re-orienting by (degree, id) so hubs get
    small out-degrees, identical output. Every join is an equi-join on
    node or (node, node) pair keys — co-partitioned shuffles, no
    cartesian. The support floor bounds the edge list; per-node counts
    come from a stack() explode of the (small) triangle set. The edge
    list is derived once and localCheckpoint'd (node-dimension sized)
    before the wedge-close joins fan it out three ways — without the pin
    the basket self-join re-executes per branch (measured 48 parquet
    scans in the expanded plan)."""
    return _triangle_report(_edges(spark, sf_dir).localCheckpoint())


@query("triangle_participation_from_store", oracle=_TRIANGLE_ORACLE)
def triangle_participation_from_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`triangle_participation` over the persisted L9 co-purchase store:
    the basket self-join + mutual-top-16 ranking that derives the edge
    list (the fact-sized prefix every graph query shares) ran once at
    ingest; the query is the wedge-close joins over the edge-dimension
    parquet relation only. Identical oracle to the self-contained twin
    (the store caches the deterministic edge derivation)."""
    return _triangle_report(_stored_edges(spark, sf_dir))


# shared by adamic_adar_links and its _from_store twin
_ADAMIC_ORACLE = f"""
    WITH edges AS ({_EDGES_SQL}
    ), und AS (
        SELECT x AS n, y AS nb FROM edges
        UNION ALL
        SELECT y, x FROM edges
    ), deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY n
    ), wedge AS (
        SELECT a.n AS u, b.n AS v, a.nb AS w
        FROM und a JOIN und b ON a.nb = b.nb AND a.n < b.n
    ), contrib AS (
        SELECT wg.u, wg.v,
               CAST(trunc(1e6 / ln(CAST(deg.d AS DOUBLE))) AS BIGINT)
                   AS aa_e6
        FROM wedge wg JOIN deg ON wg.w = deg.n
        WHERE NOT EXISTS (
            SELECT 1 FROM edges e WHERE e.x = wg.u AND e.y = wg.v
        )
    )
    SELECT u AS part_u, v AS part_v,
           CAST(COUNT(*) AS BIGINT) AS common_neighbors,
           CAST(SUM(aa_e6) AS BIGINT) AS aa_score_e6
    FROM contrib GROUP BY u, v
    ORDER BY aa_score_e6 DESC, part_u, part_v
    LIMIT 50
    """


def _adamic_adar_report(edges: DataFrame) -> DataFrame:
    """Wedge-enumeration tail shared by adamic_adar_links and its
    _from_store twin."""
    und = edges.select(F.col("x").alias("n"), F.col("y").alias("nb")).unionAll(
        edges.select(F.col("y").alias("n"), F.col("x").alias("nb"))
    )
    deg = und.groupBy(F.col("n").alias("w")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    a, b = und.alias("a"), und.alias("b")
    wedge = a.join(
        b, (F.col("a.nb") == F.col("b.nb")) & (F.col("a.n") < F.col("b.n"))
    ).select(
        F.col("a.n").alias("u"), F.col("b.n").alias("v"), F.col("a.nb").alias("w")
    )
    contrib = (
        wedge.join(
            edges.withColumnRenamed("x", "u").withColumnRenamed("y", "v"),
            ["u", "v"],
            "left_anti",
        )
        .join(F.broadcast(deg), "w")
        .select(
            "u",
            "v",
            F.expr("CAST(1e6 / ln(CAST(d AS DOUBLE)) AS BIGINT)").alias(
                "aa_e6"
            ),
        )
    )
    return (
        contrib.groupBy(F.col("u").alias("part_u"), F.col("v").alias("part_v"))
        .agg(
            F.count("*").cast("bigint").alias("common_neighbors"),
            F.sum("aa_e6").cast("bigint").alias("aa_score_e6"),
        )
        .orderBy(F.desc("aa_score_e6"), "part_u", "part_v")
        .limit(50)
    )


@query("adamic_adar_links", oracle=_ADAMIC_ORACLE)
def adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-purchase graph: for every
    NON-adjacent part pair, sum 1/ln(deg(w)) over their common neighbors
    w — rare shared neighbors count more — and report the top-50
    predicted links.

    Scale: wedges are enumerated from the undirected adjacency list by a
    self-equi-join on the shared neighbor — fan-out deg(w)² per node, and
    deg is STRUCTURALLY bounded at mutual_top_k = 16 because the input is
    ``_edges``' mutual top-16 graph (an edge survives only if EACH
    endpoint ranks the other ≤ 16, so no node keeps more than 16
    incident edges), making wedge volume ≤ 16²/2 per node at any corpus
    size — the bound is already implemented, not a deferred 100 TB knob. The degree table is
    node-dimension sized and broadcast; existing edges are removed with
    an anti-join on the canonical (u, v) pair key. Per-wedge
    contributions are trunc-scaled BEFORE the int64 sum, so aggregation
    order cannot perturb the result. The edge list is derived once and
    localCheckpoint'd (node-dimension sized) before the report fans it
    out into und/deg/wedge/anti-join branches — without the pin the
    basket self-join re-executes per branch (measured 112 parquet scans
    in the expanded plan)."""
    return _adamic_adar_report(_edges(spark, sf_dir).localCheckpoint())


@query("adamic_adar_links_from_store", oracle=_ADAMIC_ORACLE)
def adamic_adar_links_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`adamic_adar_links` over the persisted L9 co-purchase store: the
    edge derivation ran once at ingest, so the plan is the wedge
    self-join + broadcast degree join over the edge-dimension parquet
    relation — the degree bound (mutual top-16) is baked into the stored
    rows. Identical oracle to the self-contained twin."""
    return _adamic_adar_report(_stored_edges(spark, sf_dir))


def _kcore_oracle(k: int = 3, rounds: int = 4) -> str:
    """Unrolled k-core peel oracle: one alive-set CTE per round (the
    fixed round bound makes iteration plain SQL — the bellman_ford_hops
    discipline)."""
    parts = [
        f"""
    WITH edges AS ({_EDGES_SQL}
    ), und AS (
        SELECT x AS n, y AS nb FROM edges
        UNION ALL
        SELECT y, x FROM edges
    ), a0 AS (
        SELECT DISTINCT n FROM und
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", a{r} AS (
        SELECT u.n FROM und u
        JOIN a{r - 1} s ON u.n = s.n
        JOIN a{r - 1} t ON u.nb = t.n
        GROUP BY u.n HAVING COUNT(*) >= {k}
    )"""
        )
    parts.append(
        f"""
    SELECT u.n AS part, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM und u
    JOIN a{rounds} s ON u.n = s.n
    JOIN a{rounds} t ON u.nb = t.n
    GROUP BY u.n HAVING COUNT(*) >= {k}
    ORDER BY part"""
    )
    return "".join(parts)


@query("kcore_membership", oracle=_kcore_oracle())
def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph by 4 synchronous peel rounds: each
    round recomputes every surviving node's degree over the surviving
    set and drops nodes below 3; the output is the round-5 survivor set
    with its within-core degree — the density-core extractor that
    separates structurally embedded products from tail attachments
    (completing the iterative-graph family: bfs_hops_from_customer,
    bellman_ford_hops, pagerank_customer_supplier).

    The fixed round bound is what makes the semantics engine-portable
    (unrolled CTEs, no recursion) — the same contract as
    bellman_ford_hops' hop bound; full convergence is the same loop run
    to a fixed point. Scale: each round is two node-keyed equi-joins of
    the (broadcastable, node-dimension) alive set against the edge list
    plus one map-side-combined degree count — the Pregel vote-to-halt
    superstep; the edge list is built once, localCheckpoint'd, and
    reused, and the alive set shrinks monotonically. The RELATIVE
    support floor upstream keeps degree distributions — and thus peel
    work — scale-invariant."""
    edges = _edges(spark, sf_dir)
    und = (
        edges.select(F.col("x").alias("n"), F.col("y").alias("nb"))
        .unionAll(edges.select(F.col("y").alias("n"), F.col("x").alias("nb")))
        .localCheckpoint()  # reused every round — cut the lineage
    )
    alive = und.select("n").distinct()
    for _ in range(4):
        alive = (
            und.join(alive, "n")
            .join(alive.withColumnRenamed("n", "nb"), "nb")
            .groupBy("n")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= 3)
            .select("n")
            .localCheckpoint()
        )
    return (
        und.join(alive, "n")
        .join(alive.withColumnRenamed("n", "nb"), "nb")
        .groupBy(F.col("n").alias("part"))
        .agg(F.count("*").cast("bigint").alias("core_deg"))
        .filter(F.col("core_deg") >= 3)
        .orderBy("part")
    )


def _label_prop_oracle(rounds: int = 4, n_seeds: int = 8) -> str:
    """Unrolled seeded-label-propagation oracle: one frontier CTE per
    round (the bellman_ford_hops / kcore unroll discipline). Each round a
    node adopts the lexicographically smallest (dist, label) among its
    own state and every neighbor's state + 1 hop."""
    parts = [
        f"""
    WITH edges AS ({_EDGES_SQL}
    ), und AS (
        SELECT x AS n, y AS nb FROM edges
        UNION ALL
        SELECT y, x FROM edges
    ), deg AS (
        SELECT n, COUNT(*) AS d FROM und GROUP BY n
    ), seeds AS (
        SELECT n FROM deg ORDER BY d DESC, n LIMIT {n_seeds}
    ), l0 AS (
        SELECT n, n AS label, 0 AS dist FROM seeds
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", c{r} AS (
        SELECT n, label, dist FROM l{r - 1}
        UNION ALL
        SELECT u.n, l.label, l.dist + 1
        FROM und u JOIN l{r - 1} l ON u.nb = l.n
    ), l{r} AS (
        SELECT n, label, dist FROM (
            SELECT n, label, dist,
                   ROW_NUMBER() OVER (PARTITION BY n
                                      ORDER BY dist, label) AS rn
            FROM c{r}
        ) WHERE rn = 1
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(n) AS BIGINT) AS min_member,
           CAST(MAX(dist) AS BIGINT) AS max_dist
    FROM l{rounds}
    GROUP BY label
    ORDER BY label"""
    )
    return "".join(parts)


def _label_prop_report(edges: DataFrame) -> DataFrame:
    """Superstep tail shared by label_propagation_seeded and its
    _from_store twin."""
    und = (
        edges.select(F.col("x").alias("n"), F.col("y").alias("nb"))
        .unionAll(edges.select(F.col("y").alias("n"), F.col("x").alias("nb")))
        .localCheckpoint()
    )
    deg = und.groupBy("n").agg(F.count("*").alias("d"))
    seeds = (
        deg.orderBy(F.desc("d"), "n")
        .limit(8)
        .select("n", F.col("n").alias("label"), F.lit(0).alias("dist"))
    )
    state = seeds.localCheckpoint()
    for _ in range(4):
        hop = (
            und.join(
                state.select(F.col("n").alias("nb"), "label", "dist"), "nb"
            )
            .select("n", "label", (F.col("dist") + 1).alias("dist"))
        )
        state = (
            state.unionAll(hop)
            .groupBy("n")
            .agg(F.min(F.struct("dist", "label")).alias("m"))
            .select("n", F.col("m.label").alias("label"), F.col("m.dist").alias("dist"))
            .localCheckpoint()
        )
    return (
        state.groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.min("n").cast("bigint").alias("min_member"),
            F.max("dist").cast("bigint").alias("max_dist"),
        )
        .orderBy("label")
    )


@query("label_propagation_seeded", oracle=_label_prop_oracle())
def label_propagation_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded label propagation (multi-source BFS labeling) over the
    co-purchase graph: the 8 highest-degree parts seed communities with
    their own ids; 4 synchronous rounds later every reached node carries
    the label of its NEAREST seed (ties: smallest label) — the
    semi-supervised community assignment that complements the
    unsupervised families (connected components, k-core, triangles).
    Output is the community roster: label, member count, smallest
    member, eccentricity of the reached set.

    Determinism: the update rule is a lexicographic MIN over (dist,
    label) pairs — associative/commutative, so partition order cannot
    perturb the fixed point; the round bound is part of the semantics
    (same contract as bellman_ford_hops).

    Scale: a Pregel superstep per round — candidates = current states
    UNION edge-join(states), reduced by a node-keyed min-of-struct
    (partial map-side combine; no window, no row_number). The labeled
    frontier is at most node-dimension sized; edges are built once and
    localCheckpoint'd; each round is one co-partitioned equi-join +
    one combine-enabled groupBy. At 100 TB the same loop runs over the
    bucketed edge store (DEPLOY L1) with zero exchanges per round."""
    return _label_prop_report(_edges(spark, sf_dir))


@query("label_propagation_seeded_from_store", oracle=_label_prop_oracle())
def label_propagation_seeded_from_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`label_propagation_seeded` over the persisted L9 co-purchase
    store: the supersteps' cost is plan depth, but the edge derivation
    (basket self-join + mutual-kNN ranking) still dominated the wall —
    from the store it is one parquet scan, and the round loop starts
    immediately. Identical oracle to the self-contained twin."""
    return _label_prop_report(_stored_edges(spark, sf_dir))


def _walk_oracle_sql(n_walks: int = 2, n_steps: int = 4) -> str:
    """Unrolled-CTE twin of the seeded walk loop: the same md5-derived
    step choice (('0x' || 15 hex chars)::BIGINT mod degree) replayed per
    step — the same unroll discipline as the k-means/BFS/label-propagation
    oracles."""
    hash_expr = (
        "('0x' || substr(md5(CAST(s.start AS VARCHAR) || ':' ||"
        " CAST(s.wid AS VARCHAR) || ':' || '{t}' || ':' ||"
        " CAST(s.cur AS VARCHAR)), 1, 15))::BIGINT"
    )
    steps = []
    prev = "s0"
    for t in range(1, n_steps + 1):
        steps.append(f"""
    s{t} AS (
        SELECT s.start, s.wid, a.nbr AS cur, {t} AS step
        FROM {prev} s
        JOIN deg d ON d.node = s.cur
        JOIN idx a ON a.node = s.cur
         AND a.i = ({hash_expr.format(t=t)}) % d.deg + 1
    )""")
        prev = f"s{t}"
    union = "\n    UNION ALL\n    ".join(
        f"SELECT start, wid, step, cur FROM s{t}" for t in range(n_steps + 1)
    )
    return f"""
    WITH e AS (SELECT x, y FROM ({_EDGES_RAW_SQL})),
    adj AS (
        SELECT x AS node, y AS nbr FROM e
        UNION ALL
        SELECT y, x FROM e
    ),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY node),
    idx AS (
        SELECT node, nbr,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY nbr) AS i
        FROM adj
    ),
    s0 AS (
        SELECT node AS start, CAST(w.w AS INT) AS wid, node AS cur, 0 AS step
        FROM deg, (SELECT unnest(range({n_walks})) AS w) w
    ),{",".join(steps)[1:]}
    SELECT start AS start_node, wid AS walk_id, CAST(step AS INT) AS step,
           cur AS node
    FROM ({union})
    """


@query("seeded_random_walks", oracle=_walk_oracle_sql())
def seeded_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style walk-corpus generation (Perozzi et al. 2014): two
    4-step walks from every node of the support-floored co-purchase
    graph, emitted as (start_node, walk_id, step, node) rows — the
    sampling stage that turns a graph into sequence training data for
    skip-gram embedding training (the embedding fit itself is out of
    scope; the walks are the distributed work). The 'random' choice is a
    seeded hash: step t picks neighbor index md5(start:walk:t:cur) mod
    degree — uniform per step yet fully deterministic, so the walk
    corpus is bit-reproducible across engines and partitionings, exactly
    the property a reproducible training pipeline needs from its
    samplers (same discipline as the seeded Bernoulli/priority samplers).

    Scale shape: per step, the frontier joins the degree table and the
    indexed adjacency on the int node key — walk count x 1 row each, no
    fan-out; the per-node neighbor index is a node-partitioned window
    (frames = one node's neighbors, degree-bounded). The driver loop
    holds only DataFrames (localCheckpoint-pinned adjacency, like the
    BFS/label-propagation loops); steps are sequential by nature, rounds
    = walk length. The edge list is the RAW support->=2 graph (no mutual
    degree cap): walk cost is linear in edges — one row per walk per
    step, never a wedge join — so the quadratic consumers' cap is not
    needed, and per-step work stays O(1) per walk whatever the degree."""
    e = _edges(spark, sf_dir, mutual_top_k=None)
    from pyspark.sql import Window as W

    adj = (
        e.select(F.col("x").alias("node"), F.col("y").alias("nbr"))
        .unionAll(e.select(F.col("y").alias("node"), F.col("x").alias("nbr")))
        .localCheckpoint()
    )
    deg = adj.groupBy("node").agg(F.count("*").cast("bigint").alias("deg"))
    idx = adj.withColumn(
        "i", F.row_number().over(W.partitionBy("node").orderBy("nbr"))
    ).localCheckpoint()
    walks = F.explode(F.expr("sequence(0, 1)")).alias("wid")
    state = deg.select(
        F.col("node").alias("start"), walks, F.col("node").alias("cur")
    ).withColumn("step", F.lit(0))
    out = [state]
    for t in range(1, 5):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("start"), F.col("wid"), F.lit(t), F.col("cur"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        nxt = (
            out[-1]
            .join(deg.select(F.col("node").alias("cur"), "deg"), "cur")
            .withColumn("__pick", (h % F.col("deg")) + 1)
            .join(
                idx.select(
                    F.col("node").alias("cur"), F.col("i").alias("__pick"),
                    F.col("nbr").alias("__next"),
                ),
                ["cur", "__pick"],
            )
            .select(
                "start", "wid", F.col("__next").alias("cur"), F.lit(t).alias("step")
            )
            .localCheckpoint()
        )
        out.append(nxt)
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res.select(
        F.col("start").alias("start_node"),
        F.col("wid").cast("int").alias("walk_id"),
        F.col("step").cast("int").alias("step"),
        F.col("cur").alias("node"),
    )


# --- HITS hubs & authorities ---------------------------------------------
# Fixed-point scale for the per-iteration sum-normalization. 1e9 keeps
# every product under int64 up to ~9e9 edges per authority (a_raw * SCALE
# <= 2^63); past that the same plan swaps the score columns to
# DECIMAL(38,0) — the ab_test_welch overflow discipline.
_HITS_SCALE = 10**9


def _hits_oracle_sql(scale: int = _HITS_SCALE, top_k: int = 20) -> str:
    """Unrolled DuckDB twin of the HITS mutual recurrence (authority <-
    sum of neighbor hub scores, hub <- sum of neighbor authority scores),
    sum-normalized to ``scale`` with floor division after every step —
    the pagerank_fixed_point unroll discipline applied to the bipartite
    update."""
    return f"""
    WITH pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    a1 AS (  -- h0 = 1 for every customer, so a1 is the supplier degree
        SELECT s, CAST(COUNT(*) AS BIGINT) AS raw FROM pairs GROUP BY s
    ),
    a1n AS (
        SELECT s, CAST((raw * {scale}) // (SELECT SUM(raw) FROM a1) AS BIGINT)
                   AS score
        FROM a1
    ),
    h1 AS (
        SELECT p.c, CAST(SUM(a.score) AS BIGINT) AS raw
        FROM pairs p JOIN a1n a ON a.s = p.s GROUP BY p.c
    ),
    h1n AS (
        SELECT c, CAST((raw * {scale}) // (SELECT SUM(raw) FROM h1) AS BIGINT)
                   AS score
        FROM h1
    ),
    a2 AS (
        SELECT p.s, CAST(SUM(h.score) AS BIGINT) AS raw
        FROM pairs p JOIN h1n h ON h.c = p.c GROUP BY p.s
    ),
    a2n AS (
        SELECT s, CAST((raw * {scale}) // (SELECT SUM(raw) FROM a2) AS BIGINT)
                   AS score
        FROM a2
    ),
    tops AS (
        (SELECT 'authority' AS role, CAST(s AS BIGINT) AS node, score
         FROM a2n ORDER BY score DESC, s LIMIT {top_k})
        UNION ALL
        (SELECT 'hub', CAST(c AS BIGINT), score
         FROM h1n ORDER BY score DESC, c LIMIT {top_k})
    )
    SELECT role, node, score AS score_e9 FROM tops
    """


def hits_scores(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The h0 -> a1 -> h1 -> a2 half-steps over a bipartite edge list
    ``pairs(c, s)``; returns (hub scores ``(c, score)``, authority scores
    ``(s, score)``), each sum-normalized to _HITS_SCALE. Separated from
    the query so the recurrence is unit-testable on a toy graph."""

    def _normalize(raw: DataFrame, key: str) -> DataFrame:
        tot = raw.agg(F.sum("raw").alias("tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            key, F.expr(f"CAST(raw * {_HITS_SCALE} AS BIGINT) DIV tot").alias("score")
        )

    a1 = pairs.groupBy("s").agg(F.count("*").cast("bigint").alias("raw"))
    a1n = _normalize(a1, "s")
    h1 = (
        pairs.join(F.broadcast(a1n), "s")
        .groupBy("c")
        .agg(F.sum("score").cast("bigint").alias("raw"))
    )
    h1n = _normalize(h1, "c")
    a2 = (
        pairs.join(F.broadcast(h1n), "c")
        .groupBy("s")
        .agg(F.sum("score").cast("bigint").alias("raw"))
    )
    a2n = _normalize(a2, "s")
    return h1n, a2n


@query("hits_hub_authority", oracle=_hits_oracle_sql())
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) hubs-and-authorities over the bipartite
    customer->supplier co-order graph: customers are hubs, suppliers are
    authorities; authority score = sum of connected hub scores, hub score
    = sum of connected authority scores, iterated h0 -> a1 -> h1 -> a2
    with exact integer sum-normalization (score * SCALE DIV total) after
    every step. Complements `pagerank_customer_supplier` — PageRank ranks
    by circulating mass on the symmetrized graph, HITS keeps the two node
    roles distinct, which is the natural readout for a bipartite relation
    (a supplier is 'authoritative' because well-scored customers buy from
    it, not because other suppliers do). Output: top 20 per role.

    Exactness: every step is int64 (sums of normalized scores are bounded
    STRUCTURALLY by SCALE: each normalized frame sums to <= SCALE, and a
    node's inflow is a subset-sum of one such frame), floor division on
    positive values, ties broken by node id — both engines emit identical
    BIGINTs. Generalizes the reference's per-page link counting
    (index.py:158-165) to global link analysis, same family as the
    PageRank op.

    Scale: the fact scan happens ONCE (distinct (c, s) pairs); each
    half-step is a fact x broadcast-dim equi-join (the score frame is
    node-dimension sized) feeding a map-side-combinable sum keyed on the
    other side's id; the normalizers are single-row aggregates broadcast
    back. No window, no iteration state wider than a dimension. Top-20
    plans as TakeOrderedAndProject (per-partition heaps, k rows to the
    driver). At 100 TB: identical loop over the bucketed pair store
    (DEPLOY L1), score frames stay dimension-sized."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    h1n, a2n = hits_scores(pairs)
    auth = (
        a2n.orderBy(F.desc("score"), "s")
        .limit(20)
        .select(
            F.lit("authority").alias("role"),
            F.col("s").cast("bigint").alias("node"),
            F.col("score").alias("score_e9"),
        )
    )
    hubs = (
        h1n.orderBy(F.desc("score"), "c")
        .limit(20)
        .select(
            F.lit("hub").alias("role"),
            F.col("c").cast("bigint").alias("node"),
            F.col("score").alias("score_e9"),
        )
    )
    return auth.unionByName(hubs).orderBy(
        "role", F.desc("score_e9"), "node"
    )
