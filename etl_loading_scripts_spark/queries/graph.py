"""Distributed graph analytics over the relational tables.

Training-data and entity-resolution pipelines routinely need graph
primitives on top of tabular joins — link-based importance (PageRank for
source weighting), triangle/clustering structure (community quality,
spam-graph detection). Both are expressible as pure DataFrame join+agg
pipelines — no driver-side adjacency, no RDDs — and both are written in
**exact integer arithmetic** so the DuckDB oracle hash-matches bit-for-bit
(float PageRank sums are order-dependent; integer-scaled ranks are not).

- ``pagerank_two_iter`` — damped PageRank, two synchronous iterations, on
  the bipartite part↔supplier supply graph. Rank mass is integer-scaled
  (1e6 per node) and every division is integer division, so the result is
  engine-portable. Each iteration is one join + one groupBy — the
  standard distributed PageRank shape that runs unchanged on 10^11 edges.
- ``triangle_count_copurchase`` — global triangle census on the
  co-purchase part graph using **degree orientation**: each undirected
  edge is directed from its (degree, id)-smaller endpoint to the larger,
  bounding every out-neighborhood by O(sqrt(m)) — the classic trick that
  makes the two-path join feasible on power-law graphs.

Reference parity: the reference workload is join/aggregate T-SQL (see
SURVEY §2.3–2.4); these are engine extensions a Spark user gets from the
same join machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

#: Integer rank scale: each node starts with this much rank mass.
PR_SCALE = 1_000_000

#: Damping factor as an exact percent (85/100), applied in integer math.
PR_DAMP_PCT = 85

#: Rows returned by the PageRank query (top ranks, id tie-break).
PR_TOP = 20

#: Minimum co-purchase support for a triangle-census edge. Pruning
#: singleton pairs bounds degree before the two-path join (and mirrors
#: what a production spam/community census does to drop noise edges).
TRI_MIN_SUPPORT = 2


_PR_EDGES_DUCK = """
    pairs AS (
        SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
    ),
    edges AS (
        SELECT 'P' || CAST(pk AS VARCHAR) AS src, 'S' || CAST(sk AS VARCHAR) AS dst FROM pairs
        UNION ALL
        SELECT 'S' || CAST(sk AS VARCHAR) AS src, 'P' || CAST(pk AS VARCHAR) AS dst FROM pairs
    ),
    deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
    )
"""


@register(
    "pagerank_two_iter",
    oracle=f"""
    WITH {_PR_EDGES_DUCK},
    r0 AS (
        SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS rank, outdeg FROM deg
    ),
    c1 AS (
        SELECT e.dst AS node, CAST(SUM(r.rank // r.outdeg) AS BIGINT) AS contrib
        FROM edges e JOIN r0 r ON e.src = r.node
        GROUP BY e.dst
    ),
    r1 AS (
        SELECT d.src AS node,
               CAST(({100 - PR_DAMP_PCT} * {PR_SCALE}) // 100
                    + ({PR_DAMP_PCT} * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank,
               d.outdeg
        FROM deg d LEFT JOIN c1 c ON d.src = c.node
    ),
    c2 AS (
        SELECT e.dst AS node, CAST(SUM(r.rank // r.outdeg) AS BIGINT) AS contrib
        FROM edges e JOIN r1 r ON e.src = r.node
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT d.src AS node,
               CAST(({100 - PR_DAMP_PCT} * {PR_SCALE}) // 100
                    + ({PR_DAMP_PCT} * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
        FROM deg d LEFT JOIN c2 c ON d.src = c.node
    )
    SELECT node, rank FROM r2
    ORDER BY rank DESC, node
    LIMIT {PR_TOP}
    """,
    doc=f"Damped PageRank (d=0.{PR_DAMP_PCT}), two synchronous iterations, "
    "on the bipartite part-supplier supply graph; integer-scaled rank mass "
    "so both engines agree exactly. Top-" + str(PR_TOP) + " nodes by rank.",
)
def pagerank_two_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each iteration is edges⋈ranks (shuffle on node id) + one
    groupBy(dst) with map-side partial sums — the canonical distributed
    PageRank step; nothing is collected and the edge list is never
    densified. Rank mass is integer (1e6/node start, integer division
    everywhere) so the result is bit-identical across engines and across
    partitionings — float PageRank sums are shuffle-order-dependent and
    can never hash-match. At 100 TB the edge list would be pre-partitioned
    on src so the per-iteration join is shuffle-free on one side."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    p = F.concat(F.lit("P"), F.col("l_partkey").cast("string"))
    s = F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
    edges = (
        pairs.select(p.alias("src"), s.alias("dst"))
        .unionAll(pairs.select(s.alias("src"), p.alias("dst")))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    base = (100 - PR_DAMP_PCT) * PR_SCALE // 100
    ranks = deg.select("src", F.lit(PR_SCALE).cast("long").alias("rank"), "outdeg")
    for _ in range(2):
        contrib = (
            edges.join(ranks, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank div outdeg")).alias("contrib"))
        )
        ranks = (
            deg.join(contrib, deg["src"] == contrib["node"], "left")
            .select(
                "src",
                (
                    F.lit(base)
                    + F.expr(f"({PR_DAMP_PCT} * coalesce(contrib, 0L)) div 100")
                ).cast("long").alias("rank"),
                "outdeg",
            )
        )
    return (
        ranks.select(F.col("src").alias("node"), "rank")
        .orderBy(F.col("rank").desc(), "node")
        .limit(PR_TOP)
    )


@register(
    "triangle_count_copurchase",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {TRI_MIN_SUPPORT}
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        GROUP BY node
    ),
    ordered AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS lo,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS hi
        FROM und e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM ordered e1
        JOIN ordered e2 ON e1.hi = e2.lo
        JOIN ordered e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    wedge AS (
        SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
           tri.n_triangles,
           wedge.n_wedges,
           CAST(3.0 * tri.n_triangles AS DOUBLE) / CAST(wedge.n_wedges AS DOUBLE)
               AS clustering_coeff
    FROM tri, wedge
    """,
    doc="Global triangle census on the co-purchase part graph (edges = "
    f"part pairs with support >= {TRI_MIN_SUPPORT}) via degree-oriented "
    "two-path join; reports node/edge/triangle/wedge counts and the "
    "global clustering coefficient.",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the census uses **degree orientation** — every undirected
    edge is directed from its (degree, id)-lexicographically smaller
    endpoint to the larger, so each triangle is generated by exactly one
    two-path and each out-neighborhood is O(sqrt(m)) even on power-law
    graphs (the hot-part hub never fans out). The support filter prunes
    noise edges before any self-join. Three shuffles total: pair-gen
    groupBy, degree groupBy, and the two-path join; the wedge count is a
    pure aggregate over degrees. This is the plan GraphFrames' triangle
    count lowers to, written directly in DataFrame ops."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ordered = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
    )
    e1 = ordered.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = ordered.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    e3 = ordered.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("n_wedges"),
    )
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wedges.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            (
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering_coeff"),
        )
    )


#: Seed selector for the BFS reach query: parts whose key is divisible
#: by this are sources. Deterministic, data-independent, and yields a
#: handful of seeds at every scale factor.
REACH_SEED_MOD = 100

#: Minimum co-purchase support for a reach edge (same rationale as the
#: triangle census: prune singleton-pair noise before traversal).
REACH_MIN_SUPPORT = 2


_REACH_EDGES_DUCK = f"""
    items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    und AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {REACH_MIN_SUPPORT}
    ),
    edges AS (
        SELECT u AS src, v AS dst FROM und
        UNION ALL
        SELECT v AS src, u AS dst FROM und
    )
"""


@register(
    "copurchase_reach_3hop",
    oracle=f"""
    WITH {_REACH_EDGES_DUCK},
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    f0 AS (SELECT node FROM nodes WHERE node % {REACH_SEED_MOD} = 0),
    f1 AS (
        SELECT DISTINCT e.dst AS node
        FROM edges e JOIN f0 ON e.src = f0.node
        WHERE e.dst NOT IN (SELECT node FROM f0)
    ),
    f2 AS (
        SELECT DISTINCT e.dst AS node
        FROM edges e JOIN f1 ON e.src = f1.node
        WHERE e.dst NOT IN (SELECT node FROM f0)
          AND e.dst NOT IN (SELECT node FROM f1)
    ),
    f3 AS (
        SELECT DISTINCT e.dst AS node
        FROM edges e JOIN f2 ON e.src = f2.node
        WHERE e.dst NOT IN (SELECT node FROM f0)
          AND e.dst NOT IN (SELECT node FROM f1)
          AND e.dst NOT IN (SELECT node FROM f2)
    ),
    reach AS (
        SELECT 0 AS dist, node FROM f0
        UNION ALL SELECT 1, node FROM f1
        UNION ALL SELECT 2, node FROM f2
        UNION ALL SELECT 3, node FROM f3
    )
    SELECT dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_checksum,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM reach
    GROUP BY dist
    ORDER BY dist
    """,
    doc="Breadth-first reachability, 3 synchronous hops, from the seed "
    f"set (part keys divisible by {REACH_SEED_MOD}) over the co-purchase "
    f"part graph (edges = pairs with support >= {REACH_MIN_SUPPORT}); "
    "per-distance frontier size plus an exact node checksum. The "
    "transitive-closure / recursive-CTE shape (WITH RECURSIVE in the "
    "oracle family) as iterative distributed joins.",
)
def copurchase_reach_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each hop is one equi-join frontier⋈edges (shuffle on node
    id) + DISTINCT + a left-anti against the visited set — the textbook
    distributed BFS step (Pregel's lowering to joins). Nothing touches
    the driver; frontier and visited sets stay DataFrames end-to-end. At
    100 TB the edge list is pre-bucketed on ``src`` so every hop's join
    is shuffle-free on the edge side, and the visited set stays
    partitioned the same way so the anti-join co-locates; the hop count
    is fixed (k=3) so there is no convergence-test collect per round.
    A full-closure variant would localCheckpoint the visited set per
    round exactly like ``dedup_clusters`` does."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= REACH_MIN_SUPPORT)
        .select("u", "v")
    )
    edges = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()

    frontier = nodes.filter(F.col("node") % REACH_SEED_MOD == 0)
    # visited carries (node, dist); reused as the anti-join probe each hop.
    visited = frontier.select("node", F.lit(0).alias("dist"))
    for hop in (1, 2, 3):
        frontier = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        visited = visited.unionAll(
            frontier.select("node", F.lit(hop).alias("dist"))
        )
    return (
        visited.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("long").alias("node_checksum"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
        .orderBy("dist")
    )


# ---------------------------------------------------------------------------
# Label propagation — synchronous min-label community detection
# ---------------------------------------------------------------------------

#: Synchronous label-propagation rounds. Two rounds reach label agreement
#: over 2-hop neighborhoods — enough to merge the bipartite stars into
#: connected-component-shaped communities while keeping the oracle SQL a
#: bounded CTE chain (each extra round is one more join+groupBy on BOTH
#: engines; the Spark loop itself runs any round count unchanged).
LP_ROUNDS = 2

_LP_PRELUDE = """
    pairs AS (
        SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
    ),
    und AS (SELECT pk * 2 AS u, sk * 2 + 1 AS v FROM pairs),
    edges AS (
        SELECT u AS src, v AS dst FROM und
        UNION ALL
        SELECT v AS src, u AS dst FROM und
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    l0 AS (SELECT node, node AS label FROM nodes),
    r1 AS (
        SELECT e.dst AS node, MIN(l.label) AS nbr
        FROM edges e JOIN l0 l ON e.src = l.node GROUP BY 1
    ),
    l1 AS (
        SELECT n.node, LEAST(n.label, COALESCE(r.nbr, n.label)) AS label
        FROM l0 n LEFT JOIN r1 r ON n.node = r.node
    ),
    r2 AS (
        SELECT e.dst AS node, MIN(l.label) AS nbr
        FROM edges e JOIN l1 l ON e.src = l.node GROUP BY 1
    ),
    l2 AS (
        SELECT n.node, LEAST(n.label, COALESCE(r.nbr, n.label)) AS label
        FROM l1 n LEFT JOIN r2 r ON n.node = r.node
    )
"""


@register(
    "label_propagation_communities",
    oracle=f"""
    WITH {_LP_PRELUDE},
    comm AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz FROM l2 GROUP BY 1)
    SELECT sz AS community_size, CAST(COUNT(*) AS BIGINT) AS n_communities
    FROM comm GROUP BY 1
    """,
    doc=f"Synchronous min-label propagation ({LP_ROUNDS} rounds) on the "
    "part↔supplier supply graph; communities are label-agreement classes "
    "and the output is the community-size histogram. Deterministic by "
    "construction: min-label update has no tie-break ambiguity, unlike "
    "frequency-based LPA.",
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each round is one join + one min-groupBy over the edge list — the
    synchronous-LPA dataflow that scales to 10^11 edges (no driver-side
    adjacency, no windows). Min-label (not modal-label) update keeps the
    algorithm a semilattice fold: monotone, order-independent, and
    therefore bit-identical across engines and partitionings; after
    enough rounds it converges to connected components (the same fixpoint
    `dedup_clusters` reaches via large-star/small-star in O(log d)
    rounds — this is the fixed-round, fixed-cost variant for when the
    graph's diameter is known small, e.g. bipartite entity graphs)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    und = pairs.select(
        (F.col("l_partkey") * 2).alias("u"),
        (F.col("l_suppkey") * 2 + 1).alias("v"),
    )
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(LP_ROUNDS):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("src"), F.col("label").alias("nl")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("nl").alias("nbr"))
        )
        labels = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr", "label")).alias("label"),
        )
    comm = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    return comm.groupBy(F.col("sz").alias("community_size")).agg(
        F.count(F.lit(1)).alias("n_communities")
    )
