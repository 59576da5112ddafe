"""Graph analytics — iterative rank propagation (round 6, fourth
operator block).

r18 (triangles) and q74/q87/q92 (connected components) cover the
combinatorial side of graph work; this module adds the numeric side:
PageRank over the customer↔supplier trade graph. The engine shape is
Pregel-lite — rank state joined to a static edge list once per
superstep — the canonical distributed formulation Spark expresses
directly as join+groupBy per iteration.

Determinism discipline (the repo's D-rules): ranks are FIXED-POINT
BIGINT micro-mass, never doubles. Every step is integer arithmetic —
``rank div deg`` for contributions, ``(15*base + 85*inc) div 100`` for
damping — so Spark and DuckDB agree bit-for-bit regardless of float
summation order, and the oracle is hash-exact with no rounding-margin
analysis. (Floor division leaks a few units of mass per step; the leak
is part of the defined algorithm, identically computed by both
engines.)

Provenance: EXT (general batch-engine surface; the reference spec at
/root/reference/README.md has no graph machinery). Name sorts after
q50 — the driver's CORRECTNESS window stays q01-q50 (STATUS.md
name-freeze).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.io import load_table
from . import register

_MASS = 10**12  # total rank mass, in integer micro-units
_ITERS = 5
_TOPK = 25


def _state_join_strategy(n_nodes: int, broadcast_budget_bytes: int):
    """Size router for the per-superstep rank-state join: broadcast
    while the node-sized state fits the budget (node string + 2
    bigints ≈ 64 B/row conservatively), else shuffle-hash keyed on
    src — a billion-node broadcast is a guaranteed driver/executor
    OOM (VERDICT r7). Same shape as r52's frontier router."""
    if n_nodes * 64 <= broadcast_budget_bytes:
        return F.broadcast
    return lambda df: df.hint("shuffle_hash")


def _pagerank_sql() -> str:
    """Chained-CTE oracle: the K supersteps unrolled (standard SQL has
    no aggregate-in-recursive-CTE, so unrolling IS the portable form)."""
    step = """
    {out} AS (
        SELECT d.node, d.deg,
               (15 * (SELECT base FROM n) + 85 * COALESCE(m.inc, 0)) // 100
                   AS rank
        FROM deg d
        LEFT JOIN (
            SELECT e.dst AS node, SUM(r.rank // r.deg) AS inc
            FROM edges e JOIN {inp} r ON e.src = r.node
            GROUP BY 1
        ) m USING (node)
    )"""
    chain = ",".join(
        step.format(out=f"i{k}", inp=("r0" if k == 1 else f"i{k-1}"))
        for k in range(1, _ITERS + 1)
    )
    return f"""
    WITH pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT 'C' || CAST(c AS VARCHAR) AS src,
               'S' || CAST(s AS VARCHAR) AS dst FROM pairs
        UNION ALL
        SELECT 'S' || CAST(s AS VARCHAR), 'C' || CAST(c AS VARCHAR)
        FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
    n AS (SELECT CAST({_MASS} AS BIGINT) // COUNT(*) AS base FROM deg),
    r0 AS (SELECT node, deg, (SELECT base FROM n) AS rank FROM deg),
    {chain}
    SELECT node, CAST(rank AS BIGINT) AS rank
    FROM i{_ITERS}
    ORDER BY rank DESC, node
    LIMIT {_TOPK}
    """


@register(
    "r23_pagerank",
    _pagerank_sql(),
    doc="PageRank (damping 0.85, 5 supersteps, fixed-point BIGINT "
    "mass) over the symmetric customer↔supplier trade graph "
    "(distinct order-derived pairs). Spark runs the Pregel shape: a "
    "static localCheckpointed edge list joined to the rank state "
    "each superstep, contributions grouped on dst, LEFT-joined back "
    "to the node list so isolated-in-degree nodes keep damped base "
    "mass. All-integer arithmetic makes the result hash-exact vs the "
    "unrolled-CTE oracle with no float-order caveats. At 100 TB: "
    "edges hash-partition on src once and stay put; each superstep "
    "shuffles only the node-sized rank state — broadcast ONLY when "
    "the node count fits a size budget (billion-node state would OOM "
    "the driver), else a shuffle-hash join keyed on src, the same "
    "router r52 uses for its frontier.",
)
def r23_pagerank(
    spark: SparkSession,
    sf_dir: str,
    broadcast_budget_bytes: int = 64 << 20,
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cnode = F.concat(F.lit("C"), F.col("c").cast("string"))
    snode = F.concat(F.lit("S"), F.col("s").cast("string"))
    edges = (
        pairs.select(cnode.alias("src"), snode.alias("dst"))
        .unionAll(pairs.select(snode.alias("src"), cnode.alias("dst")))
        # consumed once per superstep: materialize the join pipeline
        # once (the q74/r18 localCheckpoint discipline). A round-16
        # repartition("dst") before this checkpoint (map-side partial
        # aggregation for the per-superstep groupBy(dst)) was REVERTED
        # in round 17: cold min-of-2 A/B pairs measured it a tie at
        # sf0.1 (3.66 vs 3.65 s) and a small loss at sf1 (11.33/11.35
        # vs 10.94/11.40 s) — the upfront full shuffle of the edge
        # table never pays for itself, confirming the driver's r16
        # measurement (0.92x).
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)  # node-sized; read every superstep
    )
    n_nodes = deg.count()  # driver-side scalar: node count, bounded
    base = _MASS // n_nodes
    _hinted = _state_join_strategy(n_nodes, broadcast_budget_bytes)
    ranks = deg.select("node", "deg", F.lit(base).cast("bigint").alias("rank"))
    for _ in range(_ITERS):
        inc = (
            edges.join(_hinted(ranks), edges.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            deg.join(inc, "node", "left")
            .select(
                "node",
                "deg",
                F.expr(
                    f"(CAST({15 * base} AS BIGINT)"
                    " + 85 * coalesce(inc, CAST(0 AS BIGINT))) div 100"
                ).alias("rank"),
            )
            # truncate lineage per superstep: without this, iteration
            # k's broadcast re-executes supersteps 1..k-1 (quadratic)
            .localCheckpoint(eager=True)
        )
    return (
        ranks.select("node", F.col("rank").cast("bigint").alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(_TOPK)
    )


_BFS_HOPS = 6  # fixed superstep budget == oracle recursion depth cap


def _bfs_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT 'C' || CAST(c AS VARCHAR) AS src,
               'S' || CAST(s AS VARCHAR) AS dst FROM pairs
        UNION ALL
        SELECT 'S' || CAST(s AS VARCHAR), 'C' || CAST(c AS VARCHAR)
        FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, d) AS (
        SELECT 'C' || CAST((SELECT MIN(c) FROM pairs) AS VARCHAR), 0
        UNION
        SELECT e.dst, w.d + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.d < {_BFS_HOPS}
    ),
    dist AS (SELECT node, MIN(d) AS hops FROM walk GROUP BY node)
    SELECT CAST(COALESCE(dist.hops, -1) AS INT) AS hops,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM nodes LEFT JOIN dist USING (node)
    GROUP BY 1
    ORDER BY 1
    """


@register(
    "r52_bfs_hops",
    _bfs_sql(),
    doc="BFS hop-distance histogram from the lowest-keyed customer "
    "over the same symmetric trade graph as r23 — completing the "
    "graph family's fourth algorithm class (components q74 / "
    "PageRank r23 / triangles r18 / traversal r52). Spark runs "
    "frontier expansion: only nodes discovered in superstep k-1 "
    "expand in superstep k (each superstep joins the edge list to "
    "the FRONTIER, not the full distance state), min-merged into the "
    "distance state, localCheckpoint per round; the superstep budget "
    "equals the oracle CTE's depth cap, so both relations are "
    "identical by construction — hops are small integers, nothing to "
    "round. Unreached nodes surface as hops = -1 (the bipartite "
    "graph's isolated spokes), COUNTED, not dropped. At 100 TB: "
    "edges hash-partition once; each superstep shuffles only the "
    "frontier (≤ nodes), and the fixed budget bounds the iteration "
    "regardless of data.",
)
def r52_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cnode = F.concat(F.lit("C"), F.col("c").cast("string"))
    snode = F.concat(F.lit("S"), F.col("s").cast("string"))
    edges = (
        pairs.select(cnode.alias("src"), snode.alias("dst"))
        .unionAll(pairs.select(snode.alias("src"), cnode.alias("dst")))
        # A round-16 repartition("src") before this checkpoint was
        # REVERTED in round 17: cold min-of-2 A/B pairs measured the
        # plain checkpoint FASTER at sf1 (11.29/12.99 vs 14.36/19.52 s)
        # and only ~0.15 s slower at sf0.1 — the superstep's
        # shuffle-hash join re-exchanges the edges each round
        # regardless, so the upfront full shuffle of the edge table
        # buys nothing, confirming the driver's r16 measurement
        # (0.87x).
        .localCheckpoint(eager=True)  # consumed once per superstep
    )
    # nodes feeds dist exactly once — dist's own eager checkpoint below
    # materializes it, so a separate nodes checkpoint is pure overhead
    nodes = edges.select(F.col("src").alias("node")).distinct()
    # bounded-collect: ONE scalar — the BFS source key
    src_key = pairs.agg(F.min("c")).collect()[0][0]
    source = f"C{src_key}"
    dist = nodes.select(
        "node",
        F.when(F.col("node") == source, F.lit(0)).cast("int").alias("hops"),
    ).localCheckpoint(eager=True)
    # The frontier is a FILTER over the checkpointed distance state —
    # never materialized separately (round-16: the per-round frontier
    # checkpoint + isEmpty job were two extra actions per superstep
    # that re-scanned data the dist checkpoint already holds; the
    # convergence check below rides the same count job either way).
    frontier = dist.where(F.col("hops") == 0)
    for k in range(1, _BFS_HOPS + 1):
        # Frontier grows to node scale (nearly all nodes by hop 2 on
        # this bipartite graph), so it must NOT be broadcast: a
        # shuffle-hash join keyed on src keeps every superstep's
        # memory per-task bounded; AQE may still choose broadcast when
        # runtime stats show the frontier is genuinely small.
        reached = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new_dist = (
            dist.join(reached.withColumn("nk", F.lit(k)), "node", "left")
            .select(
                "node",
                F.coalesce(F.col("hops"), F.col("nk")).cast("int").alias("hops"),
            )
            .localCheckpoint(eager=True)  # truncate superstep lineage
        )
        frontier = new_dist.where(F.col("hops") == k)
        dist = new_dist
        # one cheap count over the checkpointed state replaces the old
        # isEmpty-at-top-of-round job: stop once no node was newly
        # reached at hop k (identical to the old emptiness test — the
        # next round's frontier IS hops == k)
        if frontier.count() == 0:
            break
    return (
        dist.groupBy(
            F.coalesce(F.col("hops"), F.lit(-1)).cast("int").alias("hops")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("hops")
    )
