"""Distributed connected components (min-label propagation).

The Pregel shape expressed in DataFrames: labels start as the node
id and each round takes the min over the node's neighborhood until a
round changes nothing. Rounds = graph diameter — near-dup components
are stars/short chains, so convergence is 2-3 rounds in practice.
Each round is one shuffle keyed on node id; the graph never moves to
the driver.

Shared by x17_dedup_clusters (text near-dup components) and
x26_semdedup (embedding near-dup components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 20, stats: list | None = None
) -> DataFrame:
    """Components of an undirected graph given as directed (src, dst)
    edge rows (pass both directions for undirected semantics).

    Returns (node, component) for every node appearing in ``edges``,
    where component is the minimum node id reachable from the node.
    ``edges`` is persisted internally (it feeds every iteration).

    ``stats``: pass a list and every round appends
    {round, changed, plan_lines} — full changed-label count plus the
    analyzed-plan line count of the round's labels (flat across rounds
    == per-round lineage truncation is working). Probe-only
    (tools/graph_probe.py): the default path keeps the cheap
    limit(1) convergence check and records nothing.

    Two disciplines make this safe on ARBITRARY graphs, not just the
    star/short-chain components near-dup clustering produces:

    - every round's labels are eagerly truncated via
      session.iter_checkpoint — without it the round-k plan nests all
      previous rounds and the driver OOMs BUILDING THE PLAN STRING
      around round ~15 (observed: AQE's onUpdatePlan explainString at
      sf0.01 on the co-purchase graph), long before any data limit;
    - each round combines neighbor-min with a POINTER-JUMP
      (label <- label of my label), so convergence is O(log diameter)
      rounds instead of O(eccentricity of the min node) — a 1M-hop
      path chain converges in ~20 rounds, not 1M.

    Convergence is detected WITHOUT a per-round join (r8): every
    node's label is non-increasing across rounds (min-combine over a
    set containing the old label), so the label sum strictly decreases
    until the fixpoint and is equal IFF no label moved. One shuffle-free
    partial aggregate over the just-checkpointed frame replaces the
    old labels-vs-labels equality join — one fewer shuffle per round
    at any scale. The sum is exact at any graph size: summed as
    decimal(38,0) (node ids are int64, so 2^63 x 10^18 rows still
    fits in 38 digits).

    The sum-equality proof requires a FIXED node set across rounds
    (ADVICE r8 #3): if round 1 could grow the node set via ``dst``
    nodes absent from ``src``, added positive labels could offset
    decreases and the sums could coincide despite real movement. So
    labels are seeded from src UNION dst — the node set is complete
    from round 0 on any input, symmetric or directed-only, and every
    later round only min-combines over it.
    """
    from voter_file_etl_spark.session import iter_checkpoint

    _sum_expr = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")

    edges = edges.select("src", "dst").persist()
    labels = iter_checkpoint(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = labels.agg(_sum_expr).collect()[0]["s"]
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        merged = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # Pointer jump: every label value is itself a node (labels
        # start as self-ids and only min-combine), so label-of-label
        # is a total equi-join — the hop that halves path lengths.
        hop = merged.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        new_labels = iter_checkpoint(
            merged.join(hop, merged.label == hop.l_node, "left").select(
                "node",
                F.least(
                    "label", F.coalesce("l_label", "label")
                ).alias("label"),
            )
        )
        new_sum = new_labels.agg(_sum_expr).collect()[0]["s"]
        if stats is not None:
            # Probe path only: the exact changed count still wants the
            # equality join; the hot path never runs it.
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            stats.append(
                {
                    "round": len(stats) + 1,
                    "changed": changed,
                    "plan_lines": len(
                        new_labels._jdf.queryExecution().analyzed().toString()
                        .splitlines()
                    ),
                }
            )
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    # labels is a checkpointed leaf — nothing downstream re-reads the
    # edge cache, so release the executor memory before returning
    # (dead persists tax later queries in long sessions, SCALE.md §12).
    edges.unpersist()
    return labels.select("node", F.col("label").alias("component"))


# ---------------------------------------------------------------------------
# G1 — PageRank (3 unrolled power iterations, damping 0.85) over a
# deterministic synthetic citation graph on the customer keys (each
# node links to 3 arithmetically-derived targets, so out-degree is
# exactly 3 everywhere). The iterative-DataFrame-algorithm shape
# beyond connected components: per iteration one join edges->ranks +
# one partial+final sum keyed on the destination — the graph never
# moves to the driver.
#
# Determinism policy: ranks are integer MICRO-RANKS and every update
# is integer arithmetic — contribution = rank div 3 (exact for the
# constant out-degree), update = 150000 + (85 * Σcontrib) div 100 —
# so partial-aggregation order cannot perturb a single bit, in either
# engine, at any parallelism. (Float PageRank sums in shuffle order
# are NOT reproducible across cluster sizes; integer mass is.)
# ---------------------------------------------------------------------------
from pyspark.sql import SparkSession

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import iter_checkpoint, materialize
from voter_file_etl_spark.tables import t


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support->=2 co-purchase edges (s < d) shared by g2/g4/g5/g6/
    g7/g8.

    r13 shape (guide §2.3/§2.4): collect the distinct parts of each
    order into a sorted array (ONE lineitem scan, map-side
    partial_collect_set), emit the order's C(m,2) part pairs with a
    map-side array expression, and count pairs — 1 scan + 2
    Exchanges. The old shape (distinct -> self-join on l_orderkey ->
    groupBy pair) scanned lineitem twice, paid two distinct
    Exchanges plus the join (broadcast locally; at 100 TB the
    distinct side outgrows the 8 GB broadcast cap and falls to a
    sort-merge join, i.e. two MORE full shuffles) and only then the
    pair aggregate. A/B at sf0.1: 2.61 s -> 2.03 s min-of-3
    (OPTIMIZATION_r13.md). Per-order pair fanout is C(m,2) of the
    DISTINCT parts per order — bounded by order size, the same
    volume the join emitted row-by-row.

    The result is localCheckpoint-ed: every consumer references the
    edge frame at least twice (symmetrize unions, degree rollups,
    wedge joins — g6 references it four times), and without the
    truncation each reference re-executes the whole build (r13).
    """
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts) - i - 1),"
                    " y -> struct(x AS s, y AS d))))"
                )
            ).alias("p")
        )
        .select("p.s", "p.d")
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .drop("c")
        .transform(materialize)
    )


def _pr_edges_sql() -> str:
    return """
      SELECT c_custkey AS src,
             1 + (c_custkey * 7 + 3) % n AS dst FROM customer, nn
      UNION ALL
      SELECT c_custkey, 1 + (c_custkey * 13 + 5) % n FROM customer, nn
      UNION ALL
      SELECT c_custkey, 1 + (c_custkey * 29 + 11) % n FROM customer, nn
    """


def _pr_iter_sql(prev: str) -> str:
    return f"""
      SELECT c.c_custkey AS node,
             150000 + (85 * coalesce(s.contrib, 0)) // 100 AS r
      FROM customer c LEFT JOIN (
        SELECT e.dst AS node, sum(p.r // 3) AS contrib
        FROM edges e JOIN {prev} p ON e.src = p.node
        GROUP BY e.dst
      ) s ON c.c_custkey = s.node
    """


@register(
    "g1_pagerank",
    oracle=f"""
    WITH nn AS (SELECT count(*) AS n FROM customer),
    edges AS ({_pr_edges_sql()}),
    r0 AS (SELECT c_custkey AS node, 1000000 AS r FROM customer),
    r1 AS ({_pr_iter_sql("r0")}),
    r2 AS ({_pr_iter_sql("r1")}),
    r3 AS ({_pr_iter_sql("r2")})
    SELECT node, CAST(r AS BIGINT) AS rank_micro FROM r3
    """,
)
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    edges = (
        cust.crossJoin(F.broadcast(n))
        .select(
            F.col("node").alias("src"),
            F.explode(
                F.array(
                    F.lit(1) + (F.col("node") * 7 + 3) % F.col("n"),
                    F.lit(1) + (F.col("node") * 13 + 5) % F.col("n"),
                    F.lit(1) + (F.col("node") * 29 + 11) % F.col("n"),
                )
            ).alias("dst"),
        )
        .persist()
    )
    ranks = cust.select("node", F.lit(1000000).cast("bigint").alias("r"))
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", F.expr("r div 3").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = cust.join(contrib, cust.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(150000)
                + F.expr("85 * coalesce(contrib, 0) div 100")
            ).cast("bigint").alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


# ---------------------------------------------------------------------------
# G2 — triangle counting on the part co-purchase graph: nodes are
# parts, an edge joins two parts co-ordered in >= 2 distinct orders
# (the support threshold sparsifies a quadratic co-occurrence blow-up
# into a real association graph — thr=1 gives 116k edges at sf0.01,
# thr=2 gives 3.4k), and a triangle is the canonical a<b<c closed
# wedge. The count is the standard two-hop equi-join: e1(a,b) joins
# e2(b,c) to enumerate wedges, e3(a,c) closes them — every join is on
# edge keys, no nested loop (per-order pair fan-out is bounded by
# C(lines_per_order, 2) ~ 21). Output is per-node triangle
# participation, the clustering-coefficient numerator.
# ---------------------------------------------------------------------------
@register(
    "g2_triangle_count",
    oracle="""
    WITH pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), tri AS (
      SELECT e1.s AS a, e1.d AS b, e2.d AS c
      FROM e e1
      JOIN e e2 ON e1.d = e2.s
      JOIN e e3 ON e1.s = e3.s AND e2.d = e3.d
    )
    SELECT node, count(*) AS n_triangles
    FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ) GROUP BY node
    """,
)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.d") == F.col("e2.s"))
        .join(
            e.alias("e3"),
            (F.col("e1.s") == F.col("e3.s"))
            & (F.col("e2.d") == F.col("e3.d")),
        )
        .select(
            F.col("e1.s").alias("a"),
            F.col("e1.d").alias("b"),
            F.col("e2.d").alias("c"),
        )
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


# ---------------------------------------------------------------------------
# G3 — BFS shortest-hop levels from a seed node over the same
# deterministic arithmetic citation graph as g1 (out-degree exactly
# 3). Frontier expansion, 6 fixed rounds: each round joins the
# frontier to the edge table (one shuffle keyed on src), dedups the
# new frontier, and anti-joins the settled set — exactly the
# iterative-DataFrame shape that scales (the graph and the distance
# table never move to the driver; rounds are data-independent so the
# plan has no driver-side convergence counts). Oracle: DuckDB
# recursive CTE with a depth cap, min(level) per node.
#
# Iteration discipline: every round's delta is EAGERLY
# localCheckpoint-ed. Without lineage truncation the round-k plan
# nests every previous round (union-of-anti-join-of-union...), and
# Spark re-executes the whole prefix per round — measured 29 s at
# sf0.1 vs ~3 s truncated. This is the same per-superstep
# materialization Pregel/GraphX does. session.iter_checkpoint is the
# truncation point: localCheckpoint by default (executor-local blocks,
# fastest), or durable checkpoint() to $SPARK_GRAFT_CHECKPOINT_DIR so
# rounds survive executor loss on a real cluster (VERDICT r3 #5).
# ---------------------------------------------------------------------------
_G3_MAX_LVL = 6


@register(
    "g3_bfs_levels",
    oracle=f"""
    WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
    edges AS (
      SELECT c_custkey AS src, 1 + (c_custkey * 7 + 3) % n AS dst
      FROM customer, nn
      UNION ALL
      SELECT c_custkey, 1 + (c_custkey * 13 + 5) % n FROM customer, nn
      UNION ALL
      SELECT c_custkey, 1 + (c_custkey * 29 + 11) % n FROM customer, nn
    ),
    bfs AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS lvl
      UNION ALL
      SELECT e.dst, b.lvl + 1
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.lvl < {_G3_MAX_LVL}
    )
    SELECT node, CAST(min(lvl) AS BIGINT) AS hops
    FROM bfs GROUP BY node
    """,
)
def g3_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("node"))
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    edges = (
        cust.crossJoin(F.broadcast(n))
        .select(
            F.col("node").alias("src"),
            F.explode(
                F.array(
                    F.lit(1) + (F.col("node") * 7 + 3) % F.col("n"),
                    F.lit(1) + (F.col("node") * 13 + 5) % F.col("n"),
                    F.lit(1) + (F.col("node") * 29 + 11) % F.col("n"),
                )
            ).alias("dst"),
        )
        .transform(iter_checkpoint)
    )
    seed = edges.sparkSession.createDataFrame([(1, 0)], "node long, hops long")
    dist = seed
    frontier = seed.select("node")
    for lvl in range(1, _G3_MAX_LVL + 1):
        # Broadcast the frontier (<= 3^lvl nodes from a single seed):
        # the 3|V|-row edge table then never shuffles. With a huge
        # frontier (multi-seed / high-degree graphs) the scale move
        # is the opposite: bucket edges by src ONCE and shuffle the
        # frontier to it each round, reusing the edge partitioning.
        nxt = (
            F.broadcast(frontier)
            .join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            nxt.join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(lvl).cast("long"))
            .transform(iter_checkpoint)  # eager: truncate round lineage
        )
        dist = dist.unionByName(new)
        frontier = new.select("node")
    return dist


# ---------------------------------------------------------------------------
# G4 — connected components as a first-class query: the min-label
# propagation library op (connected_components above, the engine
# x17/x26 cluster on) run over the g2 co-purchase graph (parts
# co-ordered in >= 2 distinct orders, symmetrized). Unlike g1/g3's
# fixed unrolled rounds, this exercises the CONVERGENCE loop: rounds
# run until a round changes no label (bounded by max_iter), the
# iterate-until-fixpoint shape of real component finding.
#
# Scale: each round is one equi-join + min-aggregate keyed on node;
# the convergence probe is a limit(1).count() — O(1) rows to the
# driver, not the labels. Oracle: DuckDB recursive CTE computes full
# reachability (node, reachable) with set-dedup termination and takes
# min(reachable) per node — exact for the thresholded graph size.
# ---------------------------------------------------------------------------
@register(
    "g4_connected_components",
    oracle="""
    WITH RECURSIVE pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e0 AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), e AS (
      SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0
    ), reach(node, r) AS (
      SELECT s, s FROM e
      UNION
      SELECT reach.node, e.d FROM reach JOIN e ON e.s = reach.r
    )
    SELECT node, CAST(min(r) AS BIGINT) AS component
    FROM reach GROUP BY node
    """,
)
def g4_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0 = _copurchase_edges(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("d").alias("dst")
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return connected_components(edges).select(
        "node", F.col("component").cast("long").alias("component")
    )


# ---------------------------------------------------------------------------
# G5 — degree distribution of the co-purchase graph (same support>=2
# edge model as g2): the first diagnostic run on ANY large graph —
# its shape (power law vs uniform) decides every downstream strategy
# choice (salting for hub keys, frontier sizing for BFS, whether
# triangle counting needs degree-ordered orientation). Two grouped
# aggregations: per-node degree (undirected = count both endpoint
# roles), then nodes-per-degree. Both shuffle on bounded key
# domains; nothing is quadratic and nothing visits the driver.
# ---------------------------------------------------------------------------
@register(
    "g5_degree_distribution",
    oracle="""
    WITH pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT s AS node FROM e UNION ALL SELECT d FROM e
      ) GROUP BY node
    )
    SELECT degree, count(*) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node
    FROM deg GROUP BY degree
    """,
)
def g5_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").cast("long").alias("min_node"),
    )


# ---------------------------------------------------------------------------
# G6 — common-neighbor link prediction over the g2 association graph
# (parts co-ordered in >= 2 orders, canonical a<b edges): for every
# NON-adjacent pair with >= 2 shared neighbors, how many wedges
# connect them — the classic "customers also bought" candidate
# generator, and the cheapest link-prediction baseline (Liben-Nowell
# & Kleinberg 2003).
#
# Scale: wedge enumeration is the same two-hop equi-join as g2
# (symmetrized edges joined on the MIDDLE node — per-node fan-out is
# deg^2, bounded by the support threshold's sparsification); the
# adjacency screen is a LEFT ANTI equi-join on the canonical pair.
# No nested loop, no cartesian; everything shuffles on edge keys.
# ---------------------------------------------------------------------------
@register(
    "g6_common_neighbors",
    oracle="""
    WITH pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), sym AS (
      SELECT s AS u, d AS v FROM e UNION ALL SELECT d AS u, s AS v FROM e
    ), wedge AS (
      SELECT w1.v AS a, w2.v AS c
      FROM sym w1 JOIN sym w2 ON w1.u = w2.u AND w1.v < w2.v
    ), cand AS (
      SELECT a, c, CAST(count(*) AS BIGINT) AS n_common
      FROM wedge GROUP BY a, c
    )
    SELECT cand.a AS part_a, cand.c AS part_b, cand.n_common
    FROM cand LEFT JOIN e ON cand.a = e.s AND cand.c = e.d
    WHERE e.s IS NULL AND cand.n_common >= 2
    """,
)
def g6_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("s").alias("u"), F.col("d").alias("v")).unionAll(
        e.select(F.col("d").alias("u"), F.col("s").alias("v"))
    )
    cand = (
        sym.alias("w1")
        .join(
            sym.alias("w2"),
            (F.col("w1.u") == F.col("w2.u"))
            & (F.col("w1.v") < F.col("w2.v")),
        )
        .groupBy(F.col("w1.v").alias("a"), F.col("w2.v").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )
    return cand.join(
        e,
        (cand["a"] == e["s"]) & (cand["c"] == e["d"]),
        "left_anti",
    ).select(
        F.col("a").alias("part_a"),
        F.col("c").alias("part_b"),
        "n_common",
    )


# ---------------------------------------------------------------------------
# G7 — k-core decomposition (k=2, bounded peeling): iteratively
# remove nodes with degree < 2 until stable — the standard
# "strip the hairs off the graph" preprocessing that isolates the
# dense co-purchase core (triangle counting, community detection,
# and embedding training all run on the core, not the full graph).
# The operator runs a FIXED 4 peel rounds; tests assert the peel
# reaches its fixpoint within that bound on the fixture graph at
# both driver scale factors, so the bounded unroll IS the true
# 2-core there, and the oracle unrolls the identical 4 rounds in
# SQL. Output: surviving nodes with their core degree.
#
# Scale: each round is one degree aggregate + one semi-join edge
# restriction (shuffles keyed on node/edge ids, linear per round);
# rounds are bounded by construction. For unbounded graphs the same
# loop gates on a convergence count like connected_components.
# ---------------------------------------------------------------------------
def _g7_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _copurchase_edges(spark, sf_dir)


_G7_ROUNDS = 4


def _g7_oracle() -> str:
    # Every CTE is AS MATERIALIZED: each e{r} is referenced twice
    # (by k{r+1} and e{r+1}), and DuckDB's default CTE INLINING would
    # expand the 4-round unroll into 2^4 copies of the base self-join
    # — observed spilling past 80 GB of temp at sf0.1. Materializing
    # evaluates each round once, mirroring Spark's per-round
    # checkpoint.
    base = """
    WITH pp AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e0 AS MATERIALIZED (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )"""
    prev = "e0"
    parts = [base]
    for r in range(1, _G7_ROUNDS + 1):
        parts.append(f""", k{r} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS deg FROM (
          SELECT s AS node FROM {prev}
          UNION ALL SELECT d FROM {prev}
        ) GROUP BY node
      ) WHERE deg >= 2
    ), e{r} AS MATERIALIZED (
      SELECT e.s, e.d FROM {prev} e
      JOIN k{r} a ON e.s = a.node
      JOIN k{r} b ON e.d = b.node
    )""")
        prev = f"e{r}"
    parts.append(f"""
    SELECT node, CAST(count(*) AS BIGINT) AS core_degree
    FROM (SELECT s AS node FROM {prev} UNION ALL SELECT d FROM {prev})
    GROUP BY node
    """)
    return "".join(parts)


@register("g7_k_core", oracle=_g7_oracle())
def g7_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from voter_file_etl_spark.session import iter_checkpoint

    # _copurchase_edges returns a localCheckpoint leaf (r13), so the
    # old base-edge persist/unpersist bookkeeping is gone: round 0's
    # three references (deg + two semi-joins) read executor-local
    # blocks directly.
    edges = _g7_edges(spark, sf_dir)
    for r in range(_G7_ROUNDS):
        deg = (
            edges.select(F.col("s").alias("node"))
            .unionAll(edges.select(F.col("d").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= 2)
            .select("node")
        )
        edges = iter_checkpoint(
            edges.join(deg, edges.s == deg.node, "left_semi").join(
                deg, edges.d == deg.node, "left_semi"
            )
        )
    return (
        edges.select(F.col("s").alias("node"))
        .unionAll(edges.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


# ---------------------------------------------------------------------------
# G8 — degree assortativity of the co-purchase graph (g2/g5's edge
# model): the Pearson correlation between the degrees at the two
# ends of every edge — positive means hubs attach to hubs
# (assortative mixing), the single number that predicts whether
# hub-salting (j8/j18) will matter downstream. Both edge directions
# enter the sums (the undirected convention), all six sufficient
# statistics are exact integer sums (w21's discipline), and only
# the final ratio touches doubles — identical expression text, then
# floor-quantized to basis points.
#
# Scale: degrees are g5's bounded rollup; attaching them to edges
# is two equi-joins on the node key; the moment sums collapse in
# ONE 1-row aggregate. Nothing quadratic beyond the bounded
# same-order pair generator the whole family shares.
# ---------------------------------------------------------------------------
@register(
    "g8_degree_assortativity",
    oracle="""
    WITH pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT s AS node FROM e UNION ALL SELECT d FROM e
      ) GROUP BY node
    ), both_dirs AS (
      SELECT ds.degree AS x, dd.degree AS y
      FROM e JOIN deg ds ON ds.node = e.s JOIN deg dd ON dd.node = e.d
      UNION ALL
      SELECT dd.degree AS x, ds.degree AS y
      FROM e JOIN deg ds ON ds.node = e.s JOIN deg dd ON dd.node = e.d
    ), mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM both_dirs
    )
    SELECT n AS n_edge_ends,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(floor(
                  CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
                  * 10000 + 0.5) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS assortativity_bp
    FROM mom
    """,
)
def g8_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _copurchase_edges is already a localCheckpoint leaf (degree
    # rollup and the two joins read the same blocks).
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    ds = deg.select(F.col("node").alias("s"), F.col("degree").alias("xs"))
    dd = deg.select(F.col("node").alias("d"), F.col("degree").alias("yd"))
    pairs = e.join(ds, "s").join(dd, "d")
    both = pairs.select(
        F.col("xs").alias("x"), F.col("yd").alias("y")
    ).unionAll(pairs.select(F.col("yd").alias("x"), F.col("xs").alias("y")))
    mom = both.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return mom.select(
        F.col("n").alias("n_edge_ends"),
        F.expr(
            "case when n * sxx - sx * sx > 0 and n * syy - sy * sy > 0"
            " then cast(floor("
            "cast(n * sxy - sx * sy as double)"
            " / sqrt(cast(n * sxx - sx * sx as double))"
            " / sqrt(cast(n * syy - sy * sy as double))"
            " * 10000 + 0.5d) as bigint)"
            " else 0L end"
        ).alias("assortativity_bp"),
    )


# ---------------------------------------------------------------------------
# G9 — label-propagation community detection: each node adopts the
# most common label among its neighbors (ties -> smallest label),
# synchronously, for a fixed 2 rounds over the symmetrized 3-hash
# customer graph. The community structure g4's min-label components
# cannot see (this graph is one giant component; LPA still finds
# dense pockets).
#
# Deterministic by construction: fixed rounds, count-then-min-label
# tie-break, no randomized update order (the classic async LPA is
# order-dependent — the synchronous variant is the one a distributed
# engine can actually promise).
#
# Scale: per round one equi-join edges->labels + groupBy(node, label)
# + a node-partitioned rank window (partition size <= degree), with
# iter_checkpoint lineage truncation between rounds (the g1/g3
# discipline). No global windows, no cartesians.
# ---------------------------------------------------------------------------
def _lpa_iter_sql(prev: str) -> str:
    return f"""
      SELECT node, label FROM (
        SELECT e.dst AS node, l.label,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, l.label) AS rk
        FROM edges e JOIN {prev} l ON e.src = l.node
        GROUP BY e.dst, l.label
      ) WHERE rk = 1
    """


def _lpa_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round: argmax neighbor label, min-label ties.

    Factored out so tests can gate the PER-ROUND plan shape (the final
    g9 plan only shows the last rollup — iter_checkpoint truncates the
    round lineage by design).

    r13: the argmax is an AGGREGATE, not a row_number window — it
    gets a map-side partial and skips the per-partition sort (guide
    §2.3, the LogTable-merge/kmeans-assign discipline). r14 (ADVICE
    r13): min_by(label, struct(-c, label)) — lowest negated count =
    highest count, ties broken to the LOWEST label directly, so the
    ordering never negates the label and holds for ANY label domain
    (zero/negative/near-Long.MIN seeds included); only the count is
    negated, and a count >= 1 can never overflow under negation.
    """
    counted = (
        edges.join(labels, edges.src == labels.node)
        .groupBy("dst", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counted.groupBy("dst")
        .agg(F.expr("min_by(label, struct(-c, label))").alias("label"))
        .select(F.col("dst").alias("node"), "label")
    )


@register(
    "g9_label_propagation",
    oracle=f"""
    WITH nn AS (SELECT count(*) AS n FROM customer),
    dir AS ({_pr_edges_sql()}),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM dir UNION ALL SELECT dst, src FROM dir
      ) WHERE src <> dst
    ),
    l0 AS (SELECT c_custkey AS node, c_custkey AS label FROM customer),
    l1 AS ({_lpa_iter_sql("l0")}),
    l2 AS ({_lpa_iter_sql("l1")})
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM l2 GROUP BY label
    """,
)
def g9_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    dir_e = cust.crossJoin(F.broadcast(n)).select(
        F.col("node").alias("src"),
        F.explode(
            F.array(
                F.lit(1) + (F.col("node") * 7 + 3) % F.col("n"),
                F.lit(1) + (F.col("node") * 13 + 5) % F.col("n"),
                F.lit(1) + (F.col("node") * 29 + 11) % F.col("n"),
            )
        ).alias("dst"),
    )
    edges = (
        dir_e.unionByName(
            dir_e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    labels = cust.select("node", F.col("node").alias("label"))
    for _ in range(2):
        labels = iter_checkpoint(_lpa_round(edges, labels))
    edges.unpersist()
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").cast("long").alias("min_node"),
        F.max("node").cast("long").alias("max_node"),
    )


# ---------------------------------------------------------------------------
# G10 — two-hop reach: for every node of the directed 3-hash graph,
# how many DISTINCT nodes are reachable in exactly <=2 hops
# (excluding itself) — the friend-of-friend audience size behind
# reach/influence features. Composition is one edges-to-edges
# equi-join (fanout bounded by out-degree^2 = 9), a union with the
# 1-hop set, and a distinct count per source.
#
# Scale: no iteration, no frontier state — bounded fanout joins and
# one distinct rollup keyed on the source node.
# ---------------------------------------------------------------------------
@register(
    "g10_two_hop_reach",
    oracle=f"""
    WITH nn AS (SELECT count(*) AS n FROM customer),
    edges AS ({_pr_edges_sql()}),
    one AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
    two AS (
      SELECT DISTINCT a.src, b.dst
      FROM one a JOIN one b ON a.dst = b.src
      WHERE a.src <> b.dst
    ), reach AS (
      SELECT src, dst FROM one UNION SELECT src, dst FROM two
    )
    SELECT src AS node, CAST(count(*) AS BIGINT) AS reach_2hop
    FROM reach GROUP BY src
    """,
)
def g10_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    edges = (
        cust.crossJoin(F.broadcast(n))
        .select(
            F.col("node").alias("src"),
            F.explode(
                F.array(
                    F.lit(1) + (F.col("node") * 7 + 3) % F.col("n"),
                    F.lit(1) + (F.col("node") * 13 + 5) % F.col("n"),
                    F.lit(1) + (F.col("node") * 29 + 11) % F.col("n"),
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    hop2 = (
        edges.alias("a")
        .join(
            edges.select(
                F.col("src").alias("mid"), F.col("dst").alias("dst2")
            ),
            F.col("a.dst") == F.col("mid"),
        )
        .select(F.col("a.src").alias("src"), F.col("dst2").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    reach = edges.select("src", "dst").unionByName(hop2).distinct()
    return reach.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("reach_2hop")
    )


# ---------------------------------------------------------------------------
# G11 — landmark closeness: multi-source BFS from 4 landmark nodes in
# ONE iterative pass (the frontier carries a landmark column, so K
# sources cost the same rounds as one — the standard way to
# approximate closeness/harmonic centrality at scale, where per-node
# exact BFS is O(V) passes). Per node: how many landmarks reach it
# within 4 hops, total hops, and harmonic centrality in exact
# milli-units (sum of 1000 div d — integer division, engine-exact).
#
# Scale: same discipline as g3 — the synthetic 3-out-regular edge
# table builds once and checkpoints; each round broadcasts the
# bounded frontier (<= 4 * 3^lvl rows) so the edge table never
# shuffles; per-round lineage truncation via iter_checkpoint (the
# SPARK_GRAFT_CHECKPOINT_DIR knob switches to durable checkpoints).
# Cites the same reference scope as g1-g3 (no graph surface in
# load.ts; the family serves the relationship queries SURVEY §2.13
# projects from the voter-household schema).
# ---------------------------------------------------------------------------
_G11_MAX_LVL = 4
_G11_LANDMARKS = (1, 29, 67, 103)


@register(
    "g11_closeness_landmarks",
    oracle=f"""
    WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
    edges AS (
      SELECT c_custkey AS src, 1 + (c_custkey * 7 + 3) % n AS dst
      FROM customer, nn
      UNION ALL
      SELECT c_custkey, 1 + (c_custkey * 13 + 5) % n FROM customer, nn
      UNION ALL
      SELECT c_custkey, 1 + (c_custkey * 29 + 11) % n FROM customer, nn
    ),
    bfs AS (
      SELECT CAST(m.src AS BIGINT) AS lm, CAST(m.src AS BIGINT) AS node,
             0 AS lvl
      FROM (VALUES {", ".join(f"({x})" for x in _G11_LANDMARKS)}) m(src)
      UNION ALL
      SELECT b.lm, e.dst, b.lvl + 1
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.lvl < {_G11_MAX_LVL}
    ),
    d AS (SELECT lm, node, min(lvl) AS d FROM bfs GROUP BY 1, 2)
    SELECT node,
           CAST(count(*) FILTER (d > 0) AS BIGINT) AS n_reached,
           CAST(coalesce(sum(d) FILTER (d > 0), 0) AS BIGINT) AS sum_hops,
           CAST(coalesce(sum(1000 // d) FILTER (d > 0), 0) AS BIGINT)
             AS harmonic_milli
    FROM d GROUP BY node
    """,
)
def g11_closeness_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("node"))
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    edges = (
        cust.crossJoin(F.broadcast(n))
        .select(
            F.col("node").alias("src"),
            F.explode(
                F.array(
                    F.lit(1) + (F.col("node") * 7 + 3) % F.col("n"),
                    F.lit(1) + (F.col("node") * 13 + 5) % F.col("n"),
                    F.lit(1) + (F.col("node") * 29 + 11) % F.col("n"),
                )
            ).alias("dst"),
        )
        .transform(iter_checkpoint)
    )
    seed = edges.sparkSession.createDataFrame(
        [(lm, lm, 0) for lm in _G11_LANDMARKS], "lm long, node long, hops long"
    )
    dist = seed
    frontier = seed.select("lm", "node")
    for lvl in range(1, _G11_MAX_LVL + 1):
        nxt = (
            F.broadcast(frontier)
            .join(edges, frontier.node == edges.src)
            .select("lm", F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            nxt.join(dist, ["lm", "node"], "left_anti")
            .withColumn("hops", F.lit(lvl).cast("long"))
            .transform(iter_checkpoint)
        )
        dist = dist.unionByName(new)
        frontier = new.select("lm", "node")
    pos = F.col("hops") > 0
    return dist.groupBy("node").agg(
        F.sum(pos.cast("long")).cast("long").alias("n_reached"),
        F.coalesce(
            F.sum(F.when(pos, F.col("hops"))), F.lit(0)
        ).cast("long").alias("sum_hops"),
        F.coalesce(
            F.sum(F.when(pos, F.expr("1000 div hops"))), F.lit(0)
        ).cast("long").alias("harmonic_milli"),
    )
