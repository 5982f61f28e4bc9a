"""Graph queries over the order network: PageRank and BFS reach.

The graph: the customer–supplier interaction network implied by the
TPC-H-ish fixtures — one undirected-as-two-directed edge per distinct
(customer, supplier) pair that ever traded (orders ⋈ lineitem). Node
ids are disambiguated arithmetically: customer c ↦ 2c, supplier s ↦
2s+1 (parity = side of the bipartite graph), so the edge list stays a
pure long column pair with no string keys.

Both queries run a FIXED number of integer-exact rounds
(operators/graph.py) and the DuckDB oracle unrolls the same rounds as
chained CTEs — same joins, same integer division, bit-identical longs.
A recursive CTE cannot express these (the recursive term needs a
per-round aggregate), so unrolling is also the honest ANSI-SQL form.

Reference parity: the reference engine has no graph surface; this is
north-star extension in the same family as connected components
(operators/cluster.py, q73b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table

_PR_ITERS = 5
_BFS_HOPS = 3
_SEED_MOD = 100  # customers with c_custkey % _SEED_MOD == 0 seed the BFS

# shared oracle prefix: the bipartite trade graph as directed edges
_SQL_EDGES = """
    e0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT 2 * c AS src, 2 * s + 1 AS dst FROM e0
      UNION
      SELECT 2 * s + 1 AS src, 2 * c AS dst FROM e0
    )
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    return pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst")).union(
        pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )


def _pagerank_oracle() -> str:
    """Unroll _PR_ITERS integer-PageRank rounds as chained CTEs."""
    rounds = []
    for i in range(1, _PR_ITERS + 1):
        rounds.append(f"""
    r{i} AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(i{i}.inflow, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT l.dst, CAST(sum(r.rank // l.outdeg) AS BIGINT) AS inflow
        FROM links l JOIN r{i - 1} r ON r.node = l.src
        GROUP BY l.dst
      ) i{i} ON i{i}.dst = n.node
    )""")
    return f"""
    WITH {_SQL_EDGES},
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    links AS (SELECT e.src, e.dst, od.outdeg FROM edges e JOIN od USING (src)),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    {','.join(rounds)}
    SELECT node AS nid,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
           rank AS rank_x1m
    FROM r{_PR_ITERS}
    ORDER BY rank_x1m DESC, nid
    LIMIT 30
    """


@query("q127_pagerank_trade_graph", oracle=_pagerank_oracle())
def q127_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (operators/graph.pagerank, 5
    rounds) over the customer–supplier trade graph; top-30 nodes by
    final rank. The per-round plan is edge⋈rank (hash join on src) →
    per-dst partial+final sum → damping map: O(E) work per round with
    no driver-side state, lineage truncated per round. The oracle
    unrolls the identical integer rounds in SQL — every rank is a
    scaled long, so the hash comparison is bit-exact."""
    from flink_mingo_tail_spark.operators.graph import pagerank

    ranks = pagerank(_trade_edges(spark, sf_dir), n_iter=_PR_ITERS)
    return (
        ranks.select(
            F.col("node").alias("nid"),
            F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("side"),
            "rank_x1m",
        )
        .orderBy(F.desc("rank_x1m"), "nid")
        .limit(30)
    )


def _bfs_oracle() -> str:
    """Unroll _BFS_HOPS min-merge rounds as chained CTEs."""
    rounds = []
    for i in range(1, _BFS_HOPS + 1):
        rounds.append(f"""
    d{i} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM edges e JOIN d{i - 1} d ON d.node = e.src
      ) GROUP BY node
    )""")
    return f"""
    WITH {_SQL_EDGES},
    d0 AS (
      SELECT 2 * c_custkey AS node, 0 AS dist
      FROM customer WHERE c_custkey % {_SEED_MOD} = 0
    ),
    {','.join(rounds)}
    SELECT node AS nid,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
           dist
    FROM d{_BFS_HOPS}
    ORDER BY nid
    """


@query("q128_bfs_reach", oracle=_bfs_oracle())
def q128_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances (operators/graph.bfs_hops, 3 rounds) from the
    c_custkey % 100 == 0 customer seed set over the trade graph — the
    blast-radius / contamination-spread query. Monotone min-merge per
    round (idempotent), so the result is order-independent; distances
    are small ints, exact in both engines."""
    from flink_mingo_tail_spark.operators.graph import bfs_hops

    prepare_session(spark)
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % _SEED_MOD == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    dist = bfs_hops(_trade_edges(spark, sf_dir), seeds, max_hops=_BFS_HOPS)
    return (
        dist.select(
            F.col("node").alias("nid"),
            F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("side"),
            "dist",
        )
        .orderBy("nid")
    )


# ---------------------------------------------------------------------------
# q139 — triangle census of the part co-purchase graph
# ---------------------------------------------------------------------------

_SQL_COPURCHASE = """
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


@query(
    "q139_copurchase_triangles",
    oracle=f"""
    WITH {_SQL_COPURCHASE}
    SELECT
      (SELECT count(DISTINCT n) FROM (
         SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)) AS n_nodes,
      (SELECT count(*) FROM edges) AS n_edges,
      (SELECT count(*)
         FROM edges e1
         JOIN edges e2 ON e2.u = e1.v
         JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def q139_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts bought in
    the same order). Edges are kept in canonical ``u < v`` orientation,
    so each triangle is enumerated exactly once as an ordered triple
    u < v < w — the standard compact-forward scheme: one hash self-join
    builds the wedges, a second closes them. Keeping every edge with its
    smaller endpoint first is what bounds the wedge join at scale (the
    per-node work is deg+^2, the forward-degree, not deg^2 — the
    degeneracy-ordering argument; at 100 TB the further refinement is
    ordering by degree rank instead of key, same plan shape). No
    collect, no cross join; three shuffles total, all key-partitioned."""
    prepare_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    nodes = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .agg(F.count_distinct("n").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    e1 = edges
    e2 = edges.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = e1.join(e2, "v").select("u", "v", "w")
    closing = edges.select(F.col("u").alias("u"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["u", "w"]).agg(F.count("*").alias("n_triangles"))
    return nodes.crossJoin(n_edges).crossJoin(tri)
