"""Iterative graph algorithms as DataFrame fixpoints: PageRank and
BFS hop distances.

Why they exist: after dedup clustering (operators/cluster.py gives the
transitive closure), the next things a corpus/link pipeline asks of its
graph are *importance* (PageRank over a citation/link/interaction
graph — the classic crawl-prioritization and quality-prior signal) and
*reachability radius* (hop distance from a seed set — contamination
blast-radius, account-takeover spread, affiliate rings). The reference
engine has no graph surface (SURVEY.md §2A); these are north-star
extensions in the same class as connected components.

Both are expressed as bounded sequences of join+aggregate rounds — the
Pregel superstep shape hand-unrolled into DataFrame ops so Catalyst
and AQE manage every shuffle:

* one round of PageRank = contributions (edge ⋈ rank, integer-divide
  by out-degree) → sum per destination → damping update. State is one
  (node, rank) table, O(V) rows, hash-partitioned by node.
* one round of BFS = frontier ⋈ edges → min-distance merge. State is
  (node, dist), monotone decreasing, so rounds are idempotent merges.

Determinism across engines: ranks are scaled longs (1e6 = rank 1.0)
and every per-round operation is integer-only — contribution is
``rank DIV out_degree`` (long division), the damping update is
``150000 + (85 * inflow) DIV 100`` — so Spark and any ANSI engine
(the DuckDB oracle unrolls the same rounds as chained CTEs) produce
bit-identical longs. No float ever enters the fixpoint, which also
makes the result independent of aggregation order.

Scale notes (100 TB / billions of edges): per round, the only
corpus-sized shuffles are the edge ⋈ rank hash join (partitioned on
src — pre-bucketing the edge table by src makes it co-located) and the
per-dst sum (partial+final). ``localCheckpoint`` every round bounds
lineage exactly as in connected_components; iteration counts are fixed
(PageRank converges geometrically — 5..20 rounds; BFS is bounded by
the radius of interest), so there is no unbounded driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: rank 1.0 == 1_000_000
RANK_SCALE = 1_000_000
#: damping factor 0.85 as the integer pair (85, 100); teleport = 0.15
_DAMP_NUM, _DAMP_DEN = 85, 100
_TELEPORT = RANK_SCALE * (_DAMP_DEN - _DAMP_NUM) // _DAMP_DEN  # 150000


def pagerank(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list
    (columns ``src``, ``dst``; duplicate edges count once — callers
    dedupe). Returns (node, rank_x1m) after ``n_iter`` rounds from a
    uniform start of 1.0 per node.

    Per-node formula (the per-node teleport variant, unnormalized):
    ``rank' = 0.15 + 0.85 * Σ_{u→v} rank(u) / outdeg(u)``, all in
    scaled-long integer arithmetic (see module docstring). Dangling
    nodes (no out-edges) simply leak their mass — the standard
    simplification when ranks are used as an ordering signal.
    """
    e = edges.select("src", "dst").distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) — static per run; persist so rounds reuse it
    links = e.join(outdeg, "src").persist()
    ranks = nodes.withColumn("rank", F.lit(RANK_SCALE).cast("long")).localCheckpoint()
    for _ in range(n_iter):
        contribs = (
            links.join(ranks, links.src == ranks.node)
            .select("dst", F.expr("rank DIV outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(_TELEPORT)
                    + F.expr(f"({_DAMP_NUM} * coalesce(inflow, 0)) DIV {_DAMP_DEN}")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()  # bound lineage: round N must not replay 1..N-1
        )
    e.unpersist()
    links.unpersist()
    nodes.unpersist()
    return ranks.select("node", F.col("rank").alias("rank_x1m"))


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """Hop distance from a seed set over a directed edge list
    (columns ``src``, ``dst``). ``seeds`` has one column ``node``.
    Returns (node, dist) for every node reachable within ``max_hops``
    (seeds at dist 0). Monotone min-merge per round — idempotent, so
    re-visiting an already-settled node never changes its distance.
    """
    e = edges.select("src", "dst").distinct().persist()
    dist = seeds.select("node").distinct().withColumn("dist", F.lit(0)).localCheckpoint()
    for _ in range(max_hops):
        frontier_next = (
            e.join(dist, e.src == dist.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.union(frontier_next)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    e.unpersist()
    return dist
