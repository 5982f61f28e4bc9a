"""Connected components over an edge list — transitive dup-cluster
closure for near-duplicate graphs.

Why it exists: LSH band-bucket election (queries/dedup.py q73) gives
each doc the smallest representative among its OWN buckets — one-hop
single linkage. True dedup clusters need the transitive closure (doc A
shares a band with B, B with C ⇒ {A,B,C} one cluster, keep one). The
reference has no counterpart (its dedup is per-op-id equality); this is
the LLM-corpus operator a training pipeline runs on LSH candidates.

Algorithm: iterative min-label propagation with pointer jumping —
each round every node takes the min label in its neighborhood
(one shuffle on the edge key), then labels chase their own label's
label (one self-join), which is the path-halving step that turns
O(diameter) propagation into O(log d) rounds. This is the
standard Spark formulation of the MapReduce "large-star/small-star"
family (Kiveris et al., "Connected Components in MapReduce and
Beyond") expressed as DataFrame joins so Catalyst/AQE manage the
shuffles.

Scale notes (100 TB): state per round is one (node,label) table —
O(V) rows, hash-partitioned; each round is two shuffles (neighborhood
min + pointer jump). Convergence is a flag count over the round's
own localCheckpoint (each row carries a ``chg`` bit comparing its new
label to the previous one riding the same aggregate) — a driver-side
scalar action per iteration, inherent to iterative fixpoints (Pregel
supersteps do the same), but no join and no extra shuffle. Persist +
unpersist bound the lineage so round N does not recompute rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected edge list (direction ignored; self-loops
    fine). Isolated nodes that never appear in ``edges`` are unknown to
    the result — union their id→id labels in if needed (the dedup query
    does this for docs with no candidate pair).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()  # truncate lineage: round N must not replay 1..N-1
    )
    for it in range(max_iter):
        # neighborhood min: every node sees its neighbors' labels. The
        # self branch carries the node's PREVIOUS label in a separate
        # column (null on neighbor rows; max() ignores nulls) so the
        # convergence check below never needs to join this round's
        # output back against ``labels`` — the old spelling paid a full
        # jumped-vs-labels equi-join job per round just to count changes
        # (r14, guide §2.4: the count now rides the round's own
        # materialization).
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .select(
                F.col("a").alias("node"),
                "label",
                F.lit(None).cast(labels.schema["label"].dataType).alias("old"),
            )
            .union(labels.select("node", "label", F.col("label").alias("old")))
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        # pointer jump: label <- label(label)  (path halving)
        lab2 = neigh.select(F.col("node").alias("pnode"), F.col("label").alias("plabel"))
        jumped = (
            neigh.join(lab2, neigh.label == lab2.pnode, "left")
            .select(
                "node",
                F.coalesce("plabel", "label").alias("label"),
                # null-safe: labels are non-null by construction (null
                # endpoints are filtered by a != b), but a null-unsafe !=
                # would silently yield null → filtered out → spurious
                # early convergence if that invariant ever broke
                (~F.coalesce("plabel", "label").eqNullSafe(F.col("old"))).alias("chg"),
            )
            .localCheckpoint()
        )
        labels = jumped.select("node", "label")
        if it == 0:
            # round 0 always changes labels on any non-trivial graph —
            # skip the convergence action (localCheckpoint above already
            # materialized the round)
            continue
        # count over the checkpointed round itself — no join, no shuffle
        if jumped.filter(F.col("chg")).count() == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))
