"""Unit tests for the iterative graph operators (operators/graph.py).

The DuckDB oracles (q127/q128) prove cross-engine parity on the fixture
graph; these prove the operators themselves against hand-checkable
graphs — a pure-Python replication of the integer PageRank rounds and a
path graph with known hop distances — plus the plan-shape contract
(equi-joins only, no cartesian explosion in the per-round fixpoint).
"""

from __future__ import annotations

import contextlib
import io

from flink_mingo_tail_spark.operators.graph import RANK_SCALE, bfs_hops, pagerank


def _py_pagerank(edges: list[tuple[int, int]], n_iter: int) -> dict[int, int]:
    """Bit-exact pure-Python replica of the scaled-long rounds."""
    edges = sorted(set(edges))
    nodes = sorted({n for e in edges for n in e})
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: RANK_SCALE for n in nodes}
    for _ in range(n_iter):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // outdeg[s]
        rank = {n: 150000 + (85 * inflow[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_integer_replica(spark):
    # star + tail: hub 1 <-> {2,3,4}, chain 4 -> 5 -> 1.
    edge_list = [(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1), (4, 5), (5, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.rank_x1m for r in pagerank(edges, n_iter=4).collect()}
    assert got == _py_pagerank(edge_list, 4)
    # the hub must dominate
    assert max(got, key=got.get) == 1


def test_pagerank_dangling_node_keeps_teleport_rank(spark):
    # 1 -> 2, 2 dangling: node 2 receives, never emits
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.rank_x1m for r in pagerank(edges, n_iter=3).collect()}
    assert got == _py_pagerank([(1, 2)], 3)
    assert got[1] == 150000  # no in-edges: teleport mass only


def test_bfs_hops_path_graph(spark):
    # 0 -> 1 -> 2 -> 3 -> 4, seed {0}, 3 hops: node 4 unreachable
    edges = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_min_merge_takes_shortest(spark):
    # two routes to node 3: 0->3 (1 hop) and 0->1->2->3 (3 hops)
    edges = spark.createDataFrame(
        [(0, 3), (0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got[3] == 1


def test_graph_query_plans_are_equi_join_only(spark):
    from flink_mingo_tail_spark.queries import load_registry

    from .conftest import SF_ORACLE

    registry = load_registry()
    for name in ("q127_pagerank_trade_graph", "q128_bfs_reach"):
        df = registry[name].fn(spark, SF_ORACLE)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_colorful_triangle_estimate_within_gate(spark):
    """q139b's colorful estimate must land within 10% of q139's exact
    triangle count (measured ≤4% at sf0.001/sf0.01 and 0.6% at sf0.1
    with c=16; E[mono triangles] = t/c² stays in the hundreds at the
    smallest fixture, so the gate is meaningful, not vacuous).
    This is the accuracy half of the two-sided contract — the DuckDB
    oracle proves the sampled numbers are deterministic, this proves
    they mean something."""
    from flink_mingo_tail_spark.queries import load_registry

    from .conftest import SF_ORACLE

    registry = load_registry()
    exact = registry["q139_copurchase_triangles"].fn(spark, SF_ORACLE).collect()[0]
    est = registry["q139b_triangles_colorful"].fn(spark, SF_ORACLE).collect()[0]
    assert est.n_colors == 16
    assert est.n_triangles_est == est.n_mono_triangles * 256
    rel_err = abs(est.n_triangles_est - exact.n_triangles) / exact.n_triangles
    assert rel_err <= 0.10, f"triangle estimate off by {rel_err:.1%}"
    edge_err = abs(est.n_edges_est - exact.n_edges) / exact.n_edges
    assert edge_err <= 0.10, f"edge estimate off by {edge_err:.1%}"


def test_colorful_triangle_plan_one_scan_one_fact_shuffle(spark):
    """The mono-edge build must be ONE lineitem scan feeding ONE
    grouped shuffle on the packed (order*c + color) long key with
    partial collect_list — the self-join spelling (two scans, two
    full-fact ok-shuffles) measured 3.2x at the 10x probe and was the
    growth term. Cross-color pairs must never materialize: the pair
    expansion runs inside the (order, color) groups."""
    from flink_mingo_tail_spark.queries import load_registry

    from .conftest import SF_ORACLE

    df = load_registry()["q139b_triangles_colorful"].fn(spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # partial-aggregated list build on the packed single-long key:
    # map-side combine before the one fact shuffle
    assert "ObjectHashAggregate" in plan and "partial_collect_list" in plan
    assert "okc" in plan
    # the textual plan repeats the edges subtree once per consumer
    # (stats + wedge + closing); what must be true PHYSICALLY is that
    # AQE stage reuse collapses them — execute and check the final
    # adaptive plan reuses the materialized exchanges instead of
    # re-running the fact shuffle per consumer
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 2, executed[:2000]


def test_colorful_pair_expansion_handles_duplicate_parts(spark):
    """The collect_list build (no per-group set dedup) must still yield
    a correct edge SET when an order contains the same part twice:
    x=y self-pairs are dropped inline, duplicate pairs collapse in the
    global distinct, and orientation is canonical u<v regardless of
    list position. Verified against a pure-Python replica."""
    from itertools import combinations

    from pyspark.sql import functions as F

    rows = [
        # order 1: duplicate part 7, plus 9 and 7 again out of order
        (1, 7), (1, 9), (1, 7), (1, 3),
        # order 2: all same part — contributes NO edges
        (2, 5), (2, 5), (2, 5),
        # order 3: two parts, reverse arrival order
        (3, 11), (3, 2),
        # order 4: singleton
        (4, 1),
    ]
    expected = set()
    by_order: dict[int, list[int]] = {}
    for ok, pk in rows:
        by_order.setdefault(ok, []).append(pk)
    for ps in by_order.values():
        for x, y in combinations(ps, 2):
            if x != y:
                expected.add((min(x, y), max(x, y)))

    df = spark.createDataFrame(rows, "ok long, pk long")
    lists = df.groupBy("ok").agg(F.collect_list("pk").alias("ps")).filter(F.size("ps") >= 2)
    pairs = lists.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "filter(transform(slice(ps, i + 2, size(ps) - i - 1), "
                "y -> struct(least(x, y) AS u, greatest(x, y) AS v)), p -> p.u <> p.v)))"
            )
        ).alias("e")
    ).select("e.u", "e.v")
    got = {(r.u, r.v) for r in pairs.distinct().collect()}
    assert got == expected == {(3, 7), (3, 9), (7, 9), (2, 11)}
