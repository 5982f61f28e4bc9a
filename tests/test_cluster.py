"""connected_components (operators/cluster.py): transitive closure via
min-label propagation + pointer jumping."""

from __future__ import annotations

from flink_mingo_tail_spark.operators.cluster import connected_components


def _cc(spark, edges, max_iter=25):
    df = spark.createDataFrame(edges, schema="src long, dst long")
    return {
        r.node: r.component for r in connected_components(df, max_iter=max_iter).collect()
    }


def test_chain_merges_transitively(spark):
    # 1-2, 2-3, 3-4 is one component even though 1 and 4 never share an edge
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (6, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_star_chains_and_direction_ignored(spark):
    # two stars chained through a shared node, reversed edge directions
    got = _cc(spark, [(10, 1), (11, 1), (2, 12), (2, 13), (12, 10)])
    assert set(got.values()) == {1}
    assert got[13] == 1 and got[11] == 1


def test_long_path_converges_within_log_rounds(spark):
    # path of 33 nodes: plain propagation needs 32 rounds; pointer
    # jumping must close it in far fewer
    edges = [(i, i + 1) for i in range(32)]
    got = _cc(spark, edges, max_iter=8)
    assert set(got.values()) == {0}


def test_matches_bruteforce_union_find(spark):
    import itertools

    edges = [(i, (i * 7) % 23) for i in range(23)] + [(40, 41), (42, 41)]
    # reference union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    nodes = set(itertools.chain.from_iterable((a, b) for a, b in edges if a != b))
    expected = {n: find(n) for n in nodes}
    # canonicalize reference labels to min-of-component
    comp_min = {}
    for n, r in expected.items():
        comp_min.setdefault(find(r), min((m for m in nodes if find(m) == find(r)), default=n))
    expected = {n: comp_min[find(n)] for n in nodes}
    got = _cc(spark, [(a, b) for a, b in edges if a != b])
    assert got == expected
