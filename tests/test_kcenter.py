"""q233 — k-center greedy coreset (farthest-point sampling).

The oracle sweep hash-checks the trace; these pin the SEMANTICS against
an independent numpy replica (full greedy chain on the raw vectors) and
the structural guarantees: the covering radius is monotone
non-increasing and no vector is chosen twice."""

from __future__ import annotations

import duckdb
import numpy as np

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.queries.similarity import _KCENTER_K
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def _py_kcenter(ids, vecs, k):
    """Greedy chain on the 6dp-rounded d2 grid, ids tiebroken."""
    order = np.argsort(ids)
    ids, vecs = np.asarray(ids)[order], np.asarray(vecs, dtype=np.float64)[order]
    chosen = [0]  # smallest vec_id seeds
    trace = [(1, int(ids[0]), -1.0)]
    md = np.full(len(ids), np.inf)
    for r in range(2, k + 1):
        c = vecs[chosen[-1]]
        d2 = np.round(
            (vecs * vecs).sum(1) + float(c @ c) - 2 * (vecs @ c), 6
        )
        md = np.minimum(md, d2)
        m = md.copy()
        m[chosen] = -np.inf
        best = int(np.lexsort((ids, -m))[0])
        chosen.append(best)
        trace.append((r, int(ids[best]), float(m[best])))
    return trace


def test_kcenter_matches_numpy_replica(spark):
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    vecs = [r[1] for r in rows]
    expected = _py_kcenter(ids, vecs, _KCENTER_K)
    got = [
        (r.round, r.vec_id, round(r.d2_at_selection, 6))
        for r in REGISTRY["q233_kcenter_coreset"].fn(spark, SF_SMOKE).collect()
    ]
    # numpy's BLAS dot differs from the sequential fold by ~1e-15, both
    # land on the same 6dp grid point for this fixture's gaps — compare
    # on the grid
    assert [(a, b, round(c, 6)) for a, b, c in expected] == got


def test_covering_radius_monotone_and_ids_distinct(spark):
    rows = REGISTRY["q233_kcenter_coreset"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == _KCENTER_K
    assert len({r.vec_id for r in rows}) == _KCENTER_K
    radii = [r.d2_at_selection for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert all(x > 0 for x in radii)
