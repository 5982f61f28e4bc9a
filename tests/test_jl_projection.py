"""q235 — JL projection distortion audit.

Replica test recomputes the projection and both distances with pure
sequential Python arithmetic (the exact fold order both engines use)
and compares every output cell; the statistical test pins the
unbiasedness the operator exists to certify."""

from __future__ import annotations

import duckdb

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.queries.similarity import (
    _JL_OUT_DIM,
    _JL_PAIRS_N,
    _JL_R,
)
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _d2(a, b):
    return round(_dot(a, a) + _dot(b, b) - 2 * _dot(a, b), 6)


def _py_audit():
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding::DOUBLE[] FROM"
        f" read_parquet('{SF_SMOKE}/embeddings.parquet')"
        f" WHERE vec_id < {_JL_PAIRS_N} ORDER BY vec_id"
    ).fetchall()
    scale = float(_JL_OUT_DIM) ** 0.5
    proj = {
        vid: [_dot(v, _JL_R[k]) / scale for k in range(_JL_OUT_DIM)]
        for vid, v in rows
    }
    vecs = dict(rows)
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d2o = _d2(vecs[a], vecs[b])
            d2p = _d2(proj[a], proj[b])
            ratio = round(d2p * 1000000.0 / d2o) if d2o > 0 else None
            out[(a, b)] = (d2o, d2p, ratio)
    return out


def test_jl_audit_matches_python_replica(spark):
    expected = _py_audit()
    got = {
        (r.vec_a, r.vec_b): (r.d2_orig, r.d2_proj, r.ratio_micro)
        for r in REGISTRY["q235_jl_projection_audit"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    for k, (d2o, d2p, ratio) in expected.items():
        go, gp, gr = got[k]
        assert go == d2o and gp == d2p, (k, (go, gp), (d2o, d2p))
        # the replica's banker's-rounding can differ from the engines'
        # half-up at an exact .5 micro boundary — allow 1 micro
        if ratio is None:
            assert gr is None
        else:
            assert abs(gr - ratio) <= 1, (k, gr, ratio)


def test_jl_projection_is_unbiased_on_average(spark):
    """E[d2_proj] = d2_orig for a +-1/sqrt(d') matrix; the mean ratio
    over the audit pairs must sit near 1.0 (the certificate q235
    exists to produce)."""
    rows = REGISTRY["q235_jl_projection_audit"].fn(spark, SF_SMOKE).collect()
    ratios = [r.ratio_micro for r in rows if r.ratio_micro is not None]
    assert len(ratios) >= 100
    mean = sum(ratios) / len(ratios)
    assert 800_000 <= mean <= 1_200_000, mean
