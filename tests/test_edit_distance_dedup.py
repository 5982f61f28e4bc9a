"""q230 — bounded edit-distance confirm over LSH-blocked candidates.

The oracle sweep hash-checks the full output against DuckDB; these
tests pin what the hash can't localize: distance VALUES against a
pure-Python DP (including the -1 cap semantics), the length-prefilter
invariants on every emitted row, and the plan contract (candidates come
from an equi-join on the band key — never a cartesian)."""

from __future__ import annotations

import duckdb

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.queries.dedup import _LEV_CAP, _LEV_REL_DEN
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _texts():
    con = duckdb.connect()
    return dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    )


def test_distances_match_python_dp_with_cap_semantics(spark):
    rows = REGISTRY["q230_edit_distance_near_dup"].fn(spark, SF_SMOKE).collect()
    assert rows, "fixture must produce candidate pairs"
    texts = _texts()
    # confirmed dups are few — check ALL of them, plus a slice of rejects
    dups = [r for r in rows if r.is_dup]
    rejects = [r for r in rows if not r.is_dup][:25]
    assert dups, "fixture must contain confirmed edit-distance dups"
    for r in dups + rejects:
        true_d = _lev(texts[r.doc_a], texts[r.doc_b])
        expect = true_d if true_d <= _LEV_CAP else -1
        assert r.dist == expect, (r.doc_a, r.doc_b, r.dist, true_d)


def test_emitted_rows_respect_the_length_prefilter(spark):
    """Every emitted candidate passed the fused length gate, and the
    verdict is exactly the integer rule 0 <= dist and 5*dist <= max_len."""
    rows = REGISTRY["q230_edit_distance_near_dup"].fn(spark, SF_SMOKE).collect()
    texts = _texts()
    for r in rows:
        la, lb = len(texts[r.doc_a]), len(texts[r.doc_b])
        assert r.max_len == max(la, lb)
        gap = abs(la - lb)
        assert _LEV_REL_DEN * gap <= r.max_len and gap <= _LEV_CAP
        assert -1 <= r.dist <= _LEV_CAP
        assert r.is_dup == (r.dist >= 0 and _LEV_REL_DEN * r.dist <= r.max_len)
        assert r.doc_a < r.doc_b


def test_candidates_come_from_a_band_equi_join(spark):
    plan = (
        REGISTRY["q230_edit_distance_near_dup"]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
