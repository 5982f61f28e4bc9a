"""q239 — per-doc quality-signal extraction: replica + plan contract."""

from __future__ import annotations

import duckdb

from flink_mingo_tail_spark.queries import load_registry
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def _py_signals(text):
    t = text.split(" ")
    dt = list(dict.fromkeys(t))
    stops = {"the", "a", "and", "of", "to", "is"}
    n, nd = len(t), len(dt)
    counts: dict[str, int] = {}
    for w in t:
        counts[w] = counts.get(w, 0) + 1
    return (
        n,
        nd,
        round(nd * 1000.0 / n),
        round(sum(1 for w in dt if w in stops) * 1000.0 / nd),
        round(sum(len(w) for w in t) * 1000.0 / n),
        max(len(w) for w in t),
        round(sum(1 for w in t if w.isalpha() and w.islower()) * 1000.0 / n),
        round(max(counts.values()) * 1000.0 / n),
    )


def test_signals_match_python_replica(spark):
    rows = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    )
    got = REGISTRY["q239_quality_signals"].fn(spark, SF_SMOKE).collect()
    assert len(got) == len(rows)
    for r in got:
        exp = _py_signals(rows[r.doc_id])
        # Python round() is banker's; the engines round half-up — the
        # milli grids differ by at most 1 at an exact .5 boundary
        grid = (
            r.n_toks,
            r.n_distinct,
            r.ttr_milli,
            r.stop_ratio_milli,
            r.mean_word_len_milli,
            r.max_word_len,
            r.alpha_word_milli,
            r.max_tok_share_milli,
        )
        assert grid[0] == exp[0] and grid[1] == exp[1] and grid[5] == exp[5]
        for g, e in zip(grid[2:5] + grid[6:], exp[2:5] + exp[6:]):
            assert abs(g - e) <= 1, (r.doc_id, grid, exp)


def test_extraction_is_one_scan_no_shuffle_before_sort(spark):
    plan = (
        REGISTRY["q239_quality_signals"]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    for op in ("HashAggregate", "SortMergeJoin", "BroadcastHashJoin", "Generate"):
        assert op not in plan, op
