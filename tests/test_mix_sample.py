"""q229 — temperature-reweighted source mixing.

The registry-wide oracle sweep hash-checks q229 against DuckDB; these
tests pin the SEMANTICS against a pure-Python replica on the real
fixture (exact selected set, multiplicities, pick positions and steps)
and the two mixing guarantees the replica can't express by accident:
every source is represented, and the sqrt temperature compresses the
pick ratio relative to the raw char-mass ratio.
"""

from __future__ import annotations

import math

import duckdb

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.queries.sketches import _MIX_PICKS
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def _fixture_rows():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, n_chars FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()


def _py_mix(rows, picks):
    """Pure-Python replica of q229's arithmetic."""
    totals: dict[str, int] = {}
    for _, src, w in rows:
        totals[src] = totals.get(src, 0) + w
    # half-up micro grid on sqrt (engine round()), then pure int math
    sq = {s: math.floor(math.sqrt(t) * 1e6 + 0.5) for s, t in totals.items()}
    denom = sum(sq.values())
    n_target = {s: max(1, (picks * q) // denom) for s, q in sq.items()}
    step = {s: max(1, totals[s] // n_target[s]) for s in totals}
    cum: dict[str, int] = {}
    out = {}
    for doc_id, src, w in rows:  # rows already in doc_id order
        before = cum.get(src, 0)
        after = before + w
        cum[src] = after
        st = step[src]
        hits = after // st - before // st
        if hits:
            out[doc_id] = (src, st, hits, before // st + 1)
    return out, n_target, totals


def test_mix_matches_python_replica_exactly(spark):
    rows = _fixture_rows()
    expected, _, _ = _py_mix(rows, _MIX_PICKS)
    got = {
        r.doc_id: (r.source, r.step, r.n_hits, r.pick_pos)
        for r in REGISTRY["q229_temperature_mix_sample"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_every_source_is_represented(spark):
    """max(1, .) floors guarantee low-resource sources never vanish
    from the mix — the point of temperature smoothing."""
    rows = _fixture_rows()
    all_sources = {src for _, src, _ in rows}
    picked_sources = {
        r.source
        for r in REGISTRY["q229_temperature_mix_sample"].fn(spark, SF_SMOKE).collect()
    }
    assert picked_sources == all_sources


def test_sqrt_temperature_compresses_the_mix():
    """n_target ratios follow sqrt(mass) ratios: the biggest source is
    up-weighted strictly less than proportionally."""
    rows = _fixture_rows()
    _, n_target, totals = _py_mix(rows, _MIX_PICKS)
    big = max(totals, key=totals.get)
    small = min(totals, key=totals.get)
    if totals[big] == totals[small]:  # degenerate uniform fixture
        return
    mass_ratio = totals[big] / totals[small]
    pick_ratio = n_target[big] / n_target[small]
    assert pick_ratio <= math.sqrt(mass_ratio) + 1
    assert pick_ratio < mass_ratio


def test_budget_is_respected(spark):
    """Total picks stay within the floor/bump envelope of the global
    budget: sum(max(1, floor(P*w_s))) is in [P - |S|, P + |S|], and the
    systematic walk delivers each source's target within one pick."""
    rows = _fixture_rows()
    _, n_target, totals = _py_mix(rows, _MIX_PICKS)
    n_sources = len(totals)
    assert _MIX_PICKS - n_sources <= sum(n_target.values()) <= _MIX_PICKS + n_sources
    got = REGISTRY["q229_temperature_mix_sample"].fn(spark, SF_SMOKE).collect()
    hits_by_source: dict[str, int] = {}
    for r in got:
        hits_by_source[r.source] = hits_by_source.get(r.source, 0) + r.n_hits
    for s, target in n_target.items():
        # walk yields T_s // step picks; step flooring can add a pick
        assert target <= hits_by_source.get(s, 0) <= target + 1


def test_plan_report_is_consistent_with_per_doc_picks(spark):
    """q236 shares q229's plan: its rollup must equal aggregating
    q229's per-doc rows, and the plan columns must satisfy the walk's
    arithmetic (n_hits = t_chars div step for every source)."""
    picks = REGISTRY["q229_temperature_mix_sample"].fn(spark, SF_SMOKE).collect()
    report = {
        r.source: r
        for r in REGISTRY["q236_mix_plan_report"].fn(spark, SF_SMOKE).collect()
    }
    agg: dict[str, list[int]] = {}
    for p in picks:
        e = agg.setdefault(p.source, [0, 0, 0, p.step])
        e[0] += 1
        e[1] += p.n_hits
        e[2] += p.n_chars
        assert p.step == e[3]
    for src, (n_docs, n_hits, sel_chars, step) in agg.items():
        r = report[src]
        assert (r.n_docs, r.n_hits, r.sel_chars, r.step) == (
            n_docs,
            n_hits,
            sel_chars,
            step,
        )
        assert r.n_hits == r.t_chars // r.step
        assert r.n_target <= r.n_hits <= r.n_target + 1
    assert set(report) >= set(agg)


def test_heavy_doc_is_picked_with_multiplicity(spark):
    """No fixture SF produces a doc heavier than its source's step, so
    the multi-hit branch is pinned here on an injected frame: one
    source whose first doc carries most of the mass must yield
    n_hits >= 2 on that doc, and total hits must still equal
    t_chars div step."""
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.queries.sketches import _MIX_BUCKET_W, mix_walk_frame

    rows = [(0, "big", 50_000), (1, "big", 10), (2, "big", 10)] + [
        (10 + i, f"s{i}", 1_000) for i in range(6)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).withColumn("b", F.expr(f"doc_id DIV {_MIX_BUCKET_W}"))
    picks, stepped = mix_walk_frame(d)
    plan = {r.source: r for r in stepped.collect()}
    got = {r.doc_id: r for r in picks.collect()}
    heavy = got[0]
    assert heavy.n_hits >= 2
    hits_big = sum(r.n_hits for r in got.values() if r.source == "big")
    assert hits_big == plan["big"].t_chars // plan["big"].step
    # replica cross-check of the whole injected frame
    import math

    totals = {}
    for _, src, w in rows:
        totals[src] = totals.get(src, 0) + w
    sq = {s: math.floor(math.sqrt(t) * 1e6 + 0.5) for s, t in totals.items()}
    denom = sum(sq.values())
    n_target = {s: max(1, (_MIX_PICKS * q) // denom) for s, q in sq.items()}
    step = {s: max(1, totals[s] // n_target[s]) for s in totals}
    cum = {}
    expected = {}
    for doc_id, src, w in sorted(rows):
        b0 = cum.get(src, 0)
        a0 = b0 + w
        cum[src] = a0
        h = a0 // step[src] - b0 // step[src]
        if h:
            expected[doc_id] = (h, b0 // step[src] + 1)
    assert {k: (v.n_hits, v.pick_pos) for k, v in got.items()} == expected
