"""q237 (leakage-aware split) and q238 (per-source quality terciles) —
the invariants the oracle hash can't localize."""

from __future__ import annotations

from collections import defaultdict

from flink_mingo_tail_spark.queries import load_registry
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def test_split_never_straddles_a_component(spark):
    """The leakage guarantee: every near-dup component maps to exactly
    one split — and the naive doc-hash split demonstrably violates it
    on this near-dup-saturated fixture (that contrast is the operator's
    reason to exist)."""
    rows = REGISTRY["q237_leakage_aware_split"].fn(spark, SF_SMOKE).collect()
    splits = defaultdict(set)
    naive = defaultdict(set)
    leak_flag = {}
    for r in rows:
        splits[r.component].add(r.split)
        naive[r.component].add(r.naive_split)
        leak_flag.setdefault(r.component, r.naive_would_leak)
        assert leak_flag[r.component] == r.naive_would_leak  # per-component constant
    for comp, s in splits.items():
        assert len(s) == 1, (comp, s)
        assert leak_flag[comp] == (len(naive[comp]) > 1)
    assert any(leak_flag.values()), "fixture must exhibit naive-split leakage"


def test_split_assignment_is_component_hash_not_doc_hash(spark):
    """Docs in the same component share the component min-id's split
    even when their own doc-hash says otherwise."""
    rows = REGISTRY["q237_leakage_aware_split"].fn(spark, SF_SMOKE).collect()
    disagree = [r for r in rows if r.split != r.naive_split and r.component != r.doc_id]
    assert disagree, "fixture must contain docs re-routed by their cluster"


def test_terciles_are_balanced_and_ordered_per_source(spark):
    rows = REGISTRY["q238_quality_terciles_by_source"].fn(spark, SF_SMOKE).collect()
    by_src = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_src[r.source][r.bucket].append(r.score_per_tok_milli)
    for src, buckets in by_src.items():
        assert set(buckets) == {"head", "middle", "tail"}, src
        sizes = [len(buckets[b]) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)  # SQL ntile balance
        # ordering: ties may straddle a boundary, so >= not >
        assert min(buckets["head"]) >= max(buckets["middle"]), src
        assert min(buckets["middle"]) >= max(buckets["tail"]), src
