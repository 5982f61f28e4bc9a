"""Plan-determinism: results must not depend on physical execution.

The DuckDB oracle proves Spark's answer matches a reference engine at
ONE physical configuration. This suite proves the answer is invariant
to the things a cluster changes at will — shuffle partition count and
AQE — which is what actually guarantees the 100 TB run reproduces the
local[32] run. Order-sensitive windows, float partial aggregation, and
per-partition state are exactly where such bugs hide.
"""

from __future__ import annotations

import pytest

from flink_mingo_tail_spark.queries import load_registry

from .conftest import SF_ORACLE

REGISTRY = load_registry()

# Queries chosen for order/partitioning sensitivity: running windows,
# float aggregates, window-min LSH election, GEMM batch boundaries,
# arrival-order replay, per-partition UDAF chunks.
PROBES = [
    "q01_pricing_summary",
    "q20_groupby_battery",
    "q33_running_sum",
    "q73_minhash_lsh_dedup",
    "q76b_knn_gemm",
    "q97_grouped_udaf",
    "q104_centroid_assign",
    "q114_watermark_late_drop",
    "q117_incremental_dedup",
    "q118_curation_filter",
    # round-4 additions with the riskiest physical-config surfaces:
    # rand(seed)-salted join (salt values change with partitioning —
    # the RESULT must not), rank-select percentile + approx bracket,
    # iterative fixpoint with per-round checkpoints, fold-ordered
    # double summation, recursive CTE
    "q123_salted_skew_join",
    "q125_equidepth_histogram",
    "q127_pagerank_trade_graph",
    "q129_token_length_entropy",
    "q132_recursive_exposure",
    # round-4 second wave: sketch estimates feed boolean gates (the
    # gate, not the estimate, must be invariant), hash-sample
    # membership is a pure predicate, wedge-join census, and the
    # first-occurrence running-distinct rewrite (two shuffles whose
    # partitioning must not leak into the cumulative counts)
    "q134_hll_sketch_rollup",
    "q135_stratified_hash_sample",
    "q137_running_distinct_users",
    "q139_copurchase_triangles",
    # round-4 fourth wave: Arrow batch boundaries move with partitioning
    # (buffer-sliced histogram must not care), theta set-ops on sketches
    # built from different partition orders, and KLL — whose compaction
    # IS merge-order-dependent: the estimates may move within the rank
    # bound, the emitted gates and exact counts must not
    "q145_arrow_native_features",
    "q146_theta_set_algebra",
    "q147_kll_quantile_rollup",
    # round 5: colorful census — collect_list arrival order and AQE
    # stage-reuse decisions move with partitioning, the sampled counts
    # must not; PPS sample — two-level prefix sums must equal the
    # single-window spelling at any partition count (bucket boundaries
    # are data-defined, not partition-defined)
    "q139b_triangles_colorful",
    "q151_pps_systematic_sample",
    # PQ/ADC: codebook training folds per-cell means from distributed
    # partial sums — the scaled-long pattern must make the codebooks
    # (and so every code, reconstruction, and score) invariant to how
    # the corpus was partitioned during training
    "q152_pq_adc_knn",
]

# (shuffle partitions, AQE) — a skinny cluster vs the default wide one.
CONFIGS = [("7", "false"), ("32", "true")]


def _canon(df) -> list[str]:
    # driver-style canonicalization: column-name sort + full row sort on
    # the repr of every value
    cols = sorted(df.columns)
    rows = [tuple(repr(r[c]) for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", PROBES)
def test_result_invariant_to_physical_config(spark, name):
    results = []
    for parts, aqe in CONFIGS:
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        # pin_aqe=false stops prepare_session (called inside every query
        # fn) from re-enabling AQE — without it both legs ran AQE-on and
        # this test's AQE dimension was a no-op (round-3 advice).
        spark.conf.set("spark.flink_mingo_tail.pin_aqe", "false")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        try:
            results.append(_canon(REGISTRY[name].fn(spark, SF_ORACLE)))
            # the conf must have survived the query run, or the leg
            # didn't actually exercise the configuration it claims
            assert spark.conf.get("spark.sql.adaptive.enabled") == aqe
        finally:
            spark.conf.set("spark.flink_mingo_tail.pin_aqe", "true")
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert results[0] == results[1], (
        f"{name}: result depends on physical config "
        f"(shuffle partitions / AQE) — nondeterminism at scale"
    )
