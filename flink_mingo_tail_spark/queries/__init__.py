"""Declared query set (SURVEY.md §2B/§2C).

Every implemented operator is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
equivalent ANSI-SQL oracle string run by DuckDB on the same Parquet
tables. The driver hash-compares the two at sf=0.01; tests do the same
locally at sf=0.001 and sf=0.01.

Conventions that make the hash comparison meaningful:

* every computed column is aliased identically in Spark and SQL;
* double aggregates go through ``functions.deterministic`` so the values
  are bit-identical across engines;
* every query output has a deterministic global order *content-wise*
  (the driver sorts before hashing, but ties broken by explicit keys
  keep LIMIT/top-k results stable);
* queries never mutate state and never collect to the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None):
    """Register a declared query. ``oracle=None`` marks a non-SQL-expressible op."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


_MODULES = (
    "relational",
    "windows",
    "setops",
    "scalar_funcs",
    "cdc",
    "dedup",
    "similarity",
    "text",
    "streaming_batch",
    "multimodal_udf",
    "indexing",
    "analytics",
    "layout",
)

# The driver's CORRECTNESS pass checks a bounded prefix of the declared
# registry (rounds 1 and 2 each recorded exactly the first 50 entries).
# ROTATION, round 3: the 33 round-2 greens rotate OUT; the prefix is
# rebuilt as (a) every query with no green row in any round — the 14
# round-2 errs caused by the events loader, the 3 formerly-oracle-less
# ANN/multimodal queries, and the 17 declared after round 2's prefix
# filled — then (b) the 4 queries new in round 3, (c) the 6 round-1
# greens that silently regressed under the loader bug (re-proven here),
# and (d) 6 canary re-verifies of round-1 greens never re-checked since.
# The list below is exactly 50 names (the prefix budget).
#
# ROUND-4 NOTE: if this round's prefix goes green, every declared query
# has at least one green row (the stated bar). Rotate round 4 to the 65
# queries NOT in this list (oldest green row first) to keep rows fresh,
# and always front-load queries added in the round itself.
_NEEDS_DRIVER_ROW = (
    # (a1) round-2 errs from the events loader bug — fixed this round
    "q26_approx_count_distinct",
    "q60_cdc_filter_pushdown",
    "q61_cdc_envelope",
    "q62_cdc_quorum_dedup",
    "q63_cdc_checkpoint_highwater",
    "q64_cdc_resume_after_checkpoint",
    "q65_cdc_apply_latest_state",
    "q66_event_funnel",
    "q70_exact_dedup_replay",
    "q86_json_struct_access",
    "q90_tumbling_window",
    "q91_sliding_window",
    "q92_session_window",
    "q93_windowed_topk_users",
    # (a2) had no oracle before round 3 — now driver-checkable
    "q78_knn_lsh",
    "q79_knn_ivf",
    "q95_multimodal_features",
    # (a3) declared after round 2's prefix filled — never driver-checked
    "q65b_scd2_history",
    "q100_inverted_index",
    "q101_top_trigrams",
    "q102_source_stats",
    "q103_length_histogram",
    "q104_centroid_assign",
    "q105_pack_sequences",
    "q106_split_assign",
    "q107_chunk_documents",
    "q105_batch_sessionize",
    "q106_cohort_retention",
    "q107_gap_fill_daily",
    "q108_column_profile",
    "q109_mixture_reweight",
    "q110_pareto_frontier",
    "q111_fuzzy_name_join",
    "q112_zorder_layout",
    # (b) new in round 3
    "q113_scalar_py_udf",
    "q114_watermark_late_drop",
    "q115_dedup_within_watermark",
    "q116_interval_join_clicks_purchases",
    "q117_incremental_dedup",
    "q118_curation_filter",
    # (c) round-1 greens regressed by the loader bug — re-prove the fix
    "q20_groupby_battery",
    "q32_lag_lead",
    "q34_moving_avg_rows_frame",
    "q37_asof_join",
    "q56_json_funcs",
    "q57_map_funcs",
    # (d) canaries: round-1 greens not re-checked since round 1
    "q01_pricing_summary",
    "q11_broadcast_dim_join",
    "q18_multiway_join",
    "q19_salted_skew_agg",
)


def load_registry() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry,
    ordered so driver-unchecked queries come first (see _NEEDS_DRIVER_ROW)."""
    for mod in _MODULES:
        importlib.import_module(f"flink_mingo_tail_spark.queries.{mod}")
    front = [n for n in _NEEDS_DRIVER_ROW if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in _NEEDS_DRIVER_ROW]
    return {n: REGISTRY[n] for n in (*front, *rest)}
