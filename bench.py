#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": <sf>}

Each query materializes its (small) result via collect(); session/JVM
startup is excluded. Queries run once after a warm-up scan so the
numbers reflect plan execution, not classloading.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.session import build_session
from flink_mingo_tail_spark.tables import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative, scale-sensitive subset across every operator family:
# scans/filters, fact-fact + broadcast joins, aggregation families,
# windows, set ops, CDC analogs, dedup/similarity/text, multimodal.
HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_project_topk",
    "q10_inner_join_agg",
    "q11_broadcast_dim_join",
    "q12_left_outer_join",
    "q17_range_join",
    "q20_groupby_battery",
    "q21_rollup",
    # q27b, not q27: the built-in `percentile` sorts per group (3 groups =
    # 3-task parallelism ceiling — a 33 TB sort per task at 100 TB); the
    # rank-select path stays partition-parallel and is bitwise-equal.
    "q27b_percentile_rank_select",
    "q30_rank_topn_per_group",
    "q33_running_sum",
    "q37_asof_join",
    "q44_intersect_all",
    "q55_explode_posexplode",
    "q62_cdc_quorum_dedup",
    "q73_minhash_lsh_dedup",
    "q75b_decontaminate",
    "q76_knn_bruteforce",
    "q80_token_stats",
    "q82b_repetition_score",
    "q83_doc_fingerprint",
    "q90_tumbling_window",
    "q92_session_window",
    "q95_multimodal_features",
    "q114_watermark_late_drop",
    "q116_interval_join_clicks_purchases",
    "q100_inverted_index",
    "q104_centroid_assign",
]


WARMUP_SF_DIR = "/root/testdata/sf0.001"


def bench_streaming_pipeline(spark, variant: str = "keyed_state") -> dict:
    """Throughput of the reference-shaped streaming path: N logical ops
    delivered 3x (one per replica member) through source → pushed-down
    filter → majority-quorum dedup → sink. The reference's own envelope
    was 9 cursors into a 128-slot queue with per-record ES flush
    (BASELINE.md); this measures the Spark twin end to end.

    variants: 'keyed_state' (applyInPandasWithState — per-op latency) and
    'jvm_agg' (windowed aggregation — throughput; see
    quorum_dedup_stream_agg)."""
    import shutil
    import tempfile

    import pandas as pd

    from flink_mingo_tail_spark.streaming.pipeline import oplog_filter
    from flink_mingo_tail_spark.streaming.quorum import (
        quorum_dedup_stream,
        quorum_dedup_stream_agg,
    )
    from flink_mingo_tail_spark.streaming.replay import OplogCase, op_rows, write_batch

    tmp = tempfile.mkdtemp(prefix="fmts-bench-stream-")
    try:
        src, ck = f"{tmp}/src", f"{tmp}/ck"
        n_ops = 50_000
        write_batch(spark, op_rows(OplogCase(n_ops=n_ops, include_noise=False)), src)
        if variant == "jvm_agg":
            # sentinel op in the event-time future closes the replay windows
            sentinel = op_rows(
                OplogCase(n_ops=1, h_base=10_000_000, ts_base=1_700_600_000, include_noise=False)
            )
            write_batch(spark, pd.DataFrame(sentinel), src)
        stream = spark.readStream.schema(
            "ts_t int, ts_i int, h long, op string, ns string, fromMigrate boolean, "
            "o string, o2 string, shard string, member_host string"
        ).parquet(src)
        filtered = oplog_filter(stream)
        if variant == "jvm_agg":
            deduped = quorum_dedup_stream_agg(filtered, replica_depth=3)
        else:
            deduped = quorum_dedup_stream(filtered, replica_depth=3)
        start = time.perf_counter()
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        elapsed = time.perf_counter() - start
        emitted = spark.read.parquet(f"{tmp}/out").filter("h < 10000000").count()
        assert emitted == n_ops, f"streaming bench lost ops ({variant}): {emitted}/{n_ops}"
        return {
            "n_ops": n_ops,
            "deliveries": n_ops * 3,
            "wall_sec": round(elapsed, 3),
            "ops_per_sec": round(n_ops / elapsed, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    registry = load_registry()
    spark = build_session("fmts-bench")

    # Warm-up at the smallest SF: compiles every plan's codegen, spins up
    # Python/Arrow workers, and touches the file index — so the timed runs
    # below measure steady-state engine throughput at the target SF, not
    # one-time JIT costs. (~10 s, excluded from the metric.)
    for name in TABLE_NAMES:
        load_table(spark, SF_DIR, name).count()
    for name in HEADLINE:
        qd = registry.get(name)
        if qd is not None:
            qd.fn(spark, WARMUP_SF_DIR).collect()

    # min-of-3 per query, taken over ROUND-ROBIN passes (not back-to-back
    # repeats): host-level noise on this box arrives in multi-second
    # bursts, so consecutive repeats of one query land inside the same
    # burst while whole-list passes decorrelate the samples. Reported
    # time is steady-state engine throughput, not OS-cache/GC/JIT noise.
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            qd = registry.get(name)
            if qd is None:
                continue
            start = time.perf_counter()
            qd.fn(spark, SF_DIR).collect()
            elapsed = time.perf_counter() - start
            timings[name] = round(min(timings.get(name, float("inf")), elapsed), 3)

    streaming = bench_streaming_pipeline(spark, "keyed_state")
    streaming_jvm = bench_streaming_pipeline(spark, "jvm_agg")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "streaming_cdc": streaming,
                "streaming_cdc_jvm": streaming_jvm,
            }
        )
    )


if __name__ == "__main__":
    main()
