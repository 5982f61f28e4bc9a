"""Physical-plan regression tests — the scale contract (SURVEY.md §4.4).

Correctness tests prove the answers match; these prove the PLANS stay
the ones that survive 100 TB: filters pushed to the Parquet scan,
columns pruned, fixed-size dims broadcast, top-k compiled to
TakeOrderedAndProject, aggregates partial+final, no accidental
cartesian products.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flink_mingo_tail_spark.queries import load_registry

from .conftest import SF_ORACLE

REGISTRY = load_registry()


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q02_filter_project_topk")
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan
    assert "GreaterThan(l_discount,0.05)" in plan
    # column pruning: untouched wide columns never leave the scan
    assert "l_partkey" not in plan
    assert "l_tax" not in plan


def test_topk_compiles_to_take_ordered(spark):
    plan = plan_of(spark, "q02_filter_project_topk")
    assert "TakeOrderedAndProject" in plan
    assert "GlobalSort" not in plan


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "q11_broadcast_dim_join")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_aggregate_is_partial_plus_final(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    # two HashAggregate nodes (partial on the map side, final after the
    # exchange) => map-side combine is in effect
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_cross_join_only_where_declared(spark):
    # q16 is declared as crossJoin+filter, but Catalyst extracts the
    # region-key equality into a hash-join key and keeps only the theta
    # residual as the join condition — assert that optimization holds
    # (a true cartesian here would be the regression).
    plan = plan_of(spark, "q16_cross_theta_join")
    assert "CartesianProduct" not in plan
    assert "Join" in plan
    # fact-fact joins must never degrade to nested loop
    for name in ("q10_inner_join_agg", "q17_range_join"):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in plan_of(spark, "q14_semi_join")
    assert "LeftAnti" in plan_of(spark, "q15_anti_join")


def test_lsh_join_is_equi_not_cartesian(spark):
    # the whole point of LSH blocking: candidate generation is keyed on
    # band/bucket values, never an all-pairs product
    plan = plan_of(spark, "q73_minhash_lsh_dedup")
    assert "CartesianProduct" not in plan
    # rep election is a window-min over the banded shuffle (a join-back
    # would re-derive the signature subtree and materialize a
    # corpus-sized rep table); md5 runs in ONE staged pass, not once
    # per permutation (8x) — count expression occurrences in the plan.
    assert "Window" in plan
    assert plan.count("md5") <= 2, f"md5 recomputed: {plan.count('md5')} occurrences"


def test_text_pipeline_has_no_python_udf(spark):
    # text operators must stay JVM-side (codegen), no Python boundary
    for name in ("q80_token_stats", "q81_lang_id", "q83_doc_fingerprint"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


@pytest.mark.parametrize(
    "name", ["q60_cdc_filter_pushdown", "q20_groupby_battery"]
)
def test_events_queries_prune_columns(spark, name):
    plan = plan_of(spark, name)
    # props is the wide JSON payload column; queries not using it must
    # never read it
    if name == "q20_groupby_battery":
        assert "props" not in plan


def test_inverted_index_partial_aggregates(spark):
    # posting-list build must combine map-side (ObjectHashAggregate
    # partial collect) so the token shuffle carries partial lists, and
    # only doc_id/text may leave the scan
    plan = plan_of(spark, "q100_inverted_index")
    assert plan.count("ObjectHashAggregate") >= 2
    assert "lang" not in plan and "source" not in plan


def test_centroid_assign_broadcasts_centroids(spark):
    # the k-row centroid table broadcasts to the scoring join; the
    # corpus side must never shuffle on label for it
    plan = plan_of(spark, "q104_centroid_assign")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def plan_simple(spark, name: str) -> str:
    """Simple-mode explain: Exchange nodes carry their partitioning inline
    (hashpartitioning/SinglePartition/rangepartitioning)."""
    df = REGISTRY[name].fn(spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_sessionize_single_data_shuffle(spark):
    # both windows (lag + running sum) and the session groupBy must ride
    # ONE hash shuffle on user_id; a second full-data exchange would mean
    # the window specs diverged
    plan = plan_simple(spark, "q105_batch_sessionize")
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_skyline_windows_stay_partitioned(spark):
    # the suffix-min over the full order volume must be PARTITIONED (by
    # bucket / by day); the only single-task window allowed is the one
    # over the tiny per-bucket aggregate
    plan = plan_simple(spark, "q110_pareto_frontier")
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # bucket suffix-min joins back broadcast


def test_mixture_reweight_broadcasts_census(spark):
    # per-source counts and the min-scalar must broadcast to the corpus
    # pass — the membership scan itself never shuffles
    plan = plan_simple(spark, "q109_mixture_reweight")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_is_blocked_equi(spark):
    # neighborhood blocking makes candidate generation an EQUI join on the
    # mask key — never an all-pairs product or nested loop
    plan = plan_simple(spark, "q111_fuzzy_name_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_column_profile_is_one_scan(spark):
    # the multi-distinct profile must stay a single source scan (Expand +
    # two-phase agg), not one scan per column
    plan = plan_of(spark, "q108_column_profile")
    # formatted mode prints each scan twice (tree + detail); count tree rows
    assert plan.count("Scan parquet  (") == 1, plan
    assert "Expand" in plan


def test_zorder_stays_in_codegen(spark):
    # the Morton interleave is pure integer expression work — no Python
    # boundary, partial+final agg over the range profile
    plan = plan_of(spark, "q112_zorder_layout")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_watermark_replay_two_level_prefix_max(spark):
    # the arrival-order running max must NOT be one global window: the
    # full-data window is partitioned by bucket, the only single-task
    # window runs over the tiny per-bucket maxima, and the prefix joins
    # back broadcast
    plan = plan_of(spark, "q114_watermark_late_drop")
    assert plan.count("hashpartitioning(bucket") >= 1, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_interval_join_equi_on_user(spark):
    # the stream-stream-join twin must shuffle on the user_id equi key
    # with the time bound as a residual — not a cartesian/range explosion
    plan = plan_of(spark, "q116_interval_join_clicks_purchases")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_skew_join_is_shuffle_hash_on_salt(spark):
    # q123's entire point: the hot key must be joined on (sk, __salt)
    # via a SHUFFLED hash join — broadcast would make the salt moot and
    # a plain sk-keyed join would re-create the hot partition
    plan = plan_simple(spark, "q123_salted_skew_join")
    assert "ShuffledHashJoin [sk" in plan and "__salt" in plan, plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_single_key_join(spark):
    # one full-outer join on the primary key; the diff predicate is a
    # residual filter, never a second join or a window
    plan = plan_of(spark, "q124_snapshot_diff")
    assert "FullOuter" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_equidepth_histogram_broadcasts_boundaries(spark):
    # boundary septiles ride the rank-select operator (partition-bound
    # parallelism); the binning pass gets the 7 boundaries broadcast —
    # the probe column itself must never globally sort
    plan = plan_simple(spark, "q125_equidepth_histogram")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "rangepartitioning(v" not in plan
    assert "SortMergeJoin" not in plan


def test_cooccurrence_pairs_without_self_join(spark):
    # pairs are generated in-expression from the per-doc vocab set; the
    # only joins are broadcast (vocab, n_docs) — an exploded-token
    # self-join on doc_id would be the scale regression
    plan = plan_simple(spark, "q126_token_cooccurrence")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """100 TB join-pruning evidence: when a selective dim-side filter
    feeds a SHUFFLE join, Catalyst injects a runtime bloom filter —
    `bloom_filter_agg` over the dim keys, `might_contain` applied to
    the fact side BEFORE its shuffle — cutting the shuffled fact volume
    to roughly the join's selectivity. The production thresholds
    (applicationSideScanSizeThreshold=10GB) only fire at real scale, so
    the test lowers them; broadcast is disabled because a broadcast
    join already prunes during the build and needs no bloom."""
    from flink_mingo_tail_spark.tables import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_ORACLE, "lineitem")
        o = load_table(spark, SF_ORACLE, "orders").filter("o_orderpriority = '1-URGENT'")
        df = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
        # the bloom probe must gate the FACT key, pre-shuffle
        assert "might_contain" in plan and "l_orderkey" in plan.split("might_contain", 1)[1][:120], plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_unpivot_is_narrow_expand(spark):
    # unpivot must compile to a narrow Expand over the 25-row wide
    # aggregate — no shuffle, no join introduced by the reshape itself;
    # dims stay broadcast
    plan = plan_of(spark, "q136_unpivot_nation_metrics")
    assert "Expand" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_census_joins_are_hash_equi(spark):
    # wedge build + closure are key-partitioned hash joins; the only
    # nested-loop nodes are the final 1-row x 1-row stat combines
    plan = plan_of(spark, "q139_copurchase_triangles")
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    assert "CartesianProduct" not in plan


def test_levenshtein_pairs_blocked_equi_join(spark):
    # candidate generation must ride the p_brand equi-join (blocking);
    # an un-blocked theta join would plan a nested-loop over part x part
    plan = plan_of(spark, "q140_levenshtein_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_kll_rollup_single_sketch_scan_and_broadcast_audit(spark):
    """q147's mergeability claim, physically: the sketch side touches
    orders ONCE (both grains derive from the 5-row per-priority sketch
    frame via explode + kll_merge_agg — a naive union of per + merged
    would re-scan orders for the ALL branch), and the rank audit joins
    the tiny estimate frame by broadcast. Total: exactly two orders
    scans (sketch pass + audit pass), zero SortMergeJoin."""
    plan = plan_of(spark, "q147_kll_quantile_rollup")
    assert plan.count("orders.parquet") == 2
    assert "kll_merge_agg_double" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_theta_set_algebra_single_pass(spark):
    """q146: exact flags and both cohort sketches come from ONE scan of
    orders and one shuffle on o_custkey; the set algebra runs on the
    final 1-row frame (no joins at all)."""
    plan = plan_of(spark, "q146_theta_set_algebra")
    assert plan.count("orders.parquet") == 1
    assert "theta_sketch_agg" in plan
    assert "Join" not in plan


def test_arrow_featurizer_prunes_metadata(spark):
    """q145 reads payload via mapInArrow but never the meta struct —
    the envelope's blob-pruning property must survive the Arrow path
    (the scan reads only doc_id/text used to synthesize the corpus)."""
    plan = plan_of(spark, "q145_arrow_native_features")
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    # The pruning claim itself: the documents scan reads only the two
    # columns the payload synthesis needs; the synthesized meta struct
    # and the unused physical columns are projected away BEFORE the map
    # barrier (pruning cannot cross MapInArrow), so none of them appear
    # as a column reference anywhere in the physical plan.
    assert "doc_id#" in plan and "text#" in plan
    for pruned in ("lang", "source", "n_chars", "meta"):
        assert f"{pruned}#" not in plan, f"column {pruned!r} should be pruned from the q145 plan"


def test_hll_rollup_single_sketch_scan(spark):
    """q134's mergeability claim, physically: sketch side and per-type
    exacts come from ONE events scan (both grains via explode +
    hll_union_agg over the 5-row frame); the only other scan is the
    exact global distinct the gate contract requires. Total: exactly
    two events scans."""
    plan = plan_of(spark, "q134_hll_sketch_rollup")
    assert plan.count("events.parquet") == 2
    assert "hll_union_agg" in plan


def test_equidepth_percentile_computes_stats_pass_once(spark):
    """q125's rank-select boundaries must come from ONE stats pass: the
    earlier readout-by-rejoin spelling recomputed the whole stats
    aggregation (GK sketch included) because column pruning made the two
    broadcast subtrees non-identical and ReuseExchange never fired —
    4 fact scans, 2 sketch builds. The grouping-key carry keeps it at
    3 scans (stats, select, binning) and a single sketch aggregation —
    partial + final, each rendered twice by explain("formatted")
    (node line + details), so exactly 4 mentions; the recompute bug
    showed 8."""
    plan = plan_of(spark, "q125_equidepth_histogram")
    assert plan.count("lineitem.parquet") == 3
    assert plan.count("percentile_approx") == 4


def test_spread_gates_on_scan_file_count(spark, tmp_path):
    """spread() exists to restore parallelism over single-file test
    corpora; on a production many-file scan the same round-robin
    repartition would be a corpus-wide shuffle capping parallelism at
    defaultParallelism (VERDICT r4 "What's wrong" #2). The gate: a
    source that already has >= defaultParallelism scan files must come
    back UNTOUCHED; a single-file source must gain the deliberate
    round-robin exchange."""
    from flink_mingo_tail_spark.tables import load_table, spread

    target = spark.sparkContext.defaultParallelism

    single = load_table(spark, SF_ORACLE, "documents")
    assert len(single.inputFiles()) < target
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spread(single).explain("formatted")
    assert "RoundRobinPartitioning" in buf.getvalue()

    many_path = str(tmp_path / "many_files")
    spark.range(0, 10 * target).repartition(target).write.parquet(many_path)
    many = spark.read.parquet(many_path)
    assert len(many.inputFiles()) >= target
    # identity return — not merely "no visible exchange": the scan is
    # handed back without any plan rewrite at all
    assert spread(many) is many


def test_ohlc_is_one_aggregate_no_window(spark):
    """q158's whole bar derives from ONE map-side-combinable hash
    aggregate — no window sort, no join, one events scan."""
    plan = plan_of(spark, "q158_ohlc_bars")
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_rfm_has_no_unpartitioned_ntile_window(spark):
    """q161 must use the distributed rank path: no ntile window node;
    the only windows are the tiny offsets cumsums and partitioned
    within-bucket row_numbers."""
    plan = plan_of(spark, "q161_rfm_segments")
    assert "ntile" not in plan
    assert "row_number" in plan


def test_bloom_bitset_broadcasts_to_probe(spark):
    """q164: the bit-set side of the membership join is bounded by m
    and must BROADCAST — the probe table is never shuffled for it."""
    plan = plan_of(spark, "q164_bloom_membership")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_set_similarity_join_never_plans_all_pairs(spark):
    """q154: candidate generation is a prefix equi-join on the bigram
    key — no cartesian/nested-loop node anywhere in the plan."""
    plan = plan_of(spark, "q154_set_similarity_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pin_width_survives_aqe_as_user_repartition(spark):
    """operators/skew.pin_width: the explicit key repartition must plan
    as a user-specified shuffle (REPARTITION_BY_NUM) — the marker AQE's
    partition-coalescing rule is required to skip — at the width the
    helper computed, so a byte-small compute-bound stage keeps full
    parallelism (q154's verify stage: 38.5 s coalesced vs ~6 s wide)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.skew import pin_width

    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    pinned = pin_width(df, "k", factor=2)
    n = spark.sparkContext.defaultParallelism * 2
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pinned.explain("formatted")
    plan = buf.getvalue()
    assert "REPARTITION_BY_NUM" in plan
    assert f"hashpartitioning(k#" in plan and f", {n})" in plan
    # and the executed width really is the pinned width, AQE on
    assert pinned.rdd.getNumPartitions() == n


def test_kmeans_seed_side_is_broadcast(spark):
    """q165: the k-row seed frame broadcasts to the distance pass; the
    corpus is never shuffled before assignment."""
    plan = plan_of(spark, "q165_kmeans_lloyd_step")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semdedup_candidates_are_cell_equi_join(spark):
    """q170: the pair space must be bounded by the cell key — candidate
    generation is an equi-join on `label` (hash/sort-merge at scale),
    never a cartesian/nested-loop over the corpus; the prune is an
    anti-join on vec_id."""
    plan = plan_of(spark, "q170_semdedup_prune")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_rrf_legs_are_take_ordered(spark):
    """q184: each retrieval leg ends in a TakeOrderedAndProject (top-50
    never global-sorts the corpus); the fusion join runs on the 50-row
    lists, and the per-list ranks are the documented tiny-frame windows
    ABOVE the limit, never below it."""
    plan = plan_of(spark, "q184_rrf_fusion")
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_auc_ks_have_no_unpartitioned_corpus_window(spark):
    """q179/q180 ride grouped_prefix_sum: every window node must be
    partitioned (the only ORDER-BY-only window allowed is none — the
    cross-bucket cumsum partitions by the group keys here), and the
    pass starts from a hash aggregate to the distinct-value frame."""
    import re

    for name in ("q179_auc_mann_whitney", "q180_ks_two_sample"):
        plan = plan_of(spark, name)
        assert "HashAggregate" in plan, name
        # a partitioned+ordered Window's Arguments line has THREE
        # bracketed lists ([exprs], [partition], [order]); a
        # partition-only window (q180's n1/n2 group totals) has TWO,
        # where the trailing list is a bare-attribute partition spec;
        # an ORDER-BY-only (unpartitioned) window also has TWO but its
        # trailing list carries ASC/DESC sort directions — reject that
        lines = plan.splitlines()
        saw_window = False
        for i, line in enumerate(lines):
            if re.match(r"\(\d+\) Window", line.strip()):
                args = next(
                    ln for ln in lines[i + 1 :] if ln.strip().startswith("Arguments:")
                )
                n_lists = args.count("], [")
                if n_lists != 2:
                    tail = args.split("], [")[-1]
                    assert n_lists == 1 and " ASC" not in tail and " DESC" not in tail, (
                        name,
                        args,
                    )
                saw_window = True
        assert saw_window, name


def test_bpe_counts_ride_distinct_word_frame(spark):
    """q178/q185: the pair explode's input is the word-count aggregate
    (vocabulary-sized), so the plan shows the aggregate BELOW the
    generator — and no window or join in q178 at all."""
    plan = plan_of(spark, "q178_bpe_merge_pairs")
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Generate" in plan  # the explode
    plan2 = plan_of(spark, "q185_bpe_merge_apply")
    assert "BroadcastNestedLoopJoin" in plan2 or "CartesianProduct" in plan2 or "BroadcastHashJoin" in plan2  # the 1-row top-merge broadcast
    assert "SortMergeJoin" not in plan2


def test_calibration_margins_broadcast(spark):
    """q181/q187: the contingency/bin margins join back by BROADCAST —
    the corpus-sized side is never shuffled for a margin."""
    for name in ("q181_chi2_independence", "q187_calibration_ece"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_round9_wave_plan_shapes(spark):
    """Round-9 pins: top-k queries compile to TakeOrderedAndProject (no
    global sort), and no wave query hides a cartesian product — the
    only nested-loop joins are the declared one-row broadcast stat
    frames (N / vocabulary size / doc totals)."""
    for name in (
        "q206_query_likelihood_dirichlet",
        "q214_pmi_collocations",
        "q215_term_burstiness",
        "q210_textrank_keywords",
    ):
        p = plan_of(spark, name)
        assert "TakeOrderedAndProject" in p, name
        assert "CartesianProduct" not in p, name
    for name in (
        "q205_bigram_perplexity",
        "q208_theil_sen_trend",
        "q209_doc_novelty",
        "q211_naive_bayes_confusion",
        "q212_simhash_hamming_pairs",
        "q213_winnowing_fingerprints",
        # q216/q218 join only on keys; q217 is EXCLUDED — its dense
        # cross-score is the declared demonstrative baseline whose
        # production form is q217b (LSH-blocked candidates, pinned
        # cartesian-free below)
        "q216_kneser_ney_nll",
        "q217b_mutual_knn_blocked",
        "q218_lsh_recall_eval",
        "q219_cusum_changepoint",
        "q220_symbolic_motifs",
    ):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name


def test_simhash_pairs_join_is_equi_on_band_bits(spark):
    """q212's candidate generation must be an equi-join on (band, bits)
    — the banding contract; a nested-loop here would be the all-pairs
    comparison the operator exists to avoid."""
    p = plan_of(spark, "q212_simhash_hamming_pairs")
    assert "BroadcastNestedLoopJoin" not in p
    assert "band" in p and "bits" in p


def test_hard_negative_mining_broadcasts_anchors(spark):
    """q222: the bounded anchor set must BROADCAST against the corpus
    scan (q76's contract — no corpus-side shuffle of vectors), and the
    plan must never degrade to a true cartesian product."""
    p = plan_of(spark, "q222_hard_negative_mining")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_knn_label_eval_broadcasts_probes(spark):
    """q223: the bounded probe set broadcasts against the one corpus
    scan (q76's contract); the vote/election frames are probe-bounded,
    never a corpus shuffle of vectors; no true cartesian."""
    p = plan_of(spark, "q223_knn_label_eval")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_semantic_decontaminate_plan_shape(spark):
    """q224: candidate generation must be an equi-join on the
    (tbl, bucket) int pair with the bounded eval side BROADCAST (both
    the bucket-probe join and the cosine re-rank), the n-gram side a
    broadcast semi-join on the gram key (q75b's plan) — and never a
    cartesian product anywhere. The corpus is hashed once and never
    self-joined: no SortMergeJoin of two corpus-sized vector frames."""
    p = plan_of(spark, "q224_semantic_decontaminate")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "tbl" in p and "bucket" in p


def test_perceptual_near_dup_plan_shape(spark):
    """q225: candidates must come from an equi-join on (band, bits) —
    q212's banding contract applied to the dHash fingerprints; the
    payload column must not survive past the Arrow hasher (the blob
    never shuffles); no cartesian anywhere. The r14 materialize-once
    change computes the Arrow dHash pass in a checkpoint job (the pair
    self-join consumes the narrow fingerprint frame twice), so the
    Arrow-boundary pin moves to the fingerprint subtree's own plan."""
    p = plan_of(spark, "q225_perceptual_hash_near_dup")
    assert "CartesianProduct" not in p
    assert "band" in p and "bits" in p

    from flink_mingo_tail_spark.queries.multimodal_udf import (
        _PH_GROUP,
        dhash_arrow,
        synthesize_media_variants,
    )
    from flink_mingo_tail_spark.tables import load_table

    fp = dhash_arrow(
        synthesize_media_variants(
            load_table(spark, SF_ORACLE, "documents"), group_size=_PH_GROUP
        )
    ).select("media_id", "ph")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fp.explain("formatted")
    fp_plan = buf.getvalue()
    assert "MapInArrow" in fp_plan or "ArrowEvalPython" in fp_plan
    # the blob column dies inside the Arrow hasher: nothing after the
    # Python node carries payload bytes
    assert "payload" not in fp_plan.split("MapInArrow")[0]


def test_modality_agreement_plan_shape(spark):
    """q250 (round 13): both modality flags must come from banded
    equi-joins/windows — no cartesian, no nested-loop; the text side
    uses the q73 election shape (no pair list), the perceptual side
    q225's (band, bits) candidates."""
    p = plan_of(spark, "q250_modality_dup_agreement")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "band" in p and "bits" in p


def test_curation_pipeline_plan_shape(spark):
    """q226: ONE lazy plan, no cartesian, broadcast semi-join for the
    gram probe — and the scan count stays at the restructured bound.
    The naive chained-anti-join formulation replayed the whole
    upstream subtree per stage (50 scans measured); the sibling-branch
    formulation (nd/cont both off surv2, precedence in the final
    coalesce) holds it at <= 40. A regression past the bound means a
    stage was re-chained."""
    p = plan_of(spark, "q226_curation_pipeline")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert p.count("Scan parquet") <= 40, p.count("Scan parquet")
