"""Mergeable-sketch and deterministic-sampling queries (north-star
extension, SURVEY.md §2C).

Two operations every 100 TB pipeline runs constantly:

* **Re-aggregatable distinct sketches** (q134): Apache DataSketches HLL
  via ``hll_sketch_agg`` / ``hll_union_agg``. The scale story is the
  MERGE: per-partition (here per-``event_type``) sketches roll up to any
  coarser grain without re-scanning the base data — the pattern that
  replaces count-distinct re-computation over a 100 TB fact table with a
  kilobyte-sized sketch union. Sketch estimates are engine-specific, so
  (exactly like q26) the raw estimate never reaches the driver hash: the
  query emits EXACT counts plus an accuracy gate the oracle asserts as
  constant TRUE.

* **Deterministic stratified sampling** (q135): per-stratum Bernoulli
  sampling decided by a pure integer predicate over the shared md5 hash
  (operators/dedup.md5_long) — no RNG, no driver state. This matters at
  scale for two reasons: ``df.sample()`` draws from a per-task RNG, so a
  task RETRY can emit a different sample (breaking exactly-once sinks
  and any audit trail), and rate changes recompute from scratch; the
  hash predicate is embarrassingly parallel, reproducible across
  retries/engines, and monotone in the rate (raising the rate only ADDS
  rows — incremental top-up, never a reshuffle of the kept set).

Reference parity: the reference engine (JaiHirsch/flink-mingo-tail) has
no aggregation surface at all (SURVEY.md §0); these extend the declared
engine alongside q26's HLL++ row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import md5_long, salted_md5_long, sql_md5_long
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table

_LG_K = 14          # DataSketches lgConfigK: rse ~= 1.04/sqrt(2^14) ~ 0.8%
_GATE = 0.05        # |estimate - exact| <= 5% of exact (a >5-sigma band)
_SAMPLE_SALT = 7    # salt for the membership hash (decoupled from MinHash salts)


@query(
    "q134_hll_sketch_rollup",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events
    ORDER BY event_type
    """,
)
def q134_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches-HLL distinct-user sketches per event_type, rolled up
    to the global grain by UNIONING THE SKETCHES (``hll_union_agg``), not
    by re-scanning events — the mergeable-summary pattern that makes
    distinct counts re-aggregatable at 100 TB (per-day sketches union to
    month/quarter in kilobytes). Both grains are accuracy-gated against
    the exact distinct count at lgConfigK=14 (±5%, >5σ); the oracle
    asserts the gates as constant TRUE so the hash checks exact values
    only (estimates differ across engines by design, as in q26)."""
    prepare_session(spark)
    e = load_table(spark, sf_dir, "events")

    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", _LG_K).alias("sk"),
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )

    def gate(est: Column) -> Column:
        return (F.abs(est - F.col("n_users")) <= F.lit(_GATE) * F.col("n_users")).alias(
            "approx_ok"
        )

    # Both grains from the 5-row sketch frame, never re-touching events
    # for the sketch side: each per-type row fans out to its own grain
    # plus 'ALL' and hll_union_agg re-aggregates. (The earlier
    # typed.union(per_type.agg(merge)) spelling inlined per_type twice —
    # Catalyst does not common-subexpression whole union branches and
    # ReuseExchange missed because count_distinct's Expand perturbs one
    # subtree — so the physical plan re-scanned events for the ALL
    # branch. Pinned to exactly two scans in tests/test_plans.py.)
    rolled = (
        per_type.select(
            F.explode(F.array(F.col("event_type"), F.lit("ALL"))).alias("event_type"),
            "sk",
            "n_events",
            "n_users",
        )
        .groupBy("event_type")
        .agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("n_events").alias("n_events"),
            F.max("n_users").alias("n_users_grp"),
        )
    )
    # The exact global distinct for the gate does need one more scan —
    # users span event types, so per-type exacts don't sum. That is the
    # cost the sketch path REMOVES in production, kept here only because
    # the correctness contract wants the exact value.
    exact_all = e.agg(F.count_distinct("user_id").alias("n_users_all"))
    return (
        rolled.crossJoin(F.broadcast(exact_all))
        .select(
            "event_type",
            "n_events",
            F.when(F.col("event_type") == "ALL", F.col("n_users_all"))
            .otherwise(F.col("n_users_grp"))
            .alias("n_users"),
            "sk",
        )
        .select("event_type", "n_events", "n_users", gate(F.hll_sketch_estimate("sk")))
        .orderBy("event_type")
    )


def _sql_rate(src_expr: str) -> str:
    return f"100 + ({sql_md5_long(src_expr)}) % 200"


@query(
    "q135_stratified_hash_sample",
    oracle=f"""
    WITH d AS (
      SELECT source,
             {_sql_rate('source')} AS rate_permille,
             ({sql_md5_long('CAST(doc_id AS VARCHAR)', salt=_SAMPLE_SALT)}) % 1000 AS bucket,
             doc_id, n_chars
      FROM documents
    )
    SELECT source,
           rate_permille,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN bucket < rate_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bucket < rate_permille THEN doc_id END) AS BIGINT) AS kept_id_sum,
           CAST(sum(CASE WHEN bucket < rate_permille THEN n_chars END) AS BIGINT) AS kept_chars,
           min(CASE WHEN bucket < rate_permille THEN doc_id END) AS kept_min_id
    FROM d
    GROUP BY source, rate_permille
    ORDER BY source
    """,
)
def q135_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified Bernoulli sample of the document corpus:
    each source stratum gets a rate derived from its own hash (100–299
    per-mille), and a row is kept iff ``md5(doc_id) % 1000 < rate`` —
    a pure, narrow, retry-stable integer predicate (no RNG, no shuffle,
    no driver state; raising a rate only adds rows). Output is the
    per-stratum audit summary (kept counts + exact id/char sums), which
    is what a curation pipeline logs; the kept ROWS are the same
    predicate applied as a filter. Hash-exact in both engines via the
    shared md5→int60 construction (operators/dedup.py)."""
    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumns(
        {
            "rate_permille": (F.lit(100) + md5_long(F.col("source")) % 200),
            "bucket": salted_md5_long(F.col("doc_id").cast("string"), _SAMPLE_SALT) % 1000,
        }
    )
    kept = F.col("bucket") < F.col("rate_permille")
    return (
        d.groupBy("source", "rate_permille")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id"))).alias("kept_id_sum"),
            F.sum(F.when(kept, F.col("n_chars"))).alias("kept_chars"),
            F.min(F.when(kept, F.col("doc_id"))).alias("kept_min_id"),
        )
        .orderBy("source")
    )


@query(
    "q146_theta_set_algebra",
    # Exact audience-overlap counts; the theta-sketch estimates never
    # reach the driver hash (engine-specific), only the constant-TRUE
    # accuracy gate — the q134 pattern extended to SET EXPRESSIONS,
    # which HLL cannot answer (HLL unions only; theta supports A∖B and
    # A∩B on the compact sketches themselves).
    oracle="""
    WITH yr AS (
        SELECT o_custkey,
               max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS in_b
        FROM orders
        WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY o_custkey
    )
    SELECT CAST(sum(in_a) AS BIGINT) AS n_1995,
           CAST(sum(in_b) AS BIGINT) AS n_1996,
           CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_1995,
           CAST(sum(CASE WHEN in_b = 1 AND in_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_1996,
           CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           CAST(count(*) AS BIGINT) AS n_union,
           TRUE AS sketch_ok
    FROM yr
    """,
)
def q146_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches THETA sketches over two customer cohorts (ordered in
    1995 vs 1996) with full set algebra on the sketches — union,
    intersection, and both DIFFERENCES — validated against exact counts
    from the same single pass. The 100 TB story: theta sketches are the
    mergeable summary for audience-overlap questions ("active in A but
    not B") — per-day/per-segment sketches persist in kilobytes and any
    cross-segment set expression is answered sketch-side without
    re-touching the fact table, which no exact structure and no HLL can
    do. One aggregation computes the exact flags AND the sketches; the
    gate bounds every estimate by ±5% of the exact union size (the
    scale at which theta error is specified) and the oracle asserts it
    as constant TRUE."""
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    yr = (
        o.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.year("o_orderdate") == 1995, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.year("o_orderdate") == 1996, 1).otherwise(0)).alias("in_b"),
        )
    )
    summary = yr.agg(
        F.sum("in_a").alias("n_1995"),
        F.sum("in_b").alias("n_1996"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 0)).cast("long")).alias("n_only_1995"),
        F.sum(((F.col("in_b") == 1) & (F.col("in_a") == 0)).cast("long")).alias("n_only_1996"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")).alias("n_both"),
        F.count("*").alias("n_union"),
        F.theta_sketch_agg(F.when(F.col("in_a") == 1, F.col("o_custkey"))).alias("sk_a"),
        F.theta_sketch_agg(F.when(F.col("in_b") == 1, F.col("o_custkey"))).alias("sk_b"),
    )

    def est(col: Column) -> Column:
        return F.theta_sketch_estimate(col)

    tol = F.lit(_GATE) * F.col("n_union") + F.lit(1.0)
    gate = (
        (F.abs(est(F.col("sk_a")) - F.col("n_1995")) <= tol)
        & (F.abs(est(F.col("sk_b")) - F.col("n_1996")) <= tol)
        & (F.abs(est(F.theta_difference("sk_a", "sk_b")) - F.col("n_only_1995")) <= tol)
        & (F.abs(est(F.theta_difference("sk_b", "sk_a")) - F.col("n_only_1996")) <= tol)
        & (F.abs(est(F.theta_intersection("sk_a", "sk_b")) - F.col("n_both")) <= tol)
        & (F.abs(est(F.theta_union("sk_a", "sk_b")) - F.col("n_union")) <= tol)
    ).alias("sketch_ok")
    return summary.select(
        "n_1995", "n_1996", "n_only_1995", "n_only_1996", "n_both", "n_union", gate
    )


#: KLL rank-error gate: k=200 (Spark default) bounds normalized rank
#: error to ~1.65% at 99% confidence; 3% absorbs the inclusive-rank
#: step (1/group size) on the smallest test strata with margin.
_KLL_RANK_TOL = 0.03


@query(
    "q147_kll_quantile_rollup",
    oracle="""
    SELECT o_orderpriority AS grp, count(*) AS n_orders,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL' AS grp, count(*) AS n_orders,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
    FROM orders
    ORDER BY grp
    """,
)
def q147_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILES: per-priority Datasketches KLL sketches of
    o_totalprice, rolled up to the global grain by MERGING the sketches
    (``kll_merge_agg_double``) — never re-scanning orders — then each
    estimated p50/p90 is rank-audited against the base data: the gate
    asserts |rank(estimate) − target| ≤ 3%, the guarantee KLL actually
    makes (rank error, not value error). This is the production answer
    to "percentiles over 100 TB, re-aggregatable to any grain": per-
    partition KLL sketches are kilobytes, merge associatively (unlike
    `percentile_approx`, whose intermediate cannot be persisted and
    re-merged across jobs from SQL), and the q27 decision rule's
    continuous-domain caveat disappears because the sketch never builds
    a value→count map. Exact values in the output are the group counts
    only; estimates stay out of the driver hash (q134 pattern)."""
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.kll_sketch_agg_double("o_totalprice").alias("sk"),
        F.count("*").alias("n_orders"),
    )
    # Both grains from the 5-row sketch frame, NEVER re-touching orders:
    # each per-priority sketch fans out to its own grain plus 'ALL', and
    # kll_merge_agg re-aggregates. (A naive per.union(per.agg(merge))
    # would inline `per` twice and the physical plan re-scans orders for
    # the ALL branch — ReuseExchange can't fire because the join's
    # null-filter perturbs one subtree. The explode keeps the sketch
    # pass at exactly one FileScan; asserted in tests/test_plans.py.)
    est = (
        per.select(
            F.explode(F.array(F.col("grp"), F.lit("ALL"))).alias("grp"), "sk", "n_orders"
        )
        .groupBy("grp")
        .agg(
            F.kll_merge_agg_double("sk").alias("sk"), F.sum("n_orders").alias("n_orders")
        )
        .select(
            "grp",
            "n_orders",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("est_p50"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("est_p90"),
        )
    )
    # Rank audit: one pass over orders (duplicated onto the ALL grain via
    # a 2-element explode — no second scan), broadcast-joined to the tiny
    # estimate frame; rank(est) = fraction of rows <= estimate.
    base = o.select(
        F.explode(F.array(F.col("o_orderpriority"), F.lit("ALL"))).alias("grp"),
        "o_totalprice",
    )
    ranked = (
        base.join(F.broadcast(est), "grp")
        .groupBy("grp")
        .agg(
            F.first("n_orders").alias("n_orders"),
            (F.sum((F.col("o_totalprice") <= F.col("est_p50")).cast("long")) / F.count("*")).alias(
                "rank_p50"
            ),
            (F.sum((F.col("o_totalprice") <= F.col("est_p90")).cast("long")) / F.count("*")).alias(
                "rank_p90"
            ),
        )
    )
    return ranked.select(
        "grp",
        "n_orders",
        (F.abs(F.col("rank_p50") - 0.5) <= _KLL_RANK_TOL).alias("p50_rank_ok"),
        (F.abs(F.col("rank_p90") - 0.9) <= _KLL_RANK_TOL).alias("p90_rank_ok"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# q151 — weighted (PPS) systematic sampling via two-level prefix sums
# ---------------------------------------------------------------------------

_PPS_STEP = 2000     # chars of cumulative weight per pick (~75 picks at test SF)
_PPS_BUCKET_W = 100  # doc_id range width of the first prefix-sum level


@query(
    "q151_pps_systematic_sample",
    # Single-window spelling is the honest ANSI form at oracle scale;
    # the Spark side computes the identical cumulative sums two-level.
    # All-integer arithmetic end to end: the selected SET, each row's
    # hit count, and its pick position are bit-identical across engines.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             CAST(sum(n_chars) OVER (ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_after
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST(cum_after // {_PPS_STEP}
                - (cum_after - n_chars) // {_PPS_STEP} AS BIGINT) AS n_hits,
           CAST((cum_after - n_chars) // {_PPS_STEP} + 1 AS BIGINT) AS pick_pos
    FROM d
    WHERE cum_after // {_PPS_STEP} > (cum_after - n_chars) // {_PPS_STEP}
    ORDER BY doc_id
    """,
)
def q151_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling, probability ∝ size (PPS), by SYSTEMATIC
    selection over cumulative integer weights: walk the corpus in
    doc_id order accumulating ``n_chars``; a document is selected
    whenever the running total crosses a multiple of ``_PPS_STEP``
    (documents heavier than the step are selected with multiplicity —
    ``n_hits``). This is the deterministic alternative to
    Efraimidis–Spirakis ``u^(1/w)`` keys for quality/size-weighted
    corpus selection: no RNG (retry-stable, like q135), no floating
    point (the selected set hash-matches the oracle exactly — an ``ln``
    1-ulp divergence can flip an E-S rank), and a fixed expected budget
    of one pick per STEP weight units.

    Scale shape — the global running sum does NOT use a global window:
    level 1 partitions by ``doc_id DIV 100`` ranges and runs the
    prefix sum partition-parallel; level 2 runs a window over the
    per-bucket TOTALS only (corpus_size / bucket_width rows) and joins
    the bucket offsets back (AQE broadcasts the tiny side). Same
    two-level pattern as q114's prefix-max. At 100 TB, pick the bucket
    width so level 2 stays in the millions of rows, and persist the
    bucket totals beside the corpus so re-sampling at a new STEP is a
    metadata-only pass."""
    prepare_session(spark)
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.expr(f"doc_id DIV {_PPS_BUCKET_W}").alias("b")
    )
    w_in = Window.partitionBy("b").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    within = d.withColumn("within", F.sum("n_chars").over(w_in))
    btot = d.groupBy("b").agg(F.sum("n_chars").alias("tot"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select("b", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off"))
    cum_after = (F.col("off") + F.col("within")).alias("cum_after")
    scored = within.join(offs, "b").select("doc_id", "source", "n_chars", cum_after)
    after_ix = F.expr(f"cum_after DIV {_PPS_STEP}")
    before_ix = F.expr(f"(cum_after - n_chars) DIV {_PPS_STEP}")
    return (
        scored.withColumns(
            {
                "n_hits": (after_ix - before_ix).cast("long"),
                "pick_pos": (before_ix + 1).cast("long"),
            }
        )
        .filter(F.col("n_hits") >= 1)
        .select("doc_id", "source", "n_chars", "n_hits", "pick_pos")
        .orderBy("doc_id")
    )

# ---------------------------------------------------------------------------
# q164 — relational Bloom filter: build, probe, measure false positives
# ---------------------------------------------------------------------------

_BLOOM_M = 131072  # bits (1 << 17)
_BLOOM_K = 5        # hash functions (seed prefixes '0|' .. '4|')


@query(
    "q164_bloom_membership",
    oracle="""
    WITH mem AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ), bits AS (
      SELECT DISTINCT pos FROM (SELECT (('0x' || substr(md5(concat('0|', CAST(o_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM mem UNION ALL SELECT (('0x' || substr(md5(concat('1|', CAST(o_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM mem UNION ALL SELECT (('0x' || substr(md5(concat('2|', CAST(o_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM mem UNION ALL SELECT (('0x' || substr(md5(concat('3|', CAST(o_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM mem UNION ALL SELECT (('0x' || substr(md5(concat('4|', CAST(o_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM mem)
    ), pp AS (
      SELECT c_custkey, 0 AS j, (('0x' || substr(md5(concat('0|', CAST(c_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM customer UNION ALL SELECT c_custkey, 1 AS j, (('0x' || substr(md5(concat('1|', CAST(c_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM customer UNION ALL SELECT c_custkey, 2 AS j, (('0x' || substr(md5(concat('2|', CAST(c_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM customer UNION ALL SELECT c_custkey, 3 AS j, (('0x' || substr(md5(concat('3|', CAST(c_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM customer UNION ALL SELECT c_custkey, 4 AS j, (('0x' || substr(md5(concat('4|', CAST(c_custkey AS VARCHAR))), 1, 15))::BIGINT % 131072) AS pos FROM customer
    ), hits AS (
      SELECT c_custkey, count(*) AS n_set
      FROM pp JOIN bits USING (pos) GROUP BY c_custkey
    ), verdict AS (
      SELECT c.c_custkey,
             coalesce(h.n_set, 0) = 5 AS bloom_pos,
             m.o_custkey IS NOT NULL AS is_member
      FROM customer c
      LEFT JOIN hits h ON c.c_custkey = h.c_custkey
      LEFT JOIN mem m ON c.c_custkey = m.o_custkey
    )
    SELECT count(*) AS n_probe,
           count(*) FILTER (is_member) AS n_members,
           count(*) FILTER (bloom_pos) AS n_bloom_pos,
           count(*) FILTER (is_member AND NOT bloom_pos) AS n_false_neg,
           count(*) FILTER (bloom_pos AND NOT is_member) AS n_false_pos
    FROM verdict
""",
)
def q164_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership as a RELATION: build an m-bit filter
    over the customers holding 'F'-status orders, probe every customer,
    and report exact false-positive/negative counts — the DataFrame
    spelling of runtime row-level filtering (Spark's own
    `bloom_filter_agg`/`might_contain` pair is internal-only in 4.x),
    and the pre-join pruning primitive for 100 TB fact-to-fact joins.

    The "filter" is the DISTINCT set of set bit positions — at most m
    rows (~128Ki longs ≈ 1 MB) regardless of member count, so it
    BROADCASTS to the probe side: candidate rows are eliminated
    without shuffling the probe table, exactly the win a physical
    bloom join buys. A probe key is positive iff ALL k seeded
    md5-long positions are set (count of position hits == k). Both
    engines compute the identical md5-long positions, so false-
    positive counts match EXACTLY — the bloom guarantee (zero false
    negatives) is asserted by the n_false_neg column, not assumed.
    """
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    mem = (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )

    def pos(key, j):
        return F.pmod(
            md5_long(F.concat(F.lit(f"{j}|"), key.cast("string"))), F.lit(_BLOOM_M)
        )

    # r14 (guide §2.1/§3): the probe side used to shuffle TWICE — the
    # exploded probe frame broadcast-joined the bit set, aggregated
    # per key, then equi-JOINED BACK onto the full customer table to
    # restore the non-hit rows (and a third shuffle for the membership
    # truth join). The join-back is redundant: the explode emits
    # exactly k rows for EVERY probe key, so a LEFT join against the
    # bit set keeps every key in the aggregate and n_set = count of
    # matched rows — the groupBy output already has one row per
    # customer. The membership truth frame is bounded (distinct 'F'
    # custkeys) and broadcasts, leaving ONE probe-side shuffle (the
    # per-key conjunction) instead of three. (mem is computed once per
    # consumer — a materialize-once barrier was measured SLOWER here
    # than letting the two bounded broadcast builds overlap.)
    bits = (
        mem.select(
            F.explode(
                F.array(*[pos(F.col("o_custkey"), j) for j in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    pp = c.select(
        "c_custkey",
        F.explode(
            F.array(*[pos(F.col("c_custkey"), j) for j in range(_BLOOM_K)])
        ).alias("pos"),
    )
    verdict = (
        pp.join(
            F.broadcast(bits.withColumn("__hit", F.lit(1))), "pos", "left"
        )
        .groupBy("c_custkey")
        .agg((F.count("__hit") == _BLOOM_K).alias("bloom_pos"))
        .join(
            F.broadcast(
                mem.select(
                    F.col("o_custkey").alias("c_custkey"), F.lit(True).alias("is_member")
                )
            ),
            "c_custkey",
            "left",
        )
        .select(
            "bloom_pos",
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
        )
    )
    return verdict.agg(
        F.count("*").alias("n_probe"),
        F.count_if(F.col("is_member")).alias("n_members"),
        F.count_if(F.col("bloom_pos")).alias("n_bloom_pos"),
        F.count_if(F.col("is_member") & ~F.col("bloom_pos")).alias("n_false_neg"),
        F.count_if(F.col("bloom_pos") & ~F.col("is_member")).alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# q229 — temperature-reweighted source mixing (deterministic, per-source PPS)
# ---------------------------------------------------------------------------

_MIX_PICKS = 96       # global pick budget P (one shard's worth at test SF)
_MIX_BUCKET_W = 100   # doc_id range width of the level-1 prefix-sum buckets


def _mix_walk(spark: SparkSession, sf_dir: str):
    """The shared q229/q236 plan: (picks, plan) — per-doc systematic
    picks and the per-source weight/step table. One code path, two
    views (the q226/q227 discipline)."""
    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.expr(f"doc_id DIV {_MIX_BUCKET_W}").alias("b")
    )
    return mix_walk_frame(d)


def mix_walk_frame(d: DataFrame):
    """The walk over an arbitrary (doc_id, source, n_chars, b) frame —
    separated so tests can inject shapes the fixture never produces
    (a document heavier than its source's step => multi-hit picks)."""
    from pyspark.sql import Window

    # Two-level per-source prefix sum (q151's pattern + source key).
    # r14 (guide §2.1): the per-source char masses previously aggregated
    # the corpus in their OWN full pass (groupBy(source) over d, a third
    # corpus aggregation beside the walk window and the bucket totals).
    # t_chars is now the integer rollup of the per-bucket totals — same
    # int64 addends regrouped (associative, bit-identical), and the
    # rollup input is |buckets| rows, not the corpus.
    w_in = Window.partitionBy("source", "b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = d.withColumn("within", F.sum("n_chars").over(w_in))
    # btot feeds BOTH the weight plan (via tot) and the bucket offsets;
    # without a materialization the corpus aggregate re-runs per branch
    # (no ReuseExchange across differentially-pruned subtrees). The
    # output is |sources × buckets| rows — kilobytes — so the
    # materialize-once idiom costs one tiny barrier and caps the plan
    # at TWO corpus passes (walk window + bucket totals) total.
    btot = d.groupBy("source", "b").agg(
        F.sum("n_chars").alias("tot")
    ).localCheckpoint()
    # sqrt gridded to integer micro-units BEFORE the sum (the repo's
    # double-aggregate determinism convention): the denominator is then
    # an order-independent int64 sum and the target is a pure integer
    # division — no float aggregate anywhere in the plan arithmetic.
    tot = btot.groupBy("source").agg(F.sum("tot").cast("long").alias("t_chars"))
    sq = tot.withColumn(
        "sq", F.round(F.sqrt("t_chars") * 1000000.0).cast("long")
    )
    denom = sq.agg(F.sum("sq").cast("long").alias("denom"))
    plan = sq.crossJoin(F.broadcast(denom)).select(
        "source",
        "t_chars",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"({_MIX_PICKS} * sq) DIV denom"),
        ).alias("n_target"),
    )
    stepped = plan.select(
        "source",
        "t_chars",
        "n_target",
        F.greatest(F.lit(1).cast("long"), F.expr("t_chars DIV n_target")).alias("step"),
    )
    w_off = Window.partitionBy("source").orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = btot.select(
        "source", "b", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off")
    )
    scored = within.join(offs, ["source", "b"]).select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("off") + F.col("within")).cast("long").alias("cum_after"),
    )
    walked = scored.join(F.broadcast(stepped.select("source", "step")), "source")
    after_ix = F.expr("cum_after DIV step")
    before_ix = F.expr("(cum_after - n_chars) DIV step")
    picks = walked.withColumns(
        {
            "n_hits": (after_ix - before_ix).cast("long"),
            "pick_pos": (before_ix + 1).cast("long"),
        }
    ).filter(F.col("n_hits") >= 1)
    return picks, stepped


@query(
    "q229_temperature_mix_sample",
    # Honest ANSI form: one window per source for the running sum, the
    # tiny per-source weight table spelled as plain CTEs. All integer
    # arithmetic after the single sqrt/floor step (see docstring), so
    # the selected SET and every output column are exact across engines.
    oracle=f"""
    WITH tot AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS t_chars,
             CAST(round(sqrt(sum(n_chars)) * 1000000.0) AS BIGINT) AS sq
      FROM documents GROUP BY source
    ), plan AS (
      SELECT source, t_chars,
             greatest(1, CAST(({_MIX_PICKS} * sq)
                 // (SELECT CAST(sum(sq) AS BIGINT) FROM tot) AS BIGINT))
               AS n_target
      FROM tot
    ), stepped AS (
      SELECT source, t_chars, n_target,
             greatest(1, t_chars // n_target) AS step
      FROM plan
    ), d AS (
      SELECT doc_id, source, n_chars,
             CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_after
      FROM documents
    )
    SELECT d.doc_id, d.source, d.n_chars, s.step,
           CAST(cum_after // s.step
                - (cum_after - d.n_chars) // s.step AS BIGINT) AS n_hits,
           CAST((cum_after - d.n_chars) // s.step + 1 AS BIGINT) AS pick_pos
    FROM d JOIN stepped s ON d.source = s.source
    WHERE cum_after // s.step > (cum_after - d.n_chars) // s.step
    ORDER BY d.doc_id
    """,
)
def q229_temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted SOURCE MIXING — the data-mixing step of a
    multilingual/multi-domain training pipeline: per-source sampling
    rates follow w_s ∝ T_s^α with α = 1/2 (T_s = source char mass), the
    standard temperature smoothing that up-samples low-resource sources
    relative to proportional mixing while never letting one giant
    source swamp the mix. A global budget of ``_MIX_PICKS`` picks is
    split as n_target(s) = max(1, ⌊P·w_s⌋), then each source selects
    its documents DETERMINISTICALLY by q151's systematic-PPS walk at
    step(s) = max(1, T_s div n_target(s)) — no RNG (retry-stable).
    The one irrational quantity, sqrt(T_s), is gridded to integer
    micro-units BEFORE any aggregate (the repo's double-aggregate
    convention), so the weight denominator is an order-independent
    int64 sum, the target is a pure integer division, and the selected
    set is bit-identical across engines and retries.

    Scale shape: the weight plan is |sources| rows (broadcast); the
    per-source running sum uses q151's two-level prefix pattern
    (level 1 partition-parallel over (source, doc_id div 100) buckets,
    level 2 a window over per-bucket totals only), so no global — or
    even per-source — single-task window ever materializes. At 100 TB
    the plan table persists beside the corpus; re-mixing at a new
    temperature or budget recomputes only the tiny plan and re-walks
    with new steps (metadata-only, same as q151's re-sampling note).
    """
    picks, _plan = _mix_walk(spark, sf_dir)
    return picks.select(
        "doc_id", "source", "n_chars", "step", "n_hits", "pick_pos"
    ).orderBy("doc_id")


@query(
    "q236_mix_plan_report",
    oracle=f"""
    WITH tot AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS t_chars,
             CAST(round(sqrt(sum(n_chars)) * 1000000.0) AS BIGINT) AS sq
      FROM documents GROUP BY source
    ), plan AS (
      SELECT source, t_chars,
             greatest(1, CAST(({_MIX_PICKS} * sq)
                 // (SELECT CAST(sum(sq) AS BIGINT) FROM tot) AS BIGINT))
               AS n_target
      FROM tot
    ), stepped AS (
      SELECT source, t_chars, n_target,
             greatest(1, t_chars // n_target) AS step
      FROM plan
    ), d AS (
      SELECT doc_id, source, n_chars,
             CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_after
      FROM documents
    ), picks AS (
      SELECT d.doc_id, d.source, d.n_chars,
             CAST(cum_after // s.step
                  - (cum_after - d.n_chars) // s.step AS BIGINT) AS n_hits
      FROM d JOIN stepped s ON d.source = s.source
      WHERE cum_after // s.step > (cum_after - d.n_chars) // s.step
    )
    SELECT s.source, s.t_chars, s.n_target, s.step,
           CAST(count(p.doc_id) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(p.n_hits), 0) AS BIGINT) AS n_hits,
           CAST(coalesce(sum(p.n_chars), 0) AS BIGINT) AS sel_chars,
           CAST(round(CAST(coalesce(sum(p.n_chars), 0) AS DOUBLE) * 1000000.0
                      / s.t_chars) AS BIGINT) AS sel_rate_ppm
    FROM stepped s LEFT JOIN picks p ON p.source = s.source
    GROUP BY s.source, s.t_chars, s.n_target, s.step
    ORDER BY s.source
    """,
)
def q236_mix_plan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MIXING-PLAN table a data recipe publishes (the per-source
    row of a Llama-style data card): for every source, its char mass,
    temperature-smoothed pick target, systematic step, and what the
    walk actually selected — distinct docs, pick multiplicity, selected
    char mass, and the realized selection rate in ppm. SHARES
    :func:`_mix_walk`'s single lazy plan with q229 (one code path, two
    views — the q226/q227 discipline), so the published plan can never
    drift from the per-doc sample it summarizes. Output is |sources|
    rows; the ppm rate is the single milli-grid division, everything
    else integer-exact."""
    picks, stepped = _mix_walk(spark, sf_dir)
    rolled = picks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        F.sum("n_chars").cast("long").alias("sel_chars"),
    )
    return (
        stepped.join(rolled, "source", "left")
        .select(
            "source",
            "t_chars",
            "n_target",
            "step",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce(F.col("sel_chars"), F.lit(0)).cast("long").alias("sel_chars"),
            F.expr(
                "CAST(round(CAST(coalesce(sel_chars, 0) AS DOUBLE) * 1000000.0"
                " / t_chars) AS BIGINT)"
            ).alias("sel_rate_ppm"),
        )
        .orderBy("source")
    )
