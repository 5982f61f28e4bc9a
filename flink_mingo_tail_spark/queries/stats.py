"""Statistical / behavioral analytics: transition matrices, RFM
segmentation, two-sample tests, distribution distances, robust stats.

The experiment-analysis and corpus-comparison layer a 100 TB pipeline
runs beside the relational core: Markov transition matrices over event
sequences, RFM customer segmentation, Welch two-sample t statistics,
Hellinger/chi-square distances between per-source token distributions,
and winsorized robust means. Reference parity: the reference engine
(JaiHirsch/flink-mingo-tail) has no analytics surface; these extend the
declared engine the same way the dedup/text families do.

Cross-engine determinism: counts and scaled-long sums everywhere;
where a statistic is irreducibly real-valued (t statistic, sqrt-based
distances) both engines evaluate the IDENTICAL IEEE-754 expression
tree over exact integer aggregates (+,-,*,/ and sqrt are all
correctly-rounded per IEEE-754, so bit-equality holds; no libm
transcendentals — which are NOT correctly rounded — are used
anywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread

_US_DAY = 86_400_000_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q160 — first-order Markov transition matrix over event sequences
# ---------------------------------------------------------------------------

@query(
    "q160_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type AS state_from,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS state_to
      FROM events
    ), c AS (
      SELECT state_from, state_to, count(*) AS n_trans
      FROM s WHERE state_to IS NOT NULL
      GROUP BY state_from, state_to
    )
    SELECT state_from, state_to, n_trans,
           CAST(round(n_trans * 1000000.0 /
                      sum(n_trans) OVER (PARTITION BY state_from)) AS BIGINT)
             AS p_micro
    FROM c
    ORDER BY state_from, state_to
    """,
)
def q160_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next = b | current = a), the sequence model behind
    next-action prediction and session simulation.

    Plan: ONE shuffle on user_id serves the lead() window; the
    transition count is a map-side-combinable hash aggregate over the
    (|states|^2)-sized key space, and the row-normalization rides a
    window over that tiny frame — nothing downstream of the first
    shuffle scales with event volume. Sequence order is the total
    (event-time, event_id) order, so replays are deterministic.
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state_from"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    c = (
        e.withColumn("state_to", F.lead("state_from").over(w))
        .filter(F.col("state_to").isNotNull())
        .groupBy("state_from", "state_to")
        .agg(F.count("*").alias("n_trans"))
    )
    tot = Window.partitionBy("state_from")
    return (
        c.withColumn(
            "p_micro",
            F.round(F.col("n_trans") * 1000000.0 / F.sum("n_trans").over(tot), 0).cast("long"),
        )
        .orderBy("state_from", "state_to")
    )


# ---------------------------------------------------------------------------
# q161 — RFM customer segmentation (recency / frequency / monetary quartiles)
# ---------------------------------------------------------------------------

@query(
    "q161_rfm_segments",
    oracle=f"""
    WITH ref AS (
      SELECT max(epoch_us(o_orderdate)) // {_US_DAY} AS ref_day FROM orders
    ), rfm AS (
      SELECT o_custkey,
             (SELECT ref_day FROM ref)
               - max(epoch_us(o_orderdate)) // {_US_DAY} AS r_days,
             count(*) AS f_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_100
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, r_days, f_orders, m_100,
           ntile(4) OVER (ORDER BY r_days, o_custkey) AS r_q,
           ntile(4) OVER (ORDER BY f_orders DESC, o_custkey) AS f_q,
           ntile(4) OVER (ORDER BY m_100 DESC, o_custkey) AS m_q,
           ntile(4) OVER (ORDER BY r_days, o_custkey) * 100
             + ntile(4) OVER (ORDER BY f_orders DESC, o_custkey) * 10
             + ntile(4) OVER (ORDER BY m_100 DESC, o_custkey) AS segment
    FROM rfm
    ORDER BY o_custkey
    """,
)
def q161_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, days since last order (recency),
    order count (frequency), lifetime spend (monetary), each cut into
    quartiles — segment 111 is the best-of-all-three cohort.

    The per-customer rollup is one keyed hash aggregate; the reference
    day is a 1-row broadcast. The quartile cuts do NOT use Spark's
    ntile window: an ORDER-BY-only window moves the whole customer
    frame to one task (WindowExec "No Partition Defined" — the
    single-partition scale bug). Each cut instead runs
    operators/ranks.distributed_ntile — value-bucketed exact global
    row numbers (two-level prefix counts, the q151 pattern) + the
    closed-form SQL-standard tile assignment — so per-task state stays
    bounded at any customer count while remaining bit-identical to the
    DuckDB ntile oracle. Ties are broken by custkey, so the cut is a
    total order and replay-deterministic.

    The three cuts run INDEPENDENTLY on the narrow rfm frame and join
    back on o_custkey (round-8 post-mortem, PLANS.md): the previous
    spelling CHAINED them (each ntile windowing the previous cut's
    ever-wider output), which serialized the window stages and
    quintupled the physical plan (1533 nodes -> 291; 2.65 s -> 1.71 s
    at sf0.1 in-session). Independent cuts are also the 100 TB shape:
    the three (custkey, tile) legs are embarrassingly parallel and the
    final joins co-partition on the same key.
    """
    from flink_mingo_tail_spark.operators.ranks import distributed_ntile
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}").alias("day"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("p100"),
    )
    rfm = o.groupBy("o_custkey").agg(
        F.max("day").alias("last_day"),
        F.count("*").alias("f_orders"),
        F.sum("p100").alias("m_100"),
    )
    ref = rfm.agg(F.max("last_day").alias("ref_day"))
    rfm = rfm.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        (F.col("ref_day") - F.col("last_day")).alias("r_days"),
        "f_orders",
        "m_100",
    )
    # r14 optimization: materialize the per-customer rollup once. The
    # three independent ntile cuts each re-ran the orders scan + rollup
    # + reference-day aggregate (26 scans in the physical plan,
    # plans/r14/q161_*_before.txt); the rfm frame is |customers| narrow
    # rows — the frame every leg and the final joins want anyway.
    rfm = rfm.localCheckpoint()
    res = rfm
    # widths sized to the metric domains: offsets frames stay in the
    # hundreds of rows while per-bucket partitions stay balanced
    for value, out, width in (
        (F.col("r_days"), "r_q", 16),
        (-F.col("f_orders"), "f_q", 2),
        (-F.col("m_100"), "m_q", 1_000_000),
    ):
        cut = distributed_ntile(
            rfm, value, F.col("o_custkey"), k=4, out=out, width=width
        ).select("o_custkey", out)
        res = res.join(cut, "o_custkey")
    return (
        res.select(
            "o_custkey", "r_days", "f_orders", "m_100", "r_q", "f_q", "m_q",
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).alias("segment"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# q162 — Welch two-sample t statistic per event type (A/B cohorts)
# ---------------------------------------------------------------------------

# identical final expression tree in BOTH engines, evaluated over exact
# integer aggregates (n, s, ss in v100 units). Welch's t and the
# Welch–Satterthwaite degrees of freedom; sqrt is IEEE-correctly-rounded,
# so the doubles agree bit-for-bit.
_WELCH_FINAL = """
  CAST(round((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2) * 100.0
             / sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/n1)/(n1-1))/n1
                  + ((CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE)/n2)/(n2-1))/n2)
             * 1000000.0 / 100.0) AS BIGINT)
"""


@query(
    "q162_welch_ttest",
    oracle=f"""
    WITH t AS (
      SELECT event_type, user_id % 2 AS cohort,
             CAST(round(value * 100) AS BIGINT) AS v100
      FROM events
    ), g AS (
      SELECT event_type,
             count(*) FILTER (cohort = 0) AS n1,
             CAST(sum(v100) FILTER (cohort = 0) AS BIGINT) AS s1,
             CAST(sum(v100 * v100) FILTER (cohort = 0) AS BIGINT) AS ss1,
             count(*) FILTER (cohort = 1) AS n2,
             CAST(sum(v100) FILTER (cohort = 1) AS BIGINT) AS s2,
             CAST(sum(v100 * v100) FILTER (cohort = 1) AS BIGINT) AS ss2
      FROM t GROUP BY event_type
    )
    SELECT event_type, n1, n2,
           CAST(round((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2) * 100.0) AS BIGINT)
             AS mean_diff_cents,
           {_WELCH_FINAL} AS t_micro
    FROM g WHERE n1 >= 2 AND n2 >= 2
    ORDER BY event_type
    """,
)
def q162_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic comparing event
    values between two user cohorts (split on user parity — the stand-in
    for an A/B assignment column), per event type: the experiment
    read-out primitive.

    One hash aggregate with FILTER clauses produces both cohorts' exact
    integer moments (n, sum, sum-of-squares in v100 units) in a single
    pass — no self-join of per-cohort subqueries, map-side combinable,
    scale-free downstream. The t statistic itself is a per-group scalar
    expression over those six integers; both engines evaluate the same
    tree (sqrt included) bit-for-bit.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("cohort"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v100"),
    )
    c0, c1 = F.col("cohort") == 0, F.col("cohort") == 1
    g = e.groupBy("event_type").agg(
        F.count_if(c0).alias("n1"),
        F.sum(F.when(c0, F.col("v100"))).alias("s1"),
        F.sum(F.when(c0, F.col("v100") * F.col("v100"))).alias("ss1"),
        F.count_if(c1).alias("n2"),
        F.sum(F.when(c1, F.col("v100"))).alias("s2"),
        F.sum(F.when(c1, F.col("v100") * F.col("v100"))).alias("ss2"),
    )
    return (
        g.filter((F.col("n1") >= 2) & (F.col("n2") >= 2))
        .select(
            "event_type", "n1", "n2",
            F.expr(
                "CAST(round((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2) * 100.0) AS BIGINT)"
            ).alias("mean_diff_cents"),
            F.expr(_WELCH_FINAL).alias("t_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q163 — Hellinger affinity + chi-square distance between source vocabularies
# ---------------------------------------------------------------------------

_P12 = 1_000_000_000_000  # distribution terms are summed as 1e-12-scaled longs


@query(
    "q163_source_divergence",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS tk FROM documents
    ), c AS (
      SELECT source, tk, count(*) AS c FROM tok GROUP BY source, tk
    ), tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY source
    ), d AS (
      SELECT c.source, c.tk, CAST(c.c AS DOUBLE) / tot.t AS p
      FROM c JOIN tot USING (source)
    ), pair AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(round(sqrt(a.p * b.p) * {_P12}) AS BIGINT) AS bc_t,
             CAST(round((a.p - b.p) * (a.p - b.p) / (a.p + b.p) * {_P12}) AS BIGINT) AS x2_t,
             CAST(round(a.p * {_P12}) AS BIGINT) AS pa_t,
             CAST(round(b.p * {_P12}) AS BIGINT) AS pb_t
      FROM d a JOIN d b ON a.tk = b.tk AND a.source < b.source
    )
    SELECT source_a, source_b, count(*) AS n_shared,
           CAST(sum(bc_t) AS BIGINT) AS bc_p12,
           CAST(sum(x2_t) + ({_P12} - sum(pa_t)) + ({_P12} - sum(pb_t)) AS BIGINT)
             AS chi2_p12
    FROM pair
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
)
def q163_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distance between per-source token distributions:
    Bhattacharyya/Hellinger affinity sum(sqrt(p*q)) and chi-square
    distance sum((p-q)^2/(p+q)) — the corpus-drift monitors a training
    pipeline runs when mixing sources (Hellinger^2 = 1 - affinity/1e12).

    Tokens OUTSIDE the shared vocabulary never join, so their
    closed-form contributions (0 for the affinity; p resp. q for
    chi-square) are folded in algebraically via sum_inter(p): chi2 =
    sum_inter + (1 - sum_inter p) + (1 - sum_inter q). That turns a
    full-outer join with zero-fill into an INNER join on (token) — one
    equi-join over the |vocab x sources| frame, event volume touched
    once by the count aggregate. Distance terms (sqrt is IEEE-exact)
    are rounded to 1e-12-scaled longs BEFORE summing, so the
    order-dependent double sum becomes an exact integer sum.
    """
    doc = _t(spark, sf_dir, "documents")
    c = (
        doc.select("source", F.explode(F.split("text", " ", -1)).alias("tk"))
        .groupBy("source", "tk")
        .agg(F.count("*").alias("c"))
    )
    tot = c.groupBy("source").agg(F.sum("c").alias("t"))
    d = c.join(F.broadcast(tot), "source").select(
        "source", "tk", (F.col("c").cast("double") / F.col("t")).alias("p")
    )
    a, b = d.alias("a"), d.alias("b")
    pair = (
        a.join(b, (F.col("a.tk") == F.col("b.tk")) & (F.col("a.source") < F.col("b.source")))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.round(F.sqrt(F.col("a.p") * F.col("b.p")) * _P12, 0).cast("long").alias("bc_t"),
            F.round(
                (F.col("a.p") - F.col("b.p")) * (F.col("a.p") - F.col("b.p"))
                / (F.col("a.p") + F.col("b.p")) * _P12, 0,
            ).cast("long").alias("x2_t"),
            F.round(F.col("a.p") * _P12, 0).cast("long").alias("pa_t"),
            F.round(F.col("b.p") * _P12, 0).cast("long").alias("pb_t"),
        )
    )
    return (
        pair.groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_shared"),
            F.sum("bc_t").alias("bc_p12"),
            (
                F.sum("x2_t")
                + (F.lit(_P12) - F.sum("pa_t"))
                + (F.lit(_P12) - F.sum("pb_t"))
            ).alias("chi2_p12"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q167 — winsorized robust mean per event type (clamp at p05/p95)
# ---------------------------------------------------------------------------

@query(
    "q167_winsorized_stats",
    oracle="""
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v100 FROM events
    ), b AS (
      SELECT event_type,
             CAST(round(quantile_cont(v100, 0.05)) AS BIGINT) AS lo_100,
             CAST(round(quantile_cont(v100, 0.95)) AS BIGINT) AS hi_100
      FROM t GROUP BY event_type
    ), w AS (
      SELECT t.event_type, b.lo_100, b.hi_100,
             least(greatest(t.v100, b.lo_100), b.hi_100) AS wv
      FROM t JOIN b USING (event_type)
    )
    SELECT event_type, lo_100, hi_100, count(*) AS n,
           CAST(sum(wv) AS BIGINT) AS wsum_100,
           CAST(round(sum(wv) * 10000.0 / count(*)) AS BIGINT) AS wmean_micro
    FROM w GROUP BY event_type, lo_100, hi_100
    ORDER BY event_type
    """,
)
def q167_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clamp values into the exact
    [p05, p95] interpolated-percentile band, then average — the robust
    location estimate that survives the heavy tails raw means drown in.

    Two passes over events (percentile aggregate, then clamp+sum) with
    the 1-row-per-type bounds frame joined back by BROADCAST — no
    second shuffle of the fact table. Bounds are rounded to integer
    v100 BEFORE clamping so every clamped value is an exact long and
    the winsorized sum is order-independent across any partitioning.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v100")
    )
    b = e.groupBy("event_type").agg(
        F.round(F.percentile("v100", 0.05), 0).cast("long").alias("lo_100"),
        F.round(F.percentile("v100", 0.95), 0).cast("long").alias("hi_100"),
    )
    w = e.join(F.broadcast(b), "event_type").select(
        "event_type", "lo_100", "hi_100",
        F.least(F.greatest(F.col("v100"), F.col("lo_100")), F.col("hi_100")).alias("wv"),
    )
    return (
        w.groupBy("event_type", "lo_100", "hi_100")
        .agg(
            F.count("*").alias("n"),
            F.sum("wv").alias("wsum_100"),
            F.round(F.sum("wv") * 10000.0 / F.count("*"), 0).cast("long").alias("wmean_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q169 — categorical profile: mode + Gini impurity per event type
# ---------------------------------------------------------------------------

@query(
    "q169_mode_gini_profile",
    oracle="""
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v100 FROM events
    ), c AS (
      SELECT event_type, v100, count(*) AS c FROM t GROUP BY event_type, v100
    )
    SELECT event_type,
           first(v100 ORDER BY c DESC, v100) AS mode_100,
           CAST(max(c) AS BIGINT) AS n_mode,
           count(*) AS n_distinct,
           CAST(sum(c) AS BIGINT) AS n,
           CAST((sum(c)*sum(c) - sum(c*c)) * 1000000 // (sum(c)*sum(c)) AS BIGINT)
             AS gini_ppm
    FROM c GROUP BY event_type
    ORDER BY event_type
    """,
)
def q169_mode_gini_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical column profile per event type: the mode (most
    frequent value, ties to the smallest), its support, distinct
    count, and Gini impurity 1 - sum(p^2) — the concentration metric
    that needs NO logarithm, so unlike Shannon entropy it is exactly
    computable in integers and bit-matched across engines:
    gini_ppm = (n^2 - sum(c^2)) * 1e6 DIV n^2 (n <= 6e5 at sf0.1 keeps
    every product under 2^62).

    Two hash aggregates: the (type, value) count frame is bounded by
    the value domain times the type count regardless of event volume,
    so the second pass — including the argmax-by-count struct min —
    runs over a frame that never scales with the corpus.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v100")
    )
    c = e.groupBy("event_type", "v100").agg(F.count("*").alias("c"))
    return (
        c.groupBy("event_type")
        .agg(
            F.min(F.struct((-F.col("c")).alias("cneg"), F.col("v100")))
            .getField("v100")
            .alias("mode_100"),
            F.max("c").alias("n_mode"),
            F.count("*").alias("n_distinct"),
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("c")).alias("__s2"),
        )
        # integer DIV, not float division: the ppm numerator exceeds
        # 2^53 once n > ~3e6 and double rounding would drift off the
        # oracle's exact // by one ulp-sized step
        .withColumn("gini_ppm", F.expr("(n * n - __s2) * 1000000 DIV (n * n)"))
        .drop("__s2")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q174 — per-group OLS (slope / intercept / R^2 from exact moments)
# ---------------------------------------------------------------------------


@query(
    "q174_group_ols",
    oracle="""
    WITH t AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_quantity * 100) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ), s AS (
      SELECT flag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM t GROUP BY flag
    )
    SELECT flag, n,
           CAST(round(1000000.0
                * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
               AS slope_micro,
           CAST(round(1000000.0
                * (CAST(sy AS DOUBLE)
                   - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     * CAST(sx AS DOUBLE))
                / CAST(n AS DOUBLE)) AS BIGINT)
               AS intercept_micro,
           CAST(round(1000000.0
                * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(n AS DOUBLE) * syy
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)
               AS r2_micro
    FROM s
    ORDER BY flag
    """,
)
def q174_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (extendedprice ~ quantity per
    return flag): slope, intercept and R^2 from ONE exact-integer
    moment pass — the grouped regression a feature/experiment pipeline
    runs at the 100 TB grain, in the q130 determinism discipline
    (F.corr / Spark's covar are running accumulations and therefore
    partition-order dependent; integer moments are not).

    One map-side-combinable hash aggregate collects n/Σx/Σy/Σxy/Σx²
    (Σy² rides the decimal accumulator — cents² passes 2^63); slope =
    (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept = (Σy − slope·Σx)/n, R² =
    cov²/(var_x·var_y), each evaluated once per group on doubles from
    identical integers with an identical IEEE tree — bit-equal across
    engines, micro-rounded long output."""
    li = _t(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    y_dec = F.col("y").cast("decimal(12,0)")
    s = t.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(y_dec * y_dec).cast("double").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov = d("n") * d("sxy") - d("sx") * d("sy")
    var_x = d("n") * d("sxx") - d("sx") * d("sx")
    var_y = d("n") * F.col("syy") - d("sy") * d("sy")
    slope = cov / var_x
    return s.select(
        "flag",
        "n",
        F.round(F.lit(1e6) * slope, 0).cast("long").alias("slope_micro"),
        F.round(F.lit(1e6) * (d("sy") - slope * d("sx")) / d("n"), 0)
        .cast("long")
        .alias("intercept_micro"),
        F.round(F.lit(1e6) * cov * cov / (var_x * var_y), 0)
        .cast("long")
        .alias("r2_micro"),
    ).orderBy("flag")


# ---------------------------------------------------------------------------
# q179 — distributed exact AUC (Mann-Whitney) per source
# ---------------------------------------------------------------------------

@query(
    "q179_auc_mann_whitney",
    oracle="""
    WITH t AS (
      SELECT source, n_chars AS v,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ), g AS (
      SELECT source, v,
             CAST(sum(pos) AS BIGINT) AS np,
             CAST(count(*) - sum(pos) AS BIGINT) AS nn
      FROM t GROUP BY source, v
    ), p AS (
      SELECT source, v, np, nn,
             CAST(coalesce(sum(nn) OVER (
                 PARTITION BY source ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS nbelow
      FROM g
    )
    SELECT source,
           CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(round(CAST(sum(2 * nbelow * np + nn * np) AS DOUBLE) * 1000000.0
                      / (2.0 * sum(np) * sum(nn))) AS BIGINT) AS auc_micro
    FROM p GROUP BY source
    HAVING sum(np) > 0 AND sum(nn) > 0
    ORDER BY source
    """,
)
def q179_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC (Mann-Whitney U) per source: how well document length
    separates English from non-English — the classifier-evaluation
    primitive a quality-filter pipeline runs after every scoring model.

    AUC = P(score_pos > score_neg) + P(score_pos = score_neg)/2,
    computed exactly from the distinct-score frame: group to
    (source, score) with positive/negative counts, then the
    strictly-below negative count per distinct score is a
    ``grouped_prefix_sum`` — the two-level bounded-state prefix (no
    corpus-sized window task; the cross-bucket cumsum rides the tiny
    per-(source, bucket) subtotal frame). The ×2 numerator keeps the
    half-credit tie term in exact int64; the ONLY double op is the
    final division, the identical IEEE expression in both engines.
    """
    from flink_mingo_tail_spark.operators.ranks import grouped_prefix_sum

    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").alias("v"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    g = d.groupBy("source", "v").agg(
        F.sum("pos").cast("long").alias("np"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("nn"),
    )
    p = grouped_prefix_sum(
        g, ["source"], F.col("v"), {"nbelow": F.col("nn")}, width=64, inclusive=False
    )
    return (
        p.groupBy("source")
        .agg(
            F.sum("np").cast("long").alias("n_pos"),
            F.sum("nn").cast("long").alias("n_neg"),
            F.sum(
                F.lit(2) * F.col("nbelow") * F.col("np") + F.col("nn") * F.col("np")
            ).alias("numer2"),
        )
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "source",
            "n_pos",
            "n_neg",
            F.expr(
                "CAST(round(CAST(numer2 AS DOUBLE) * 1000000.0"
                " / (2.0 * n_pos * n_neg)) AS BIGINT)"
            ).alias("auc_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q180 — two-sample Kolmogorov-Smirnov distance per event type
# ---------------------------------------------------------------------------

@query(
    "q180_ks_two_sample",
    oracle="""
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v100,
             user_id % 2 AS cohort
      FROM events
    ), g AS (
      SELECT event_type, v100,
             CAST(count(*) FILTER (cohort = 0) AS BIGINT) AS c1,
             CAST(count(*) FILTER (cohort = 1) AS BIGINT) AS c2
      FROM t GROUP BY event_type, v100
    ), p AS (
      SELECT event_type, v100, c1, c2,
             CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY v100
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             CAST(sum(c2) OVER (PARTITION BY event_type ORDER BY v100
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM g
    ), n AS (
      SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM g GROUP BY event_type
    )
    SELECT p.event_type AS event_type, n1, n2,
           CAST(round(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE) * 1000000.0
                      / (CAST(n1 AS DOUBLE) * n2)) AS BIGINT) AS ks_micro
    FROM p JOIN n ON p.event_type = n.event_type
    WHERE n1 > 0 AND n2 > 0
    GROUP BY p.event_type, n1, n2
    ORDER BY event_type
    """,
)
def q180_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two user cohorts (parity split), per event type —
    the distribution-drift alarm run between every data refresh.

    D = max over distinct values of |ECDF1 - ECDF2|. Both ECDFs are
    inclusive running counts over the distinct-(event_type, v100)
    frame via ONE ``grouped_prefix_sum`` call (two measures share the
    same two-level pass). The comparison is cross-multiplied —
    |cum1*n2 - cum2*n1| — so the max is taken over exact int64s; the
    single final division is the identical IEEE expression in both
    engines. Everything after the first groupBy scales with the
    distinct-value domain, not event volume.
    """
    from flink_mingo_tail_spark.operators.ranks import grouped_prefix_sum

    t = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
        (F.col("user_id") % 2).alias("cohort"),
    )
    g = t.groupBy("event_type", "v100").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("long").alias("c2"),
    )
    p = grouped_prefix_sum(
        g,
        ["event_type"],
        F.col("v100"),
        {"cum1": F.col("c1"), "cum2": F.col("c2")},
        width=1024,
        inclusive=True,
    )
    # n1/n2 are the last (= max, the counts are non-negative) values of
    # the inclusive running sums — read them off p with one window
    # instead of re-aggregating g (whose events scan would re-run)
    from pyspark.sql import Window

    n_w = Window.partitionBy("event_type")
    return (
        p.withColumn("n1", F.max("cum1").over(n_w).cast("long"))
        .withColumn("n2", F.max("cum2").over(n_w).cast("long"))
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy("event_type", "n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            ).alias("maxd")
        )
        .select(
            "event_type",
            "n1",
            "n2",
            F.expr(
                "CAST(round(CAST(maxd AS DOUBLE) * 1000000.0 / (CAST(n1 AS DOUBLE) * n2))"
                " AS BIGINT)"
            ).alias("ks_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q181 — chi-square independence cells: source x length-bucket
# ---------------------------------------------------------------------------

@query(
    "q181_chi2_independence",
    oracle="""
    WITH t AS (
      SELECT source, n_chars // 100 AS bucket FROM documents
    ), o AS (
      SELECT source, bucket, CAST(count(*) AS BIGINT) AS obs
      FROM t GROUP BY source, bucket
    ), r AS (
      SELECT source, CAST(sum(obs) AS BIGINT) AS row_tot FROM o GROUP BY source
    ), c AS (
      SELECT bucket, CAST(sum(obs) AS BIGINT) AS col_tot FROM o GROUP BY bucket
    ), n AS (
      SELECT CAST(sum(obs) AS BIGINT) AS n_tot FROM o
    )
    SELECT o.source AS source, o.bucket AS bucket, obs,
           CAST(round((CAST(row_tot AS DOUBLE) * col_tot / n_tot) * 1000000.0)
             AS BIGINT) AS e_micro,
           CAST(round((obs - CAST(row_tot AS DOUBLE) * col_tot / n_tot)
                      * (obs - CAST(row_tot AS DOUBLE) * col_tot / n_tot)
                      / (CAST(row_tot AS DOUBLE) * col_tot / n_tot)
                      * 1000000.0) AS BIGINT) AS contrib_micro
    FROM o JOIN r ON o.source = r.source
           JOIN c ON o.bucket = c.bucket
           CROSS JOIN n
    ORDER BY source, bucket
    """,
)
def q181_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for the source x length-bucket
    contingency table: observed count, expected count under
    independence, and the per-cell chi-square contribution — the
    corpus-balance diagnostic (is length distribution uniform across
    sources?) behind mixture reweighting.

    One hash aggregate builds the contingency table; the row/column/
    grand margins are three aggregates OF that tiny table (bounded by
    |sources| x |buckets|, never by corpus size), broadcast back onto
    it. The expected-count expression is spelled once and identically
    in both engines: e = (double(row_tot) * col_tot) / n_tot.
    """
    t = _t(spark, sf_dir, "documents").select(
        "source", F.expr("n_chars div 100").alias("bucket")
    )
    o = t.groupBy("source", "bucket").agg(F.count(F.lit(1)).cast("long").alias("obs"))
    r = o.groupBy("source").agg(F.sum("obs").cast("long").alias("row_tot"))
    c = o.groupBy("bucket").agg(F.sum("obs").cast("long").alias("col_tot"))
    n = o.agg(F.sum("obs").cast("long").alias("n_tot"))
    e = "(CAST(row_tot AS DOUBLE) * col_tot / n_tot)"
    return (
        o.join(F.broadcast(r), "source")
        .join(F.broadcast(c), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "bucket",
            "obs",
            F.expr(f"CAST(round({e} * 1000000.0) AS BIGINT)").alias("e_micro"),
            F.expr(
                f"CAST(round((obs - {e}) * (obs - {e}) / {e} * 1000000.0) AS BIGINT)"
            ).alias("contrib_micro"),
        )
        .orderBy("source", "bucket")
    )


# ---------------------------------------------------------------------------
# q186 — Cohen's kappa: agreement between two cheap quality raters
# ---------------------------------------------------------------------------

@query(
    "q186_cohens_kappa",
    oracle="""
    WITH t AS (
      SELECT source,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r1,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS r2
      FROM documents
    ), c AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r1 * r2) AS BIGINT) AS n11,
             CAST(sum(r1 * (1 - r2)) AS BIGINT) AS n10,
             CAST(sum((1 - r1) * r2) AS BIGINT) AS n01,
             CAST(sum((1 - r1) * (1 - r2)) AS BIGINT) AS n00
      FROM t GROUP BY source
    )
    SELECT source, n, n11, n10, n01, n00,
           CAST(round(
             CAST((n11 + n00) * n - ((n11 + n10) * (n11 + n01)
                                   + (n01 + n00) * (n10 + n00)) AS DOUBLE)
             * 1000000.0
             / (CAST(n AS DOUBLE) * n - ((n11 + n10) * (n11 + n01)
                                       + (n01 + n00) * (n10 + n00)))
           ) AS BIGINT) AS kappa_micro
    FROM c
    WHERE CAST(n AS DOUBLE) * n <> ((n11 + n10) * (n11 + n01)
                                  + (n01 + n00) * (n10 + n00))
    ORDER BY source
    """,
)
def q186_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per source between two cheap raters — the
    language-ID rater (lang = 'en') and a length-threshold quality
    rater (n_chars >= 300): the inter-annotator-agreement statistic a
    labeling pipeline computes before trusting silver labels.

    kappa = (po - pe) / (1 - pe) rewritten over exact int64 counts:
    numerator (n11+n00)*n - pe_num and denominator n^2 - pe_num with
    pe_num = row1*col1 + row0*col0 — ONE IEEE division at the end,
    spelled identically in both engines. One hash aggregate over the
    corpus; everything after is per-group scalar arithmetic.
    """
    t = _t(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("r1"),
        F.when(F.col("n_chars") >= 300, F.lit(1)).otherwise(F.lit(0)).alias("r2"),
    )
    c = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r1") * F.col("r2")).cast("long").alias("n11"),
        F.sum(F.col("r1") * (1 - F.col("r2"))).cast("long").alias("n10"),
        F.sum((1 - F.col("r1")) * F.col("r2")).cast("long").alias("n01"),
        F.sum((1 - F.col("r1")) * (1 - F.col("r2"))).cast("long").alias("n00"),
    )
    pe_num = "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
    return (
        c.filter(F.expr(f"CAST(n AS DOUBLE) * n <> {pe_num}"))
        .select(
            "source", "n", "n11", "n10", "n01", "n00",
            F.expr(
                f"CAST(round(CAST((n11 + n00) * n - {pe_num} AS DOUBLE) * 1000000.0"
                f" / (CAST(n AS DOUBLE) * n - {pe_num})) AS BIGINT)"
            ).alias("kappa_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q187 — classifier calibration bins + ECE contributions
# ---------------------------------------------------------------------------

@query(
    "q187_calibration_ece",
    oracle="""
    WITH t AS (
      SELECT n_chars % 100 AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ), b AS (
      SELECT s // 10 AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS sum_s,
             CAST(sum(pos) AS BIGINT) AS n_pos
      FROM t GROUP BY s // 10
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS big_n FROM b
    )
    SELECT bin, n, n_pos,
           CAST(round(CAST(sum_s AS DOUBLE) * 1000000.0 / (100.0 * n)) AS BIGINT) AS conf_micro,
           CAST(round(CAST(n_pos AS DOUBLE) * 1000000.0 / n) AS BIGINT) AS acc_micro,
           CAST(round(CAST(abs(100 * n_pos - sum_s) AS DOUBLE) * 1000000.0
                      / (100.0 * big_n)) AS BIGINT) AS ece_contrib_micro
    FROM b CROSS JOIN tot
    ORDER BY bin
    """,
)
def q187_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a classifier score (the n_chars %
    100 proxy probability, in percent) against the lang = 'en' label:
    per-bin mean confidence, empirical accuracy, and the bin's
    expected-calibration-error contribution (n_b / N * |acc - conf|) —
    the post-training eval every quality-scoring model gets.

    The ECE numerator is kept exact: |acc - conf| = |100*n_pos - sum_s|
    / (100n), so the contribution reduces to |100*n_pos - sum_s| /
    (100N) — ONE int64 absolute difference and ONE IEEE division,
    identical in both engines. One hash aggregate to 10 bins; the
    grand total is a broadcast one-row frame.
    """
    t = _t(spark, sf_dir, "documents").select(
        (F.col("n_chars") % 100).alias("s"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    b = t.groupBy(F.expr("s div 10").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("sum_s"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    tot = b.agg(F.sum("n").cast("long").alias("big_n"))
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n", "n_pos",
            F.expr("CAST(round(CAST(sum_s AS DOUBLE) * 1000000.0 / (100.0 * n)) AS BIGINT)").alias("conf_micro"),
            F.expr("CAST(round(CAST(n_pos AS DOUBLE) * 1000000.0 / n) AS BIGINT)").alias("acc_micro"),
            F.expr(
                "CAST(round(CAST(abs(100 * n_pos - sum_s) AS DOUBLE) * 1000000.0 / (100.0 * big_n)) AS BIGINT)"
            ).alias("ece_contrib_micro"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q191 — Spearman rank correlation per event type (value vs hour-of-day)
# ---------------------------------------------------------------------------

_US_HOUR = 3_600_000_000


@query(
    "q191_spearman_corr",
    oracle=f"""
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v100,
             (epoch_us(ts) % {_US_DAY}) // {_US_HOUR} AS hr
      FROM events
    ), g AS (
      SELECT event_type, v100, hr, CAST(count(*) AS BIGINT) AS cnt
      FROM t GROUP BY event_type, v100, hr
    ), gx AS (
      SELECT event_type, v100, CAST(sum(cnt) AS BIGINT) AS cx
      FROM g GROUP BY event_type, v100
    ), px AS (
      SELECT event_type, v100,
             2 * CAST(coalesce(sum(cx) OVER (
                 PARTITION BY event_type ORDER BY v100
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               + cx + 1 AS rx2
      FROM gx
    ), gy AS (
      SELECT event_type, hr, CAST(sum(cnt) AS BIGINT) AS cy
      FROM g GROUP BY event_type, hr
    ), py AS (
      SELECT event_type, hr,
             2 * CAST(coalesce(sum(cy) OVER (
                 PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               + cy + 1 AS ry2
      FROM gy
    ), gn AS (
      SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n
      FROM g GROUP BY event_type
    ), j AS (
      SELECT g.event_type, g.cnt,
             px.rx2 - (gn.n + 1) AS rxc,
             py.ry2 - (gn.n + 1) AS ryc,
             gn.n
      FROM g
      JOIN px ON px.event_type = g.event_type AND px.v100 = g.v100
      JOIN py ON py.event_type = g.event_type AND py.hr = g.hr
      JOIN gn ON gn.event_type = g.event_type
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(round(CAST(sum(cnt * rxc * ryc) AS DOUBLE) * 1000000.0
                      / sqrt(CAST(sum(cnt * rxc * rxc) AS DOUBLE)
                             * CAST(sum(cnt * ryc * ryc) AS DOUBLE))) AS BIGINT)
             AS rho_micro
    FROM j GROUP BY event_type
    ORDER BY event_type
    """,
)
def q191_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per event type between value and
    hour-of-day — "does this metric drift monotonically across the
    day", the nonparametric twin of q130's Pearson profile and a
    standard data-quality / drift diagnostic.

    Exact tie-averaged ranks WITHOUT a corpus window: both rank frames
    ride the DISTINCT-VALUE domain, not rows — (type, v100) and
    (type, hour) get strictly-below prefix counts via
    ``grouped_prefix_sum`` (two-level bounded state), and the doubled
    average rank 2*below + cnt + 1 stays in exact int64. Centering by
    -(n+1) makes each group's rank sum EXACTLY zero (average ranks
    preserve the total), so rho needs no mean-correction terms: one
    joint-frame aggregate of cnt*rxc*ryc / cnt*rxc^2 / cnt*ryc^2, all
    integer-exact, and the single double op is the final
    round(1e6 * sxy / sqrt(sxx*syy)) — the identical IEEE expression in
    both engines. The joint frame is bounded by |v100 domain| x 24 per
    type, never by row count; int64 holds while n^3 * 4 < 2^63 (n <
    ~1.3M rows per type) and BOTH engines fail loudly past it (ANSI
    overflow), never silently.
    """
    from flink_mingo_tail_spark.operators.ranks import grouped_prefix_sum

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v100"),
        F.expr(
            f"(unix_micros(CAST(ts AS TIMESTAMP)) % {_US_DAY}) div {_US_HOUR}"
        ).alias("hr"),
    )
    # r14 optimization: the joint (type, v100, hr) count frame is the
    # one corpus-sized aggregate and feeds FOUR branches (gx, gy, gn,
    # the joint join) — lazily each branch re-ran the events scan +
    # aggregate (6 scans in the plan). Materialize the bounded domain
    # frame once.
    g = e.groupBy("event_type", "v100", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint()
    gx = g.groupBy("event_type", "v100").agg(F.sum("cnt").cast("long").alias("cx"))
    px = grouped_prefix_sum(
        gx, ["event_type"], F.col("v100"), {"below": F.col("cx")}, width=64,
        inclusive=False,
    ).select(
        "event_type", "v100",
        (F.lit(2) * F.col("below") + F.col("cx") + 1).alias("rx2"),
    )
    gy = g.groupBy("event_type", "hr").agg(F.sum("cnt").cast("long").alias("cy"))
    py = grouped_prefix_sum(
        gy, ["event_type"], F.col("hr"), {"below": F.col("cy")}, width=4,
        inclusive=False,
    ).select(
        "event_type", "hr",
        (F.lit(2) * F.col("below") + F.col("cy") + 1).alias("ry2"),
    )
    gn = g.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n"))
    j = (
        g.join(px, ["event_type", "v100"])
        .join(F.broadcast(py), ["event_type", "hr"])
        .join(F.broadcast(gn), "event_type")
        .select(
            "event_type", "cnt", "n",
            (F.col("rx2") - (F.col("n") + 1)).alias("rxc"),
            (F.col("ry2") - (F.col("n") + 1)).alias("ryc"),
        )
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(F.col("cnt") * F.col("rxc") * F.col("ryc")).alias("sxy"),
            F.sum(F.col("cnt") * F.col("rxc") * F.col("rxc")).alias("sxx"),
            F.sum(F.col("cnt") * F.col("ryc") * F.col("ryc")).alias("syy"),
        )
        .select(
            "event_type", "n",
            F.expr(
                "CAST(round(CAST(sxy AS DOUBLE) * 1000000.0"
                " / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))) AS BIGINT)"
            ).alias("rho_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q202 — Poisson-bootstrap confidence intervals for the per-type mean
# ---------------------------------------------------------------------------

_BOOT_B = 32  # bootstrap replicates

# Poisson(1) inverse-CDF thresholds (exact double literals, identical in
# both engines): multiplicity m = #{thresholds < u}.
_POIS = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _pois_m_sql(u: str) -> str:
    return "(" + " + ".join(f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _POIS) + ")"


@query(
    "q202_poisson_bootstrap_ci",
    oracle=f"""
    WITH t AS (
      SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS v100
      FROM events
    ), pt AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(round(CAST(sum(v100) AS DOUBLE) * 1000000.0 / count(*))
               AS BIGINT) AS mean_micro
      FROM t GROUP BY event_type
    ), reps AS (
      SELECT t.event_type, b.b, t.v100,
             CAST({_pois_m_sql(
                 "(CAST(CAST(concat('0x', substr(md5(event_id::VARCHAR || ':' || b.b::VARCHAR), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)"
             )} AS BIGINT) AS m
      FROM t CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) b
    ), rm AS (
      SELECT event_type, b,
             CAST(round(CAST(sum(m * v100) AS DOUBLE) * 1000000.0 / sum(m))
               AS BIGINT) AS rm_micro
      FROM reps GROUP BY event_type, b
      HAVING sum(m) > 0
    ), ranked AS (
      SELECT event_type, rm_micro,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY rm_micro, b) AS rnk
      FROM rm
    )
    SELECT p.event_type, p.n, p.mean_micro,
           max(CASE WHEN rnk = 2 THEN rm_micro END) AS ci_lo_micro,
           max(CASE WHEN rnk = {_BOOT_B - 1} THEN rm_micro END) AS ci_hi_micro
    FROM ranked r JOIN pt p ON p.event_type = r.event_type
    GROUP BY p.event_type, p.n, p.mean_micro
    ORDER BY p.event_type
    """,
)
def q202_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based bootstrap confidence interval for each event type's
    mean value, via the POISSON bootstrap (the resampling scheme that
    actually works distributed: classical bootstrap needs n draws WITH
    replacement from the whole dataset — a global operation — while
    Poisson(1) multiplicities are independent PER ROW, so all B=32
    replicates ride one corpus pass). The interval is the 2nd/31st of
    the 32 sorted replicate means — the standard rank-based CI at this
    replicate count.

    Deterministic: each (row, replicate) draws u from md5(event_id, b)
    — an exact rational, no RNG state — and the Poisson inverse-CDF is
    six literal threshold comparisons (no transcendentals at runtime;
    the e^-x constants are baked as identical double literals in both
    engines, keeping stats.py's no-libm contract). Replicate means are
    micro-rounded to exact int64 before ranking; the rank window rides
    the B-row per-type frame.
    """
    t = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("v100"),
    )
    # every division below CASTs its int64 operand to DOUBLE before the
    # decimal literal touches it (the house decimal-literal rule: Spark
    # ANSI would otherwise run BIGINT-vs-DECIMAL arithmetic while DuckDB
    # runs the identical text as DOUBLE)
    pt = t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(round(CAST(sum(v100) AS DOUBLE) * 1000000.0 / count(*)) AS BIGINT)"
        ).alias("mean_micro"),
    )
    u = (
        "(CAST(CAST(conv(substring(md5(concat(CAST(event_id AS STRING), ':',"
        " CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) AS DOUBLE) / 4294967296.0)"
    )
    # r14 optimization: bind u to its own projection and let the CASE
    # chain reference the COLUMN. The inline spelling pasted the
    # md5+conv expression into all six threshold comparisons and
    # neither CollapseProject nor codegen CSE deduplicated them —
    # measured 6 md5 evaluations per (row, replicate) instead of 1
    # (micro-probe: 0.49 s vs 0.25 s per 3.2M-row pass). Spark's
    # CollapseProject keeps the split because a non-cheap expression
    # referenced 6x is not inlined — exactly the barrier we want.
    # Values are bit-identical: same expression, evaluated once.
    # spread() before the explode: the single-file test scan yields ONE
    # partition, so the B x n md5 evaluations (the query's dominant
    # cost) serialize on one core — measured 3.22 s -> 0.92 s for the
    # replicate stage at sf0.1. Scale-gated inside spread(): a
    # many-file production scan is returned untouched.
    reps = (
        spread(t).select(
            "event_type",
            "v100",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
            F.col("event_id"),
        )
        .withColumn("u", F.expr(u))
        .select(
            "event_type",
            "b",
            "v100",
            F.expr(f"CAST({_pois_m_sql('u')} AS BIGINT)").alias("m"),
        )
    )
    # HAVING sum(m) > 0 (spelled identically in the oracle): a replicate
    # whose Poisson multiplicities are all zero (probability e^-n per
    # replicate) would otherwise hit DIVIDE_BY_ZERO under Spark ANSI
    # while DuckDB returns NULL — dropping the empty replicate is the
    # same deterministic choice in both engines (a dropped replicate
    # shifts the rank-based CI identically on both sides).
    rm = (
        reps.groupBy("event_type", "b")
        .agg(
            F.sum("m").cast("long").alias("sm"),
            F.sum(F.col("m") * F.col("v100")).cast("long").alias("smv"),
        )
        .filter(F.col("sm") > 0)
        .select(
            "event_type",
            "b",
            F.expr(
                "CAST(round(CAST(smv AS DOUBLE) * 1000000.0 / sm) AS BIGINT)"
            ).alias("rm_micro"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("rm_micro", "b")
    ranked = rm.withColumn("rnk", F.row_number().over(w))
    ci = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rnk") == 2, F.col("rm_micro"))).alias("ci_lo_micro"),
        F.max(F.when(F.col("rnk") == _BOOT_B - 1, F.col("rm_micro"))).alias(
            "ci_hi_micro"
        ),
    )
    return (
        pt.join(ci, "event_type")
        .select("event_type", "n", "mean_micro", "ci_lo_micro", "ci_hi_micro")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q207 — Benford first-digit deviation per event type (round 9)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) for d = 1..9, baked as identical double literals in both
# engines (the q202 Poisson-threshold precedent: constants computed once
# at import, never a runtime transcendental — stats.py's no-libm contract)
import math as _math

_BENFORD_CASE = "CASE dg " + " ".join(
    f"WHEN {d} THEN {_math.log10(1 + 1 / d)!r}" for d in range(1, 10)
) + " END"

_BENFORD_TERM = (
    "CAST(round(abs(CAST(c AS DOUBLE) / n - (" + _BENFORD_CASE + "))"
    " * 1000000.0) AS BIGINT)"
)


@query(
    "q207_benford_deviation",
    oracle=f"""
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v100
      FROM events WHERE round(value * 100) > 0
    ), d1 AS (
      SELECT event_type,
             CAST(substr(CAST(v100 AS VARCHAR), 1, 1) AS BIGINT) AS dg
      FROM t
    ), cnt AS (
      SELECT event_type, dg, CAST(count(*) AS BIGINT) AS c
      FROM d1 GROUP BY event_type, dg
    ), tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM d1 GROUP BY event_type
    ), sc AS (
      SELECT tot.event_type, tot.n, u.dg
      FROM tot, unnest(range(1, 10)) AS u(dg)
    ), j AS (
      SELECT sc.event_type, sc.n, sc.dg, coalesce(cnt.c, 0) AS c
      FROM sc LEFT JOIN cnt
        ON cnt.event_type = sc.event_type AND cnt.dg = sc.dg
    )
    SELECT event_type, n,
           CAST(sum({_BENFORD_TERM}) AS BIGINT) AS benford_dev_micro
    FROM j GROUP BY event_type, n
    ORDER BY event_type
    """,
)
def q207_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 deviation of each event type's first-significant-digit
    distribution from Benford's law (micro-scaled) — the classic
    synthetic-data / fabrication screen: organically-generated
    magnitudes follow P(d) = log10(1 + 1/d), while templated or
    machine-stamped values pile onto a few leading digits. A corpus
    pipeline runs exactly this over numeric metadata columns to flag
    sources whose "measurements" were generated, not measured.

    One corpus-linear pass extracts the leading digit of the positive
    cent-scaled value (bigint → string → first char — locale-free and
    identical in both engines); digit counts and per-type totals are
    two map-side-combinable aggregates over ≤ 9·|types| groups. The
    9-digit scaffold (explode of sequence(1,9) against the bounded
    type frame) restores zero-count digits so missing digits still
    contribute their full expected share to the deviation. Each
    |observed/n − expected_d| rounds to the 1e-6 grid BEFORE the exact
    9-term int64 sum; the Benford constants are baked double literals
    (q202's threshold precedent), so no transcendental runs at query
    time."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v100")
    )
    d1 = e.filter(F.col("v100") > 0).select(
        "event_type",
        F.expr("CAST(substr(CAST(v100 AS STRING), 1, 1) AS BIGINT)").alias("dg"),
    )
    cnt = d1.groupBy("event_type", "dg").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = d1.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sc = tot.select(
        "event_type", "n", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("dg")
    ).withColumn("dg", F.col("dg").cast("long"))
    j = sc.join(cnt, ["event_type", "dg"], "left").select(
        "event_type", "n", "dg", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    return (
        j.groupBy("event_type", "n")
        .agg(F.expr(f"CAST(sum({_BENFORD_TERM}) AS BIGINT)").alias("benford_dev_micro"))
        .select("event_type", "n", "benford_dev_micro")
        .orderBy("event_type")
    )
