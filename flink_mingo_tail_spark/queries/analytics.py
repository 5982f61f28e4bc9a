"""Event-analytics and corpus-curation queries (north-star extension).

Batch sessionization, cohort retention, calendar gap-fill, one-pass
column profiling, and deterministic source-mixture resampling — the
event-log / training-data-curation operations a 100 TB pipeline runs
daily. Reference parity: the reference engine (JaiHirsch/flink-mingo-tail)
streams CDC events but has no event-analytics surface; these extend the
declared engine the same way the dedup/similarity families do
(SURVEY.md §2C).

Cross-engine determinism: every time value is an integer (µs / day / week
index via ``unix_micros`` ÷ fixed divisors — DuckDB twin ``epoch_us``),
every sampled membership decision is a pure integer predicate over the
shared md5-based hash (operators/dedup.md5_long), and no double is ever
aggregated — so the driver's value-hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import md5_long, sql_md5_long
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table

_US_30MIN = 30 * 60 * 1_000_000
_US_DAY = 86_400_000_000
_US_WEEK = 7 * _US_DAY


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    e = load_table(spark, sf_dir, "events")
    # ts loads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The session
    # is pinned UTC (prepare_session), so the cast is value-preserving
    # and matches DuckDB's epoch_us over the naive timestamp.
    return e.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))


# ---------------------------------------------------------------------------
# q105 — batch sessionization by inactivity gap
# ---------------------------------------------------------------------------

@query(
    "q105_batch_sessionize",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ), m AS (
      SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                       OR us - LAG(us) OVER w > {_US_30MIN} THEN 1 ELSE 0 END AS new_sess
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), s AS (
      SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM m
    )
    SELECT user_id, session_id,
           MIN(us) AS session_start_us,
           MAX(us) AS session_end_us,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q105_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a new session starts after
    >30 min of user inactivity (lag + running sum of boundary flags),
    then per-session aggregates.

    Scale shape: ONE shuffle on user_id serves both windows and the
    final groupBy (user_id, session_id) is partition-local under it.
    The streaming twin is q92 (native session_window); this is the
    backfill/batch path over the same event log.
    """
    e = _events_us(spark, sf_dir).select("user_id", "event_id", "event_type", "us")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    new_sess = F.when(gap.isNull() | (gap > _US_30MIN), F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# q106 — cohort retention matrix
# ---------------------------------------------------------------------------

@query(
    "q106_cohort_retention",
    oracle=f"""
    WITH uw AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_US_WEEK} AS wk FROM events
    ), c AS (
      SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM uw
    )
    SELECT cohort_wk, wk - cohort_wk AS week_offset, COUNT(*) AS n_users
    FROM c
    GROUP BY cohort_wk, week_offset
    ORDER BY cohort_wk, week_offset
    """,
)
def q106_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users are cohorted by their first active epoch-week
    (integer week index — no engine-dependent calendar truncation), and
    each (cohort, week_offset) cell counts users still active that week.

    Scale shape: distinct(user, wk) is a partial-agg'd shuffle on the
    pair; the cohort min reuses the user_id clustering (window over
    user_id); the final cell agg is a second small shuffle whose input
    is |users| × |active weeks|, not |events|.
    """
    e = _events_us(spark, sf_dir)
    uw = e.select("user_id", F.expr(f"us DIV {_US_WEEK}").alias("wk")).distinct()
    cohort = F.min("wk").over(Window.partitionBy("user_id"))
    return (
        uw.withColumn("cohort_wk", cohort)
        .withColumn("week_offset", F.col("wk") - F.col("cohort_wk"))
        .groupBy("cohort_wk", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_wk", "week_offset")
    )


# ---------------------------------------------------------------------------
# q107 — calendar gap-fill (zero-filled daily spine + staleness)
# ---------------------------------------------------------------------------

@query(
    "q107_gap_fill_daily",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_US_DAY} AS day_idx,
             COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1
    ), b AS (
      SELECT MIN(day_idx) AS d0, MAX(day_idx) AS d1 FROM daily
    ), spine AS (
      SELECT UNNEST(range(d0, d1 + 1)) AS day_idx FROM b
    ), j AS (
      SELECT s.day_idx,
             COALESCE(d.n_events, 0) AS n_events,
             COALESCE(d.n_users, 0) AS n_users,
             CASE WHEN d.day_idx IS NOT NULL THEN s.day_idx END AS active_day
      FROM spine s LEFT JOIN daily d USING (day_idx)
    )
    SELECT day_idx, n_events, n_users,
           day_idx - MAX(active_day) OVER (ORDER BY day_idx
                                           ROWS UNBOUNDED PRECEDING) AS days_since_active
    FROM j
    ORDER BY day_idx
    """,
)
def q107_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: aggregate events to a daily grain, generate
    the full calendar spine between min and max day (``sequence`` +
    explode), left-join, zero-fill, and carry forward the last active
    day to expose per-day staleness.

    Scale shape: the only full-data pass is the daily pre-aggregation
    (partial+final hash agg). Everything after runs on |days| rows —
    the spine explode, the join (broadcast: a year is 365 rows), and
    the single-partition running window are all bounded by calendar
    size, never by event volume.
    """
    e = _events_us(spark, sf_dir)
    daily = (
        e.groupBy(F.expr(f"us DIV {_US_DAY}").alias("day_idx"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    spine = (
        daily.agg(F.min("day_idx").alias("d0"), F.max("day_idx").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day_idx"))
    )
    j = (
        spine.join(F.broadcast(daily), "day_idx", "left")
        .select(
            "day_idx",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.when(F.col("n_events").isNotNull(), F.col("day_idx")).alias("active_day"),
        )
    )
    run = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        j.withColumn("days_since_active", F.col("day_idx") - F.max("active_day").over(run))
        .drop("active_day")
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# q108 — one-pass column profiling
# ---------------------------------------------------------------------------

@query(
    "q108_column_profile",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n,
             COUNT(o_custkey) AS ck_nn, COUNT(DISTINCT o_custkey) AS ck_nd,
             CAST(MIN(o_custkey) AS VARCHAR) AS ck_min, CAST(MAX(o_custkey) AS VARCHAR) AS ck_max,
             COUNT(o_orderstatus) AS os_nn, COUNT(DISTINCT o_orderstatus) AS os_nd,
             MIN(o_orderstatus) AS os_min, MAX(o_orderstatus) AS os_max,
             COUNT(o_orderpriority) AS op_nn, COUNT(DISTINCT o_orderpriority) AS op_nd,
             MIN(o_orderpriority) AS op_min, MAX(o_orderpriority) AS op_max,
             COUNT(o_totalprice) AS tp_nn, COUNT(DISTINCT o_totalprice) AS tp_nd,
             CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR) AS tp_min,
             CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR) AS tp_max
      FROM orders
    )
    SELECT 'o_custkey' AS col_name, n - ck_nn AS n_nulls, ck_nd AS n_distinct,
           ck_min AS min_repr, ck_max AS max_repr FROM a
    UNION ALL
    SELECT 'o_orderstatus', n - os_nn, os_nd, os_min, os_max FROM a
    UNION ALL
    SELECT 'o_orderpriority', n - op_nn, op_nd, op_min, op_max FROM a
    UNION ALL
    SELECT 'o_totalprice_cents', n - tp_nn, tp_nd, tp_min, tp_max FROM a
    ORDER BY col_name
    """,
)
def q108_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema profiling: null count, exact distinct count, and min/max
    representation for four orders columns — computed in ONE scan (a
    single multi-distinct aggregate), then unpivoted to a narrow
    (col_name, metric…) table via ``stack``.

    Doubles are profiled in scaled-cents space so min/max render
    identically across engines. Scale shape: Catalyst expands the
    multi-distinct agg into an Expand + two-phase hash agg — still a
    single source scan, parallel in the input partitions; the stack
    unpivot runs on the one resulting row.
    """
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    a = o.agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("ck_nn"),
        F.countDistinct("o_custkey").alias("ck_nd"),
        F.min("o_custkey").cast("string").alias("ck_min"),
        F.max("o_custkey").cast("string").alias("ck_max"),
        F.count("o_orderstatus").alias("os_nn"),
        F.countDistinct("o_orderstatus").alias("os_nd"),
        F.min("o_orderstatus").alias("os_min"),
        F.max("o_orderstatus").alias("os_max"),
        F.count("o_orderpriority").alias("op_nn"),
        F.countDistinct("o_orderpriority").alias("op_nd"),
        F.min("o_orderpriority").alias("op_min"),
        F.max("o_orderpriority").alias("op_max"),
        F.count("o_totalprice").alias("tp_nn"),
        F.countDistinct("o_totalprice").alias("tp_nd"),
        F.min(cents).cast("string").alias("tp_min"),
        F.max(cents).cast("string").alias("tp_max"),
    )
    return a.select(
        F.expr(
            "stack(4, "
            "'o_custkey', n - ck_nn, ck_nd, ck_min, ck_max, "
            "'o_orderstatus', n - os_nn, os_nd, os_min, os_max, "
            "'o_orderpriority', n - op_nn, op_nd, op_min, op_max, "
            "'o_totalprice_cents', n - tp_nn, tp_nd, tp_min, tp_max"
            ") AS (col_name, n_nulls, n_distinct, min_repr, max_repr)"
        )
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# q109 — deterministic source-mixture resampling
# ---------------------------------------------------------------------------

@query(
    "q109_mixture_reweight",
    oracle=f"""
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), m AS (
      SELECT MIN(n_docs) AS min_docs FROM c
    ), k AS (
      SELECT d.source, d.doc_id, c.n_docs, m.min_docs,
             {sql_md5_long("CAST(d.doc_id AS VARCHAR)", salt=109)} % 1000000 AS r
      FROM documents d JOIN c USING (source) CROSS JOIN m
    )
    SELECT source,
           MAX(n_docs) AS n_docs,
           CAST(SUM(CASE WHEN r * n_docs < min_docs * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN r * n_docs < min_docs * 1000000 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM k
    GROUP BY source
    ORDER BY source
    """,
)
def q109_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture equalization: downsample every source to the size
    of the smallest one with a deterministic per-document coin — keep
    iff ``hash(doc_id) % 1e6 × n_docs(source) < min_docs × 1e6``. Pure
    integer predicate, so membership is bit-identical across engines
    (and across reruns — a training-data requirement: the sample must
    be reproducible without storing it).

    Scale shape: the per-source census is a tiny partial-agg'd shuffle;
    it joins back to the corpus as a BROADCAST (sources are a handful),
    so the membership pass is shuffle-free; kept-set accounting reuses
    the same broadcast pass. ``kept_id_sum`` is the value-hash witness
    that both engines kept exactly the same documents.
    """
    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    min_docs = counts.agg(F.min("n_docs").alias("min_docs"))
    r = md5_long(F.concat(F.lit("109:"), F.col("doc_id").cast("string"))) % 1_000_000
    keep = (F.col("r") * F.col("n_docs")) < (F.col("min_docs") * F.lit(1_000_000))
    return (
        d.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(min_docs))
        .withColumn("r", r)
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(keep, F.col("doc_id")).otherwise(0)).alias("kept_id_sum"),
        )
        .orderBy("source")
    )


@query(
    "q122_mad_outlier",
    oracle="""
    WITH med AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med
        FROM documents GROUP BY source
    ), dev AS (
        SELECT d.doc_id, d.source, d.n_chars,
               abs(d.n_chars - m.med) AS adev
        FROM documents d JOIN med m ON d.source = m.source
    ), mad AS (
        SELECT source, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY source
    )
    SELECT v.doc_id, v.source, v.n_chars,
           (v.adev > 3.0 * 1.4826 * m.mad) AS is_outlier
    FROM dev v JOIN mad m ON v.source = m.source
    ORDER BY v.doc_id
    """,
)
def q122_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source outlier flagging on document length via
    median absolute deviation (|x - median| > 3 * 1.4826 * MAD) — the
    curation-pipeline guard that survives the heavy-tailed length
    distributions where mean/stddev z-scores break down.

    Scale shape: two grouped exact-percentile aggregates on the
    low-cardinality source key (per-group state, partition-parallel
    partials) and two BROADCAST joins of the tiny per-source stats back
    to the corpus — the corpus itself shuffles only on `source`, and in
    a source-partitioned layout not at all. Cross-engine exactness:
    Spark `percentile` == DuckDB `quantile_cont` (both sort +
    linearly interpolate, q27's proven idiom); the deviation, the
    3*1.4826 threshold product, and the comparison are the identical
    IEEE ops on both sides."""
    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(F.percentile("n_chars", 0.5).alias("med"))
    dev = d.join(F.broadcast(med), "source").select(
        "doc_id", "source", "n_chars", F.abs(F.col("n_chars") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("source").agg(F.percentile("adev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            (F.col("adev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad")).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q125 — equi-depth histogram (quantile-binned; companion to q103's
# fixed-width buckets)
# ---------------------------------------------------------------------------

_EQD_BINS = 8
_EQD_PS = [i / _EQD_BINS for i in range(1, _EQD_BINS)]  # dyadic → FP-exact


@query(
    "q125_equidepth_histogram",
    oracle=f"""
    WITH t AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
    ), b AS (
      SELECT {', '.join(f'quantile_cont(v, {p}) AS b{i}' for i, p in enumerate(_EQD_PS, 1))}
      FROM t
    )
    SELECT ({' + '.join(f'CAST(v > b{i} AS INT)' for i in range(1, _EQD_BINS))}) AS bin,
           count(*) AS n_rows,
           min(v) AS min_cents,
           max(v) AS max_cents
    FROM t, b
    GROUP BY bin
    ORDER BY bin
    """,
)
def q125_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-binned) histogram of line-item price —
    the binning a range-partitioner, a data-skipping layout, or a
    feature bucketizer wants: every bin holds ~n/8 rows no matter how
    skewed the values. Two scale-safe passes:

      1. septile boundaries via `operators/percentile.exact_percentiles`
         (distributed rank-select — parallelism stays partition-bound,
         never funnels the column into one sort task);
      2. one broadcast of the 7 boundaries + a single codegen'd pass
         binning by `sum(v > b_i)` and aggregating count/min/max.

    Cross-engine exactness: the probe values are integer cents and the
    percentile positions are dyadic (i/8 over n-1), so the interpolated
    boundaries are exact in IEEE double under BOTH Spark's
    `(hi-pos)*lo + (pos-lo)*hi` and DuckDB's `lo + frac*(hi-lo)` —
    no boundary comparison can flip on a rounding ulp."""
    from flink_mingo_tail_spark.operators.percentile import exact_percentiles

    prepare_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
        F.lit(0).alias("g"),
    )
    bounds = exact_percentiles(
        t,
        ["g"],
        [("v", p, f"b{i}") for i, p in enumerate(_EQD_PS, 1)],
        # 10_000: below the sf0.01 row count (60k) so the driver gate
        # exercises the distributed rank-select path, while the
        # collected interior stays ~8n/accuracy rows (see q27b note)
        accuracy=10_000,
    ).drop("g")
    binned = t.drop("g").crossJoin(F.broadcast(bounds))
    bin_col = sum(
        (F.col("v") > F.col(f"b{i}")).cast("int") for i in range(1, _EQD_BINS)
    )
    return (
        binned.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("min_cents"),
            F.max("v").alias("max_cents"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q130 — deterministic Pearson correlation profile
# ---------------------------------------------------------------------------


@query(
    "q130_corr_profile",
    oracle="""
    WITH t AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_quantity * 100) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(round(l_discount * 100) AS BIGINT) AS z
      FROM lineitem
    ), s AS (
      SELECT flag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(z) AS BIGINT) AS sz,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * z) AS BIGINT) AS sxz,
             CAST(sum(z * z) AS BIGINT) AS szz,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM t GROUP BY flag
    )
    SELECT flag,
           n,
           CAST(round(1000000.0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(n AS DOUBLE) * syy
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS BIGINT)
               AS r_qty_price_micro,
           CAST(round(1000000.0 * (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
                / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                          - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))) AS BIGINT)
               AS r_qty_disc_micro
    FROM s
    ORDER BY flag
    """,
)
def q130_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation profile (qty↔price, qty↔discount per return
    flag) computed from EXACT integer moment sums — the deterministic
    alternative to `F.corr`, whose running-covariance accumulation is
    partition-order-dependent and therefore not reproducible across
    runs, engines, or partition counts.

    One hash-aggregate pass collects integer Σx/Σy/Σxy/Σx²/Σy²
    (price-squared rides a decimal accumulator: cents² sums pass 2^63
    at sf0.1 scale — DuckDB's HUGEINT twin does the same); the final
    formula is then evaluated once per group on doubles derived from
    identical exact integers with an identical operation tree, so every
    IEEE rounding is reproduced bit-for-bit in both engines. Output is
    micro-scaled long."""
    prepare_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("z"),
    )
    y_dec = F.col("y").cast("decimal(12,0)")
    s = t.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(y_dec * y_dec).cast("double").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731

    def r_micro(sab, sa, sb, saa, sbb_dbl):
        num = d("n") * d(sab) - d(sa) * d(sb)
        den = F.sqrt((d("n") * d(saa) - d(sa) * d(sa)) * (d("n") * sbb_dbl - d(sb) * d(sb)))
        return F.round(F.lit(1e6) * num / den, 0).cast("long")

    return s.select(
        "flag",
        "n",
        r_micro("sxy", "sx", "sy", "sxx", F.col("syy")).alias("r_qty_price_micro"),
        r_micro("sxz", "sx", "sz", "sxx", d("szz")).alias("r_qty_disc_micro"),
    ).orderBy("flag")


# ---------------------------------------------------------------------------
# q132 — recursive CTE: nonlinear running recurrence (decaying exposure)
# ---------------------------------------------------------------------------

_EXPOSURE_SQL = """
WITH RECURSIVE seq AS (
  SELECT o_custkey AS cust,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
  FROM orders
), walk(cust, rn, bal) AS (
  SELECT cust, rn, LEAST(CAST(50000000 AS BIGINT), cents) FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.cust, s.rn,
         -- ceil(bal/2): engine-portable (Spark has DIV but DuckDB uses //,
         -- and bare CAST disagrees too - Spark truncates, DuckDB rounds;
         -- floor() of the exact double division is identical in both)
         LEAST(CAST(50000000 AS BIGINT), (w.bal - CAST(floor(w.bal / 2) AS BIGINT)) + s.cents)
  FROM walk w JOIN seq s ON s.cust = w.cust AND s.rn = w.rn + 1
)
SELECT cust, CAST(max(rn) AS BIGINT) AS n_orders,
       max_by(bal, rn) AS final_exposure_cents
FROM walk GROUP BY cust ORDER BY cust
"""


@query("q132_recursive_exposure", oracle=_EXPOSURE_SQL)
def q132_recursive_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 `WITH RECURSIVE`) computing a NONLINEAR
    running recurrence: per-customer "exposure" that halves between
    orders and saturates at a cap — `bal_i = min(cap, ceil(bal_{i-1}/2)
    + cents_i)` over the date-ordered order chain. Window aggregates
    cannot express this (the update is not associative and the clamp
    makes it non-linear); the declarative recursion is the SQL-surface
    twin of the hand-built DataFrame fixpoints in operators/graph.py.

    Scale notes: recursion depth = the longest per-customer chain
    (~30 here), and each level is one equi-join of the frontier with
    the rn-indexed base — Catalyst executes O(depth) joins, fine for
    bounded chains; unbounded-depth fixpoints (graph closure) should
    use the localCheckpoint loop operators instead. All arithmetic is
    integer (cents, DIV), so both engines hash-match exactly."""
    prepare_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXPOSURE_SQL)


@query(
    "q138_week_over_week",
    oracle=f"""
    WITH weekly AS (
      SELECT epoch_us(o_orderdate) // {_US_WEEK} AS week_idx,
             count(*) AS n_orders,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
      FROM orders
      GROUP BY 1
    )
    SELECT w1.week_idx, w1.n_orders, w1.revenue,
           w2.revenue AS prev_revenue,
           w1.revenue - w2.revenue AS wow_delta
    FROM weekly w1 LEFT JOIN weekly w2 ON w2.week_idx = w1.week_idx - 1
    ORDER BY w1.week_idx
    """,
)
def q138_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue deltas: weekly rollup (integer week index,
    exact scaled-long revenue), then PREVIOUS CALENDAR WEEK lookup via a
    self-join on ``week_idx - 1`` rather than ``lag()`` — a gap week
    yields NULL (correct business semantics; lag would silently compare
    across the gap) and, at scale, the self-join on the rolled-up weekly
    table avoids the single-task un-partitioned global window a bare
    ``lag() OVER (ORDER BY week)`` would plan. The delta subtracts two
    bit-identical doubles (each a scaled-long sum / 100), so it is
    IEEE-deterministic across engines."""
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    weekly = (
        o.select(
            F.expr(
                f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV {_US_WEEK}"
            ).alias("week_idx"),
            "o_totalprice",
        )
        .groupBy("week_idx")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / F.lit(100.0)).alias(
                "revenue"
            ),
        )
    )
    prev = weekly.select(
        (F.col("week_idx") + 1).alias("week_idx"), F.col("revenue").alias("prev_revenue")
    )
    return (
        weekly.join(prev, "week_idx", "left")
        .select(
            "week_idx",
            "n_orders",
            "revenue",
            "prev_revenue",
            (F.col("revenue") - F.col("prev_revenue")).alias("wow_delta"),
        )
        .orderBy("week_idx")
    )
