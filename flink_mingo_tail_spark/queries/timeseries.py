"""Time-series resampling and anomaly queries over the event log.

Linear-interpolation resampling, time-weighted averages, and rolling
z-score anomaly flags — the irregular-series operations an event
pipeline runs at the 100 TB grain (sensor/metric streams resampled to a
calendar grid, duration-weighted rollups, online outlier screens).
Reference parity: the reference engine (JaiHirsch/flink-mingo-tail)
ships events but computes nothing over time; these extend the declared
engine alongside q107 (count gap-fill) and q149 (LOCF).

Cross-engine determinism: timestamps are integer microseconds
(``unix_micros`` / ``epoch_us``), values enter as exact scaled longs
(``round(value*100)`` — the fixture stores 2-decimal fixed-point as
double), and every emitted number is either an integer or a micro-
scaled long produced by an IDENTICAL IEEE-754 expression tree in both
engines (+,-,*,/ are bit-deterministic; only libm functions differ —
none are used here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table

_US_DAY = 86_400_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v100"),
    )


# ---------------------------------------------------------------------------
# q155 — linear-interpolation resampling to a daily grid
# ---------------------------------------------------------------------------

@query(
    "q155_linear_interpolate",
    oracle=f"""
    WITH obs AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS v100,
             event_id AS eid
      FROM events WHERE event_type = 'purchase'
    ), bounds AS (
      SELECT user_id, MIN(us) AS mn, MAX(us) AS mx FROM obs GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(range((mn + {_US_DAY} - 1) // {_US_DAY},
                                   mx // {_US_DAY} + 1)) AS day_idx
      FROM bounds
    ), u AS (
      SELECT user_id, us, 0 AS kind, v100, NULL::BIGINT AS day_idx, eid FROM obs
      UNION ALL
      SELECT user_id, day_idx * {_US_DAY} AS us, 1 AS kind,
             NULL::BIGINT AS v100, day_idx, CAST(-1 AS BIGINT) AS eid
      FROM grid
    ), n AS (
      SELECT *,
        last_value(v100 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, kind, eid
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN kind = 0 THEN us END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY us, kind, eid
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pus,
        first_value(v100 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, kind, eid
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN kind = 0 THEN us END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY us, kind, eid
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nus
      FROM u
    )
    SELECT user_id, day_idx,
      CAST(round(CASE WHEN nus IS NULL OR nus = pus THEN pv * 10000.0
                 ELSE (pv * CAST(nus - us AS DOUBLE) + nv * CAST(us - pus AS DOUBLE))
                      * 10000.0 / CAST(nus - pus AS DOUBLE) END) AS BIGINT)
        AS interp_micro
    FROM n
    WHERE kind = 1 AND pv IS NOT NULL AND (nv IS NOT NULL OR pus = us)
    ORDER BY user_id, day_idx
    """,
)
def q155_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular purchase-value series onto the
    daily calendar grid by LINEAR interpolation between the surrounding
    observations (the two-sided complement of q149's LOCF).

    Plan: per-user day grid from a broadcast bounds frame (sequence +
    explode — |days| rows, never event volume), UNION ALL with the
    observations, then ONE shuffle on user_id serves both direction
    windows (last/first IGNORE NULLS over the merged timeline). The
    interpolation itself is a per-row expression. At 100 TB the sort is
    per-user and the grid is calendar-bounded, so nothing here is wider
    than the q105/q149 window family.
    """
    obs = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "us", "v100", F.col("event_id").alias("eid"))
    )
    bounds = obs.groupBy("user_id").agg(F.min("us").alias("mn"), F.max("us").alias("mx"))
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.expr(f"(mn + {_US_DAY - 1}) div {_US_DAY}"),
                F.expr(f"mx div {_US_DAY}"),
            )
        ).alias("day_idx"),
    )
    u = obs.select(
        "user_id",
        "us",
        F.lit(0).alias("kind"),
        "v100",
        F.lit(None).cast("long").alias("day_idx"),
        "eid",
    ).unionAll(
        grid.select(
            "user_id",
            (F.col("day_idx") * _US_DAY).alias("us"),
            F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("v100"),
            "day_idx",
            F.lit(-1).cast("long").alias("eid"),
        )
    )
    # eid tiebreak: two purchases in one microsecond would otherwise make
    # pv/nv (last/first over a ROWS frame) physical-order-dependent. Grid
    # rows carry eid = -1 but are unique per (user_id, us, kind) anyway.
    w = Window.partitionBy("user_id").orderBy("us", "kind", "eid")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_us = F.when(F.col("kind") == 0, F.col("us"))
    n = u.select(
        "user_id",
        "us",
        "kind",
        "day_idx",
        F.last("v100", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_us, ignorenulls=True).over(back).alias("pus"),
        F.first("v100", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_us, ignorenulls=True).over(fwd).alias("nus"),
    )
    # A grid point that coincides with the series' LAST observation has
    # pv but no forward neighbour (the observation sorts before the grid
    # row, so the following-frame misses it): pus == us identifies the
    # exact hit and the value is pv itself. Every other one-sided row is
    # outside the observed span and is dropped, not extrapolated.
    interp = F.when(
        F.col("nus").isNull() | (F.col("nus") == F.col("pus")),
        F.col("pv") * F.lit(10000.0),
    ).otherwise(
        (
            F.col("pv") * (F.col("nus") - F.col("us")).cast("double")
            + F.col("nv") * (F.col("us") - F.col("pus")).cast("double")
        )
        * F.lit(10000.0)
        / (F.col("nus") - F.col("pus")).cast("double")
    )
    return (
        n.filter(
            (F.col("kind") == 1)
            & F.col("pv").isNotNull()
            & (F.col("nv").isNotNull() | (F.col("pus") == F.col("us")))
        )
        .select(
            "user_id",
            "day_idx",
            F.round(interp, 0).cast("long").alias("interp_micro"),
        )
        .orderBy("user_id", "day_idx")
    )


# ---------------------------------------------------------------------------
# q156 — time-weighted average (TWAP)
# ---------------------------------------------------------------------------

@query(
    "q156_time_weighted_avg",
    oracle="""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS v100,
             event_id
      FROM events
    ), d AS (
      SELECT user_id, v100,
             lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt
      FROM t
    )
    SELECT user_id,
           CAST(sum(v100 * dt) AS BIGINT) AS num,
           CAST(sum(dt) AS BIGINT) AS den,
           CAST(round(CAST(sum(v100 * dt) AS DOUBLE) * 10000.0
                      / CAST(sum(dt) AS DOUBLE)) AS BIGINT) AS twap_micro
    FROM d WHERE dt IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q156_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean event value per user: each value holds
    from its event until the user's next event (lead), weight = exact
    integer microsecond duration. The un-weighted AVG over-counts burst
    periods; TWAP is the standard fix for irregular sampling.

    Determinism: numerator and denominator are exact long sums
    (v100 <= 56,021 and per-user total duration <= the 30-day span in
    microseconds keep the products far below 2^63); the single final
    division is IEEE-deterministic. ONE shuffle on user_id serves the
    lead window and the aggregate runs partition-local under it.
    """
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = e.select(
        "user_id",
        "v100",
        (F.lead("us").over(w) - F.col("us")).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return (
        d.groupBy("user_id")
        .agg(
            F.sum(F.col("v100") * F.col("dt")).alias("num"),
            F.sum("dt").alias("den"),
        )
        .select(
            "user_id",
            "num",
            "den",
            F.round(F.col("num").cast("double") * F.lit(10000.0) / F.col("den").cast("double"), 0)
            .cast("long")
            .alias("twap_micro"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q157 — rolling z-score anomaly screen
# ---------------------------------------------------------------------------

_ZW = 20  # trailing window size (rows)
_ZMIN = 8  # minimum history before flagging
_ZSQ = 9  # |z| > 3  <=>  z^2 > 9


@query(
    "q157_rolling_zscore",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS v100
      FROM events
    ), s AS (
      SELECT user_id, event_id, v100,
        count(v100) OVER w AS n,
        CAST(sum(v100) OVER w AS BIGINT) AS s1,
        CAST(sum(v100 * v100) OVER w AS BIGINT) AS s2
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN {_ZW} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, v100, n, s1, s2
    FROM s
    WHERE n >= {_ZMIN}
      AND (n * v100 - s1) * (n * v100 - s1) > {_ZSQ} * (n * s2 - s1 * s1)
    ORDER BY user_id, event_id
    """,
)
def q157_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling anomaly screen: flag an event whose value sits
    more than 3 trailing standard deviations from the trailing-window
    mean (last 20 events, at least 8 of history).

    The test |x - mu| > 3*sigma is evaluated ENTIRELY in int64:
    (n*x - S1)^2 > 9*(n*S2 - S1^2) — multiplying through by n^2
    removes both divisions and the sqrt, so there is no floating point
    anywhere and the oracle comparison is exact (v100 <= 56,021 and
    n <= 20 bound every product below 2^63). One shuffle on user_id;
    the frame is a constant-size ROWS window, state O(window).
    """
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-_ZW, -1)
    )
    s = e.select(
        "user_id",
        "event_id",
        "v100",
        F.count("v100").over(w).alias("n"),
        F.sum("v100").over(w).alias("s1"),
        F.sum(F.col("v100") * F.col("v100")).over(w).alias("s2"),
    )
    dev = F.col("n") * F.col("v100") - F.col("s1")
    var_n2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        s.filter((F.col("n") >= _ZMIN) & (dev * dev > F.lit(_ZSQ) * var_n2))
        .select("user_id", "event_id", "v100", "n", "s1", "s2")
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# q158 — OHLC downsampling (candlestick bars per event_type x day)
# ---------------------------------------------------------------------------

_OHLC_VBITS = 1 << 18  # v100 field width inside the packed anchor


@query(
    "q158_ohlc_bars",
    oracle=f"""
    WITH r AS (
      SELECT event_type, epoch_us(ts) AS us,
             CASE WHEN round(value * 100) < 0 OR round(value * 100) >= {_OHLC_VBITS}
                  THEN error('q158: v100 out of packing domain')
                  ELSE CAST(round(value * 100) AS BIGINT) END AS v100
      FROM events
    ), t AS (
      SELECT event_type,
             us // {_US_DAY} AS day_idx,
             (us % {_US_DAY}) * {_OHLC_VBITS} + v100 AS packed,
             v100
      FROM r
    )
    SELECT event_type, day_idx,
           CAST(min(packed) % {_OHLC_VBITS} AS BIGINT) AS open_100,
           CAST(max(v100) AS BIGINT) AS high_100,
           CAST(min(v100) AS BIGINT) AS low_100,
           CAST(max(packed) % {_OHLC_VBITS} AS BIGINT) AS close_100,
           count(*) AS n_events,
           CAST(sum(v100) AS BIGINT) AS vol_100
    FROM t GROUP BY event_type, day_idx
    ORDER BY event_type, day_idx
    """,
)
def q158_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the irregular event stream to daily OHLC(V) bars per
    event type — the classic market-data resample, and the general
    shape of any numeric-stream compaction at 100 TB (keep 4 anchors +
    2 totals per bucket instead of raw ticks).

    Open/close anchors are PACKED LONGS — (us within day) << 18 | v100
    — so the whole bar is ONE map-side-combinable HashAggregate of
    primitive min/max/sum/count inside whole-stage codegen. The
    struct-anchor spelling (min(struct(us, id, v100))) is semantically
    identical but demotes the plan to SortAggregate (struct buffers
    aren't hash-aggregable), re-sorting every partition; the packed
    form keeps the hash path. Precondition 0 <= v100 < 2^18 is ENFORCED
    per-row (raise_error / error() in both engines — a violation would
    corrupt open/close identically on both sides, invisible to the hash
    check); the within-day offset needs 37 bits — packed < 2^55. Ties (same microsecond) resolve to
    the smaller value for open / larger for close, identically in both
    engines.
    """
    e = _events(spark, sf_dir)
    # Enforce the packing precondition loudly (ADVICE round 6): a v100
    # outside [0, 2^18) would corrupt open/close IDENTICALLY in both
    # engines, so the hash check could never catch it — raise instead.
    guarded = F.when(
        (F.col("v100") < 0) | (F.col("v100") >= _OHLC_VBITS),
        F.expr("raise_error('q158: v100 out of packing domain')").cast("long"),
    ).otherwise(F.col("v100"))
    t = e.select(
        "event_type",
        F.expr(f"us div {_US_DAY}").alias("day_idx"),
        (F.expr(f"us % {_US_DAY}") * _OHLC_VBITS + guarded).alias("packed"),
        "v100",
    )
    return (
        t.groupBy("event_type", "day_idx")
        .agg(
            (F.min("packed") % _OHLC_VBITS).alias("open_100"),
            F.max("v100").alias("high_100"),
            F.min("v100").alias("low_100"),
            (F.max("packed") % _OHLC_VBITS).alias("close_100"),
            F.count("*").alias("n_events"),
            F.sum("v100").alias("vol_100"),
        )
        .orderBy("event_type", "day_idx")
    )


# ---------------------------------------------------------------------------
# q159 — truncated exponentially-weighted moving average (span-16 EWMA)
# ---------------------------------------------------------------------------

_EWMA_W = 16  # trailing rows per frame; decay 0.75 => tail weight < 1%


@query(
    "q159_ewma_truncated",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS v100
      FROM events WHERE event_type = 'purchase'
    ), l AS (
      SELECT user_id, event_id,
             list(v100) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW)
               AS lst
      FROM t
    ), f AS (
      SELECT user_id, event_id, len(lst) AS n_in_window,
             list_reduce(list_transform(lst, x -> [CAST(x AS DOUBLE), 1.0]),
                         (acc, e) -> [0.75*acc[1] + e[1], 0.75*acc[2] + 1.0]) AS sw
      FROM l
    )
    SELECT user_id, event_id, n_in_window,
           CAST(round(sw[1] * 10000.0 / sw[2]) AS BIGINT) AS ewma_micro
    FROM f
    ORDER BY user_id, event_id
    """,
)
def q159_ewma_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing EWMA (decay 0.75, truncated to the last 16 observations
    — tail weight < 1%) of each user's purchase values: the smoothing
    primitive behind rate trends and anomaly baselines, in the form
    that actually distributes. The textbook infinite-history recurrence
    serializes per key; a constant-size ROWS frame keeps state O(W),
    shuffles once on user_id, and loses <1% of the weight mass.

    Determinism across engines: the frame list is collected in frame
    order, and BOTH engines fold it left-to-right through the identical
    recurrence (s, w) <- (0.75*s + x, 0.75*w + 1) — same operand order,
    same IEEE-754 doubles, bit-identical result (Spark ``aggregate``
    from a zero init equals DuckDB ``list_reduce`` seeded by the first
    element, since the step applied to (0,0) yields (x1, 1)).
    """
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(_EWMA_W - 1), 0)
    )
    l = e.select(
        "user_id", "event_id", F.collect_list("v100").over(w).alias("lst")
    )
    sw = F.expr(
        "aggregate(transform(lst, x -> array(CAST(x AS DOUBLE), 1.0D)),"
        " array(0.0D, 0.0D),"
        " (acc, e) -> array(0.75D*acc[0] + e[0], 0.75D*acc[1] + 1.0D))"
    )
    return (
        l.select(
            "user_id",
            "event_id",
            F.size("lst").alias("n_in_window"),
            F.round(sw.getItem(0) * 10000.0 / sw.getItem(1), 0)
            .cast("long")
            .alias("ewma_micro"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# q192 — autocorrelation function (lags 1..5) of the daily mean series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 5


@query(
    "q192_acf_daily_mean",
    oracle=f"""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // {86_400_000_000} AS day,
             CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                        * 1000.0 / count(*)) AS BIGINT) AS xm
      FROM events GROUP BY event_type, day
    ), s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xm) AS BIGINT) AS sx,
             CAST(sum(xm * xm) AS BIGINT) AS sxx
      FROM d GROUP BY event_type
    ), lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG} + 1)) AS lag),
    p AS (
      SELECT a.event_type, l.lag,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(a.xm * b.xm) AS BIGINT) AS sab,
             CAST(sum(a.xm) AS BIGINT) AS sa,
             CAST(sum(b.xm) AS BIGINT) AS sb
      FROM d a
      CROSS JOIN lags l
      JOIN d b ON b.event_type = a.event_type AND b.day = a.day + l.lag
      GROUP BY a.event_type, l.lag
    )
    SELECT p.event_type, p.lag, p.m,
           CAST(round((CAST(sab AS DOUBLE)
                       - (CAST(sx AS DOUBLE) / n) * (sa + sb)
                       + m * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                      * 1000000.0
                      / (CAST(sxx AS DOUBLE)
                         - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
             AS BIGINT) AS acf_micro
    FROM p JOIN s ON s.event_type = p.event_type
    ORDER BY p.event_type, p.lag
    """,
)
def q192_acf_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each event type's daily-mean value series at
    lags 1..5 — the seasonality/persistence diagnostic a monitoring
    pipeline computes before alerting on drift (q189's statistical
    sibling: drift asks "did the distribution move", ACF asks "does the
    series remember itself").

    The series frame is one hash aggregate to (type, day) — bounded by
    the calendar, not row count — with the daily mean frozen to a
    scaled long (round(1000 * sum_v100 / count)): the division is one
    IEEE op on identical operands, the round makes both engines' series
    bit-equal, and every downstream sum is exact int64. Lagged pairs
    are an equi-join of that tiny frame to itself on (type, day + lag)
    — no window at all, so gaps in the calendar pair up exactly like
    the textbook estimator r_l = sum((x_t - xbar)(x_(t+l) - xbar)) /
    sum((x_t - xbar)^2) with full-series mean and variance; the final
    expression is the identical IEEE tree in both engines.
    """
    e = _events(spark, sf_dir)
    d = (
        e.groupBy("event_type", F.expr(f"us div {_US_DAY}").alias("day"))
        .agg(
            # CAST the int64 sum to DOUBLE before the decimal literal
            # touches it: Spark ANSI parses `1000.0` as DECIMAL and
            # would evaluate BIGINT*DECIMAL/BIGINT in decimal arithmetic
            # (rounded at decimal(38,…) precision) while DuckDB runs the
            # identical text as DOUBLE — the house decimal-literal rule.
            F.expr(
                "CAST(round(CAST(sum(v100) AS DOUBLE) * 1000.0 / count(*)) AS BIGINT)"
            ).alias("xm")
        )
        # calendar-bounded; materialized once so the moments pass and
        # both lag-join legs don't each re-run the events scan+aggregate
        .localCheckpoint()
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xm").cast("long").alias("sx"),
        F.sum(F.col("xm") * F.col("xm")).cast("long").alias("sxx"),
    )
    lags = F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))).alias("lag")
    a = d.alias("a").crossJoin(F.broadcast(d.sparkSession.range(1).select(lags)))
    b = d.alias("b")
    p = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") == F.col("a.day") + F.col("lag")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(F.col("a.xm") * F.col("b.xm")).cast("long").alias("sab"),
            F.sum(F.col("a.xm")).cast("long").alias("sa"),
            F.sum(F.col("b.xm")).cast("long").alias("sb"),
        )
    )
    return (
        p.join(F.broadcast(s), "event_type")
        .select(
            "event_type",
            "lag",
            "m",
            F.expr(
                "CAST(round((CAST(sab AS DOUBLE)"
                " - (CAST(sx AS DOUBLE) / n) * (sa + sb)"
                " + m * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
                " * 1000000.0"
                " / (CAST(sxx AS DOUBLE)"
                " - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))"
                " AS BIGINT)"
            ).alias("acf_micro"),
        )
        .orderBy("event_type", "lag")
    )


# ---------------------------------------------------------------------------
# q194 — day-of-week seasonal index per event type
# ---------------------------------------------------------------------------


@query(
    "q194_seasonal_dow_index",
    oracle=f"""
    WITH t AS (
      SELECT event_type,
             (epoch_us(ts) // {86_400_000_000} + 4) % 7 AS dow,
             CAST(round(value * 100) AS BIGINT) AS v100
      FROM events
    ), g AS (
      SELECT event_type, dow,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(v100) AS BIGINT) AS s
      FROM t GROUP BY event_type, dow
    ), tot AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS ct, CAST(sum(s) AS BIGINT) AS st
      FROM g GROUP BY event_type
    )
    SELECT g.event_type, g.dow, g.c AS n_events,
           CAST(round((CAST(g.s AS DOUBLE) / g.c)
                      / (CAST(tot.st AS DOUBLE) / tot.ct) * 1000000.0) AS BIGINT)
             AS index_micro
    FROM g JOIN tot ON tot.event_type = g.event_type
    ORDER BY g.event_type, g.dow
    """,
)
def q194_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type: mean value on each
    weekday divided by the overall mean (1e6 = no seasonality) — the
    detrending table a forecasting or anomaly pipeline divides by
    before comparing days.

    The weekday is PURE int64 arithmetic — (epoch_day + 4) % 7, 0 =
    Sunday (1970-01-01 was a Thursday) — identical in both engines by
    construction, with no dependence on either engine's date-part
    conventions (Spark dayofweek is 1-based-Sunday, DuckDB's 0-based —
    the arithmetic spelling sidesteps the mismatch). One hash aggregate
    to the (type, 7)-sized frame, a second to per-type totals, one
    broadcast join; the ratio-of-means is evaluated as the identical
    IEEE tree over exact integer sums.
    """
    e = _events(spark, sf_dir)
    g = e.groupBy(
        "event_type",
        ((F.expr(f"us div {_US_DAY}") + 4) % 7).alias("dow"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("v100").cast("long").alias("s"),
    )
    tot = g.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("ct"), F.sum("s").cast("long").alias("st")
    )
    return (
        g.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            F.col("c").alias("n_events"),
            F.expr(
                "CAST(round((CAST(s AS DOUBLE) / c)"
                " / (CAST(st AS DOUBLE) / ct) * 1000000.0) AS BIGINT)"
            ).alias("index_micro"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# q208 — Theil–Sen slope + Mann–Kendall S of the daily mean series (round 9)
# ---------------------------------------------------------------------------


@query(
    "q208_theil_sen_trend",
    oracle=f"""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // {86_400_000_000} AS day,
             CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                        * 1000.0 / count(*)) AS BIGINT) AS xm
      FROM events GROUP BY event_type, day
    ), p AS (
      SELECT a.event_type, a.day AS da, b.day AS db,
             CAST(round(CAST((b.xm - a.xm) * 1000000 AS DOUBLE)
                        / (b.day - a.day)) AS BIGINT) AS slope_micro,
             CASE WHEN b.xm > a.xm THEN 1
                  WHEN b.xm < a.xm THEN -1 ELSE 0 END AS s
      FROM d a JOIN d b ON b.event_type = a.event_type AND b.day > a.day
    ), agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS m_pairs,
             CAST(sum(s) AS BIGINT) AS mk_s
      FROM p GROUP BY event_type
    ), r AS (
      SELECT event_type, slope_micro,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope_micro, da, db) AS rnk
      FROM p
    )
    SELECT agg.event_type, agg.m_pairs, agg.mk_s,
           r.slope_micro AS ts_slope_micro
    FROM agg JOIN r
      ON r.event_type = agg.event_type AND r.rnk = (agg.m_pairs + 1) // 2
    ORDER BY agg.event_type
    """,
)
def q208_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend detection on each event type's daily-mean series:
    the Theil–Sen slope (median of all pairwise slopes — up to ~29%
    contamination-proof, vs OLS's zero) plus the Mann–Kendall S
    statistic (Σ sign(x_j − x_i), the standard nonparametric trend
    test). The monitoring-side complement to q192's ACF: ACF asks
    "does the series remember itself", this asks "is it going
    somewhere" — without trusting any distributional assumption, which
    is what you want over corpus-health metrics that are full of
    outliers.

    The series frame is q192's calendar-bounded daily aggregate (one
    hash aggregate; the daily mean frozen to a scaled long so both
    engines' series are bit-equal). The pair frame is the self-join on
    (type, day_j > day_i) — days²-bounded per type, i.e. bounded by
    the CALENDAR squared at any corpus size, never by row count. Each
    pairwise slope is one integer subtraction ratio rounded to the
    1e-6 grid (the division CASTs its int64 numerator to DOUBLE first
    — house rule); the median is rank-selected (lower median at rank
    (m+1) div 2, ties broken by the day pair) with the window riding
    the same bounded pair frame, so no statistics beyond exact int64
    ever cross engines."""
    e = _events(spark, sf_dir)
    d = e.groupBy("event_type", F.expr(f"us div {_US_DAY}").alias("day")).agg(
        F.expr(
            "CAST(round(CAST(sum(v100) AS DOUBLE) * 1000.0 / count(*)) AS BIGINT)"
        ).alias("xm")
    )
    a, b = d.alias("a"), d.alias("b")
    p = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.day").alias("da"),
        F.col("b.day").alias("db"),
        F.expr(
            "CAST(round(CAST((b.xm - a.xm) * 1000000 AS DOUBLE)"
            " / (b.day - a.day)) AS BIGINT)"
        ).alias("slope_micro"),
        F.expr(
            "CASE WHEN b.xm > a.xm THEN 1 WHEN b.xm < a.xm THEN -1 ELSE 0 END"
        ).alias("s"),
    )
    agg = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("m_pairs"),
        F.sum("s").cast("long").alias("mk_s"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro", "da", "db")
    r = p.withColumn("rnk", F.row_number().over(w))
    return (
        agg.join(r, "event_type")
        .filter(F.col("rnk") == F.expr("(m_pairs + 1) DIV 2"))
        .select(
            "event_type",
            "m_pairs",
            "mk_s",
            F.col("slope_micro").alias("ts_slope_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q219 — CUSUM changepoint scan on the daily mean series (round 9)
# ---------------------------------------------------------------------------


@query(
    "q219_cusum_changepoint",
    oracle=f"""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // {86_400_000_000} AS day,
             CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                        * 1000.0 / count(*)) AS BIGINT) AS xm
      FROM events GROUP BY event_type, day
    ), mu AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(round(CAST(sum(xm) AS DOUBLE) / count(*)) AS BIGINT) AS mu
      FROM d GROUP BY event_type
    ), c AS (
      SELECT d.event_type, d.day, mu.n_days,
             CAST(sum(d.xm - mu.mu) OVER (PARTITION BY d.event_type
                                          ORDER BY d.day
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS cum
      FROM d JOIN mu ON mu.event_type = d.event_type
    ), s AS (
      SELECT event_type, day, n_days,
             cum - least(CAST(0 AS BIGINT),
                         min(cum) OVER (PARTITION BY event_type ORDER BY day
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)) AS stat
      FROM c
    ), r AS (
      SELECT event_type, n_days, day AS cp_day, stat AS s_max,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY stat DESC, day) AS rnk
      FROM s QUALIFY rnk = 1
    )
    SELECT event_type, n_days, cp_day, s_max
    FROM r ORDER BY event_type
    """,
)
def q219_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event type: the day of the maximum
    upward drawup of the cumulative deviation from the series mean —
    S(t) = C(t) − min(0, min_{u<t} C(u)) with C the running sum of
    (daily mean − series mean). The level-shift detector that
    completes the monitoring corner: q189 asks "did the distribution
    move between two windows", q208 asks "is there a monotone trend",
    CUSUM asks "WHEN did the level change" — the statistic SPC
    pipelines page on.

    Integer-exact end to end (no transcendentals in this module): the
    daily means are q192's scaled longs, the series mean rounds once
    to the same grid, and all cumulative/min/argmax arithmetic is
    int64. Both running windows and the argmax rank ride the
    calendar-bounded per-type frame (days per type, never rows), the
    module's documented safe window family; ties break to the
    earliest day so the changepoint is deterministic."""
    e = _events(spark, sf_dir)
    d = e.groupBy("event_type", F.expr(f"us div {_US_DAY}").alias("day")).agg(
        F.expr(
            "CAST(round(CAST(sum(v100) AS DOUBLE) * 1000.0 / count(*)) AS BIGINT)"
        ).alias("xm")
    )
    mu = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(round(CAST(sum(xm) AS DOUBLE) / count(*)) AS BIGINT)").alias(
            "mu"
        ),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev_min = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.join(mu, "event_type").select(
        "event_type",
        "day",
        "n_days",
        F.sum(F.col("xm") - F.col("mu")).over(w_cum).cast("long").alias("cum"),
    )
    s = c.select(
        "event_type",
        "day",
        "n_days",
        (
            F.col("cum")
            - F.least(F.lit(0).cast("long"), F.min("cum").over(w_prev_min))
        ).alias("stat"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(F.col("stat").desc(), "day")
    return (
        s.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("day").alias("cp_day"),
            F.col("stat").alias("s_max"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q220 — symbolic (equi-depth) discretization + motif counts (round 9)
# ---------------------------------------------------------------------------


@query(
    "q220_symbolic_motifs",
    oracle=f"""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // {86_400_000_000} AS day,
             CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                        * 1000.0 / count(*)) AS BIGINT) AS xm
      FROM events GROUP BY event_type, day
    ), sym AS (
      SELECT event_type, day,
             ntile(3) OVER (PARTITION BY event_type ORDER BY xm, day) AS s
      FROM d
    ), seq AS (
      SELECT event_type,
             s AS s1,
             lead(s, 1) OVER (PARTITION BY event_type ORDER BY day) AS s2,
             lead(s, 2) OVER (PARTITION BY event_type ORDER BY day) AS s3
      FROM sym
    )
    SELECT event_type,
           CAST(s1 AS VARCHAR) || CAST(s2 AS VARCHAR) || CAST(s3 AS VARCHAR)
             AS motif,
           CAST(count(*) AS BIGINT) AS cnt
    FROM seq WHERE s3 IS NOT NULL
    GROUP BY event_type, motif
    ORDER BY event_type, motif
    """,
)
def q220_symbolic_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolic motif counting on each event type's daily
    mean series: discretize values into 3 equi-depth symbols (rank
    terciles — the distribution-free stand-in for SAX's Gaussian
    breakpoints, keeping this module's no-libm contract), slide a
    3-day word over the day-ordered symbol sequence, count each
    motif's occurrences. The motif histogram is the cheap sequence
    signature behind time-series anomaly screens: a flat series piles
    onto '222', a sawtooth onto '131'/'313', and a motif that appears
    this week but never before is q189's drift signal at the SEQUENCE
    level rather than the value level.

    Two calendar-bounded windows per type (value-rank ntile with the
    day tie-break making the tercile assignment total-order
    deterministic; day-ordered lead for the sliding word) and one hash
    aggregate over ≤ 27·|types| motif groups. Integer/string-exact —
    no floating point beyond q192's frozen daily means."""
    e = _events(spark, sf_dir)
    d = e.groupBy("event_type", F.expr(f"us div {_US_DAY}").alias("day")).agg(
        F.expr(
            "CAST(round(CAST(sum(v100) AS DOUBLE) * 1000.0 / count(*)) AS BIGINT)"
        ).alias("xm")
    )
    w_val = Window.partitionBy("event_type").orderBy("xm", "day")
    w_day = Window.partitionBy("event_type").orderBy("day")
    sym = d.select("event_type", "day", F.ntile(3).over(w_val).alias("s"))
    seq = sym.select(
        "event_type",
        F.col("s").alias("s1"),
        F.lead("s", 1).over(w_day).alias("s2"),
        F.lead("s", 2).over(w_day).alias("s3"),
    )
    return (
        seq.filter(F.col("s3").isNotNull())
        .select(
            "event_type",
            F.concat(
                F.col("s1").cast("string"),
                F.col("s2").cast("string"),
                F.col("s3").cast("string"),
            ).alias("motif"),
        )
        .groupBy("event_type", "motif")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy("event_type", "motif")
    )
