"""Window functions: ranking, analytic, frames, running aggregates,
as-of join (SURVEY.md §2B "Window functions" + "as-of join").

Scale notes: every window here partitions by a high-cardinality key
(custkey/user_id), so the single shuffle distributes evenly; none uses
an un-partitioned global window (which would serialize on one task at
100 TB). Running sums use the scaled-long trick (functions.deterministic)
so cumulative doubles stay bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.asof import asof_join
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


@query(
    "q30_rank_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q30_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (deterministic tiebreak
    on orderkey). Catalyst runs this as a single shuffle + per-partition
    sort; AQE handles any hot customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "q31_rank_dense_ntile",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_nationkey, rnk, c_custkey
    LIMIT 1000
    """,
)
def q31_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile battery over one shared window spec."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_nationkey", "rnk", "c_custkey")
        .limit(1000)
    )


@query(
    "q32_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(event_id, 2) OVER w AS prev2_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    LIMIT 2000
    """,
)
def q32_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user session stream (ref-domain: per-member
    ordered oplog scan, SURVEY §2A A4 ordering guarantee)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.lag("event_id", 2).over(w).alias("prev2_event"),
        )
        .orderBy("user_id", "event_id")
        .limit(2000)
    )


@query(
    "q33_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
               AS running_spend,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS order_seq
    FROM orders
    ORDER BY o_custkey, order_seq
    LIMIT 5000
    """,
)
def q33_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (scaled-long cumsum => bit-exact)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaled = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            (F.sum(scaled).over(cum) / 100.0).alias("running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
        .limit(5000)
    )


@query(
    "q34_moving_avg_rows_frame",
    oracle="""
    SELECT user_id, event_id,
           sum(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             / (100.0 * count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
               AS moving_avg
    FROM events
    ORDER BY user_id, event_id
    LIMIT 2000
    """,
)
def q34_moving_avg_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average via explicit ROWS frame (exact arithmetic)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, Window.currentRow)
    scaled = F.round(F.col("value") * 100, 0).cast("long")
    return (
        e.select(
            "user_id",
            "event_id",
            (F.sum(scaled).over(w) / (F.count("*").over(w) * F.lit(100.0))).alias("moving_avg"),
        )
        .orderBy("user_id", "event_id")
        .limit(2000)
    )


@query(
    "q35_range_frame",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           count(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                          RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_500
    FROM customer
    ORDER BY c_nationkey, c_acctbal, c_custkey
    LIMIT 2000
    """,
)
def q35_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric order key — value-based neighborhoods."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal").rangeBetween(-500, Window.currentRow)
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.count("*").over(w).alias("n_within_500"),
        )
        .orderBy("c_nationkey", "c_acctbal", "c_custkey")
        .limit(2000)
    )


@query(
    "q36_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
)
def q36_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an unbounded frame, reduced to one row per key."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@query(
    "q37_asof_join",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, 0 AS side, event_id,
               CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS TIMESTAMP) AS purchase_ts
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 1 AS side, CAST(NULL AS BIGINT),
               event_id, ts
        FROM events WHERE event_type = 'purchase'
    ), filled AS (
        SELECT side, purchase_id, purchase_ts, user_id,
               last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, side, coalesce(event_id, purchase_id)
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id_asof
        FROM u
    )
    SELECT purchase_id, user_id, purchase_ts, click_id_asof
    FROM filled WHERE side = 1
    ORDER BY purchase_id
    """,
)
def q37_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it by
    the same user (operators/asof.py — union + one keyed window, a single
    shuffle; no merge_asof-in-pandas). Ref-domain analog: resuming each
    member's tail from its latest checkpoint <= now
    (MongoOplogTailMapper.java:82-88)."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_time="purchase_ts",
        right_time="ts",
        right_values=["click_id"],
        left_tiebreak="purchase_id",
        right_tiebreak="click_id",
    ).orderBy("purchase_id")


@query(
    "q131_asof_join_forward",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, 0 AS side, event_id AS click_id,
               CAST(NULL AS BIGINT) AS purchase_id
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, 1 AS side, CAST(NULL AS BIGINT), event_id
        FROM events WHERE event_type = 'purchase'
    ), filled AS (
        SELECT side, click_id, user_id, ts,
               first_value(CASE WHEN side = 1 THEN purchase_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, side, coalesce(click_id, purchase_id)
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS purchase_id_next
        FROM u
    )
    SELECT click_id, user_id, ts AS click_ts, purchase_id_next
    FROM filled WHERE side = 0
    ORDER BY click_id
    """,
)
def q131_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each click, the next purchase at-or-after
    it by the same user (operators/asof.asof_join_forward) — the
    attribution direction, completing the as-of family next to q37's
    backward form. Same single-shuffle union+window plan with the frame
    flipped to [current row, unbounded following]."""
    from flink_mingo_tail_spark.operators.asof import asof_join_forward

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return (
        asof_join_forward(
            clicks,
            purchases,
            key="user_id",
            left_time="click_ts",
            right_time="ts",
            right_values=["purchase_id"],
            left_tiebreak="click_id",
            right_tiebreak="purchase_id",
        )
        .orderBy("click_id")
    )


_US_DAY = 86_400_000_000


@query(
    "q137_running_distinct_users",
    oracle=f"""
    WITH t AS (
      SELECT event_type, epoch_us(ts) // {_US_DAY} AS day_idx, user_id FROM events
    ), d AS (
      SELECT DISTINCT event_type, day_idx FROM t
    )
    SELECT d.event_type, d.day_idx,
           (SELECT count(DISTINCT t.user_id) FROM t
             WHERE t.event_type = d.event_type AND t.day_idx <= d.day_idx) AS cum_users
    FROM d
    ORDER BY event_type, day_idx
    """,
)
def q137_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over an ordered window — the one window
    aggregate Spark does not support directly (``count(DISTINCT) OVER``
    raises). The scalable rewrite: mark each user's FIRST day per
    event_type (one groupBy shuffle on the high-cardinality
    (type, user) key), roll up to new-users-per-day, and running-sum
    that over the tiny per-type day axis — O(rows) work plus a window
    whose partitions hold only #days rows, vs the naive per-day
    re-count which is O(days x rows). The oracle deliberately uses the
    naive correlated spelling (DuckDB decorrelates it), so two
    independent formulations must agree."""
    e = _t(spark, sf_dir, "events")
    t = e.select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_US_DAY}").alias("day_idx"),
        "user_id",
    )
    first_day = t.groupBy("event_type", "user_id").agg(F.min("day_idx").alias("day_idx"))
    new_per_day = first_day.groupBy("event_type", "day_idx").agg(
        F.count("*").alias("new_users")
    )
    days = t.select("event_type", "day_idx").distinct()
    daily = days.join(new_per_day, ["event_type", "day_idx"], "left").na.fill(
        {"new_users": 0}
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type", "day_idx", F.sum("new_users").over(w).alias("cum_users")
    ).orderBy("event_type", "day_idx")


@query(
    "q148_distribution_windows",
    oracle="""
    SELECT o_orderpriority AS grp, o_orderkey, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(o_totalprice, 3) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_lowest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY grp, o_totalprice, o_orderkey
    """,
)
def q148_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank, cume_dist,
    nth_value — completing the ranking family (q30/q31). The unique
    (totalprice, orderkey) sort makes every value deterministic, and
    both engines compute the distributions as exact-integer divisions
    (rank-1)/(n-1), so doubles match bitwise. nth_value gets an
    explicit ROWS frame: its default RANGE frame is tie-sensitive.

    Scale note: these semantics need the group's full sort — fine here
    (priority groups shard the sort), but for distribution STATS over
    bounded group counts at 100 TB, the rank-select percentile (q27b)
    and equi-depth histogram (q125) answer without per-row output."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            F.col("o_orderpriority").alias("grp"),
            "o_orderkey",
            "o_totalprice",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("o_totalprice", 3).over(wf).alias("third_lowest"),
        )
        .orderBy("grp", "o_totalprice", "o_orderkey")
    )


@query(
    "q149_locf_forward_fill",
    oracle="""
    SELECT user_id, event_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_value
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q149_locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event carries the user's
    most recent purchase amount via ``last(..., ignorenulls=True)`` over
    a running frame — the IGNORE NULLS analytic the lag/lead battery
    (q32/q36) doesn't cover, and the standard gap-fill idiom for sparse
    sensor/feature columns in a training pipeline (densify a sparse
    column without a self-join). One shuffle on the high-cardinality
    user_id; (ts, event_id) is a unique order so the fill is
    deterministic. Values pass through unchanged (no arithmetic), so
    both engines emit identical doubles."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.last(v, ignorenulls=True).over(w).alias("last_purchase_value"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# q183 — percent_rank / cume_dist battery (distribution windows)
# ---------------------------------------------------------------------------

@query(
    "q183_percent_rank_cume_dist",
    oracle="""
    WITH t AS (
      SELECT c_nationkey, c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal100
      FROM customer
    )
    SELECT c_nationkey, c_custkey, bal100,
           CAST(round(percent_rank() OVER w * 1000000.0) AS BIGINT) AS pr_micro,
           CAST(round(cume_dist() OVER w * 1000000.0) AS BIGINT) AS cd_micro
    FROM t
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal100, c_custkey)
    ORDER BY c_nationkey, c_custkey
    """,
)
def q183_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist over customer balances within each
    nation — the relative-position windows (SURVEY §2B ranking family)
    that q30/q31's rank/dense_rank/ntile battery did not yet cover.

    The window partitions by nation (high-cardinality-enough key; no
    global single-task window), and the ORDER BY carries a custkey
    tiebreak so both functions are evaluated over a total order:
    percent_rank = (rank-1)/(n-1) and cume_dist = rank/n then reduce
    to the same exact-integer-ratio expression in both engines (IEEE
    division of exact ints, bit-equal), micro-rounded for the hash.
    """
    t = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("bal100"),
    )
    w = Window.partitionBy("c_nationkey").orderBy("bal100", "c_custkey")
    return (
        t.withColumn("pr", F.percent_rank().over(w))
        .withColumn("cd", F.cume_dist().over(w))
        .select(
            "c_nationkey",
            "c_custkey",
            "bal100",
            F.expr("CAST(round(pr * 1000000.0) AS BIGINT)").alias("pr_micro"),
            F.expr("CAST(round(cd * 1000000.0) AS BIGINT)").alias("cd_micro"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )
