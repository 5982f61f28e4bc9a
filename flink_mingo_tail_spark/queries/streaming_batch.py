"""Batch-equivalent forms of the streaming surface (SURVEY.md §2B
"Streaming-only"): tumbling / sliding / session windows.

Spark's `window()`/`session_window()` work identically in batch and
Structured Streaming (same Catalyst expressions, minus watermarking), so
the DuckDB oracle can verify the windowing semantics here while
tests/test_streaming.py exercises the same operators under readStream
with watermarks, late data, and checkpoint/resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "events")


@query(
    "q90_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def q90_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (epoch-aligned, so identical to
    date_trunc). In streaming this same expression runs with
    `withWatermark` for state eviction — see tests/test_streaming.py."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "n_users")
        .orderBy("window_start", "event_type")
    )


@query(
    "q91_sliding_window",
    oracle="""
    WITH buckets AS (
        SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                       time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
                   AS window_start,
               value
        FROM events
    )
    SELECT window_start,
           count(*) AS n,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM buckets
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def q91_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in 2
    overlapping epoch-aligned windows — the oracle reproduces the window
    assignment by exploding the two bucket starts."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


@query(
    "q92_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q92_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user via the native
    `session_window` operator; the oracle derives identical sessions with
    the gaps-and-islands window idiom (session end = last event + gap,
    matching Spark's session_window.end)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q93_windowed_topk_users",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, user_id, count(*) AS n
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT day, user_id, n,
               row_number() OVER (PARTITION BY day ORDER BY n DESC, user_id) AS rnk
        FROM daily
    )
    SELECT day, user_id, n, rnk FROM ranked
    WHERE rnk <= 3
    ORDER BY day, rnk
    """,
)
def q93_windowed_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: event-time tumbling day windows → per-window top-3
    users (the streaming-dashboard staple: window agg + rank)."""
    e = _events(spark, sf_dir)
    daily = (
        e.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "user_id", "n")
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(Window.partitionBy("day").orderBy(F.col("n").desc(), "user_id"))
    return (
        daily.withColumn("rnk", rnk).filter(F.col("rnk") <= 3).orderBy("day", "rnk")
    )
