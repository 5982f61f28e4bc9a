"""Batch-equivalent forms of the streaming surface (SURVEY.md §2B
"Streaming-only"): tumbling / sliding / session windows.

Spark's `window()`/`session_window()` work identically in batch and
Structured Streaming (same Catalyst expressions, minus watermarking), so
the DuckDB oracle can verify the windowing semantics here while
tests/test_streaming.py exercises the same operators under readStream
with watermarks, late data, and checkpoint/resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "events")


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts is TIMESTAMP_NTZ; session is pinned UTC, so the cast matches
    # DuckDB's epoch_us over the naive timestamp exactly.
    return _events(spark, sf_dir).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )


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


_WM_DELAY_US = 10 * 60 * 1_000_000  # 10-minute watermark delay
_WM_WIN_US = 5 * 60 * 1_000_000  # 5-minute tumbling windows
_WM_BUCKET = 4096  # arrival-order prefix-max bucket width (see scale note)


@query(
    "q114_watermark_late_drop",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, epoch_us(ts) AS us FROM events
    ), m AS (
      SELECT *, max(us) OVER (ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS arr_max
      FROM t
    )
    SELECT CAST(us // {_WM_WIN_US} * {_WM_WIN_US} AS BIGINT) AS window_start_us,
           CAST(sum(CASE WHEN arr_max IS NULL OR us >= arr_max - {_WM_DELAY_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN arr_max IS NOT NULL AND us < arr_max - {_WM_DELAY_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM m
    GROUP BY 1
    ORDER BY 1
    """,
)
def q114_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of append-mode watermark late-data dropping
    (tests/test_streaming.py::test_watermark_drops_late_rows): replay
    the event log in arrival order (event_id = ingest sequence), track
    the running event-time maximum, and drop any row that arrives more
    than the watermark delay behind it — then count kept vs late rows
    per tumbling window.

    Scale shape: a naive formulation is one global running-max window
    (single task). Instead the arrival axis is bucketed: per-bucket
    running max is partition-parallel, and the cross-bucket prefix max
    runs over only n/4096 bucket summaries before a broadcast join back
    — the standard two-level prefix-scan, same trick as q110's
    suffix-min. The oracle keeps the naive one-task window (DuckDB
    clarity; it is not graded on scale)."""
    e = _events_us(spark, sf_dir).select("event_id", "user_id", "us")
    b = e.withColumn("bucket", F.expr(f"event_id DIV {_WM_BUCKET}"))
    in_bucket = Window.partitionBy("bucket").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = b.withColumn("in_max", F.max("us").over(in_bucket))
    bmax = b.groupBy("bucket").agg(F.max("us").alias("bmax"))
    prior = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bmax.withColumn("prefix", F.max("bmax").over(prior)).select("bucket", "prefix")
    j = b.join(F.broadcast(prefix), "bucket")
    arr_max = F.greatest("in_max", "prefix")  # greatest() skips NULLs
    late = arr_max.isNotNull() & (F.col("us") < arr_max - F.lit(_WM_DELAY_US))
    return (
        j.withColumn("late", late)
        .groupBy(F.expr(f"us DIV {_WM_WIN_US} * {_WM_WIN_US}").alias("window_start_us"))
        .agg(
            F.sum(F.when(~F.col("late"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late"),
        )
        .orderBy("window_start_us")
    )


_DD_HORIZON_US = 30 * 60 * 1_000_000  # 30-minute dedup horizon


@query(
    "q115_dedup_within_watermark",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
    ), g AS (
      SELECT *, CASE WHEN lag(us) OVER (PARTITION BY user_id, event_type
                                        ORDER BY us, event_id) IS NULL
                       OR us - lag(us) OVER (PARTITION BY user_id, event_type
                                             ORDER BY us, event_id) > {_DD_HORIZON_US}
                     THEN 1 ELSE 0 END AS kept
      FROM t
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(kept) AS BIGINT) AS n_kept
    FROM g
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q115_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of dropDuplicatesWithinWatermark
    (tests/test_streaming.py::test_drop_duplicates_within_watermark):
    an event is a duplicate if the same (user_id, event_type) key fired
    within the last 30 minutes of event time; only burst-leaders are
    kept. One shuffle on the dedup key serves both the lag window and
    the per-user rollup."""
    e = _events_us(spark, sf_dir).select("user_id", "event_type", "event_id", "us")
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    kept = F.when(gap.isNull() | (gap > _DD_HORIZON_US), 1).otherwise(0)
    return (
        e.withColumn("kept", kept)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_total"), F.sum("kept").alias("n_kept"))
        .orderBy("user_id")
    )


_SSJ_BOUND_US = 30 * 60 * 1_000_000  # purchase within 30 min of click


@query(
    "q116_interval_join_clicks_purchases",
    oracle=f"""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) >= epoch_us(c.ts)
     AND epoch_us(p.ts) <= epoch_us(c.ts) + {_SSJ_BOUND_US}
    ORDER BY click_id, purchase_id
    """,
)
def q116_interval_join_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream interval join
    (tests/test_streaming_extras.py::test_stream_stream_join_with_watermarks):
    clicks joined to same-user purchases within a bounded event-time
    window. The user_id equi-key carries the shuffle; the time bound is
    a post-join filter — in streaming the same bound is what makes join
    state evictable, here it is what keeps the per-user pair space
    small."""
    e = _events_us(spark, sf_dir)
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("us").alias("c_us")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("us").alias("p_us"),
    )
    return (
        c.join(
            p,
            (c.user_id == p.p_user)
            & (p.p_us >= c.c_us)
            & (p.p_us <= c.c_us + F.lit(_SSJ_BOUND_US)),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.col("p_us") - F.col("c_us")).alias("lag_us"),
        )
        .orderBy("click_id", "purchase_id")
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


@query(
    "q141_interval_join_left_outer",
    oracle=f"""
    WITH c AS (
      SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.click_id, p.purchase_id, c.user_id,
           CAST(p.p_us - c.c_us AS BIGINT) AS lag_us
    FROM c LEFT JOIN p
      ON p.user_id = c.user_id
     AND p.p_us >= c.c_us
     AND p.p_us <= c.c_us + {_SSJ_BOUND_US}
    ORDER BY click_id, purchase_id
    """,
)
def q141_interval_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream LEFT OUTER interval
    join (tests/test_streaming_extras.py::
    test_stream_stream_left_outer_join_emits_nulls): every click
    appears, converted or not — unmatched clicks carry NULL purchase
    columns. In streaming the null row can only be emitted once the
    watermark passes click_ts + bound + delay (until then a match may
    still arrive), which is exactly the state-eviction point the
    bounded time condition buys; the batch form is the same user-keyed
    equi-join with the bound as a residual predicate and 'left' type.
    The funnel read: purchase_id IS NULL = drop-off."""
    e = _events_us(spark, sf_dir)
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("us").alias("c_us")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("us").alias("p_us"),
    )
    return (
        c.join(
            p,
            (c.user_id == p.p_user)
            & (p.p_us >= c.c_us)
            & (p.p_us <= c.c_us + F.lit(_SSJ_BOUND_US)),
            "left",
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.col("p_us") - F.col("c_us")).alias("lag_us"),
        )
        .orderBy("click_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# q189 — windowed distribution-drift statistic vs the corpus reference
# ---------------------------------------------------------------------------

@query(
    "q189_drift_windows",
    oracle="""
    WITH t AS (
      SELECT date_trunc('hour', ts) AS window_start,
             CAST(round(value * 100) AS BIGINT) // 1000 AS bucket
      FROM events
    ), o AS (
      SELECT window_start, bucket, CAST(count(*) AS BIGINT) AS obs
      FROM t GROUP BY window_start, bucket
    ), ref AS (
      SELECT bucket, CAST(sum(obs) AS BIGINT) AS ref_n FROM o GROUP BY bucket
    ), tot AS (
      SELECT CAST(sum(obs) AS BIGINT) AS big_n FROM o
    ), wn AS (
      SELECT window_start, CAST(sum(obs) AS BIGINT) AS n_w FROM o GROUP BY window_start
    ), terms AS (
      SELECT o.window_start AS window_start, n_w,
             CAST(round(
               (obs - CAST(n_w AS DOUBLE) * ref_n / big_n)
               * (obs - CAST(n_w AS DOUBLE) * ref_n / big_n)
               / (CAST(n_w AS DOUBLE) * ref_n / big_n) * 1000000.0)
               AS BIGINT) AS term_micro
      FROM o JOIN ref ON o.bucket = ref.bucket
             JOIN wn ON o.window_start = wn.window_start
             CROSS JOIN tot
    )
    SELECT window_start, n_w AS n,
           CAST(sum(term_micro) AS BIGINT) AS chi2_micro
    FROM terms GROUP BY window_start, n_w
    ORDER BY window_start
    """,
)
def q189_drift_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tumbling-window distribution drift: the chi-square statistic
    of each hour's value-bucket histogram against the whole corpus's
    reference histogram — the batch twin of the streaming drift monitor
    (streaming/drift.py, tests/test_drift.py), which runs the identical
    expression tree over windowed state with a broadcast reference.

    Determinism: each per-bucket chi-square term is micro-rounded to an
    int64 BEFORE the per-window sum (the q163 scaled-term idiom), so
    the aggregate is an exact integer sum — no float-summation-order
    dependence across engines or partitionings. Scale shape: one hash
    aggregate to (window, bucket) — everything downstream (reference,
    window totals, terms) is histogram-sized; the reference and grand
    total ride broadcast joins.
    """
    t = _events(spark, sf_dir).select(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        F.expr("CAST(round(value * 100) AS BIGINT) div 1000").alias("bucket"),
    )
    o = t.groupBy("window_start", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    ref = o.groupBy("bucket").agg(F.sum("obs").cast("long").alias("ref_n"))
    tot = o.agg(F.sum("obs").cast("long").alias("big_n"))
    wn = o.groupBy("window_start").agg(F.sum("obs").cast("long").alias("n_w"))
    e = "(CAST(n_w AS DOUBLE) * ref_n / big_n)"
    terms = (
        o.join(F.broadcast(ref), "bucket")
        .join(F.broadcast(wn), "window_start")
        .crossJoin(F.broadcast(tot))
        .select(
            "window_start",
            "n_w",
            F.expr(
                f"CAST(round((obs - {e}) * (obs - {e}) / {e} * 1000000.0) AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    return (
        terms.groupBy("window_start", "n_w")
        .agg(F.sum("term_micro").cast("long").alias("chi2_micro"))
        .select(
            "window_start", F.col("n_w").alias("n"), "chi2_micro"
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# q221 — novelty-vs-standing-index scoring (streaming/novelty_ingest's
# batch-checkable twin, round 10)
# ---------------------------------------------------------------------------

# Shingle width interpolated from the operator's own constant (ADVICE
# round-11): a hard-coded 5 here would silently desynchronize the oracle
# if DEFAULT_SHINGLE_K ever changed. DuckDB list slices are 1-based and
# inclusive, so ts[i:i+k-1] is exactly k tokens.
from flink_mingo_tail_spark.streaming.novelty_ingest import (  # noqa: E402
    DEFAULT_SHINGLE_K as _NOV_SHINGLE_K,
)

_NOVELTY_SQL_SHINGLE = (
    f"('0x' || substr(md5(array_to_string(ts[i:i+{_NOV_SHINGLE_K - 1}], ' ')), 1, 15))::BIGINT"
)


@query(
    "q221_novelty_vs_index",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, {_NOVELTY_SQL_SHINGLE} AS h
      FROM toks, unnest(range(1, len(ts) - {_NOV_SHINGLE_K} + 2)) AS t(i)
      WHERE len(ts) >= {_NOV_SHINGLE_K}
    ),
    inc AS (SELECT doc_id, h FROM sh WHERE doc_id % 10 = 7),
    idx AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 <> 7)
    SELECT inc.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN idx.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(round(CAST(sum(CASE WHEN idx.h IS NULL THEN 1 ELSE 0 END)
                           * 1000000 AS DOUBLE) / count(*)) AS BIGINT)
             AS novel_micro
    FROM inc LEFT JOIN idx ON idx.h = inc.h
    GROUP BY inc.doc_id
    ORDER BY inc.doc_id
    """,
)
def q221_novelty_vs_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty of an incoming batch against a STANDING shingle index —
    the batch-checkable twin of streaming/novelty_ingest.py, scored by
    the streaming operator's OWN ``score_batch_novelty`` (not a re-
    implementation), so the driver's oracle hash covers the exact code
    the foreachBatch body runs. The incoming slice is the q117
    convention (doc_id % 10 == 7 stands in for today's crawl); the
    index is the distinct 5-token-shingle hash set of everything else
    (what build_novelty_index persists).

    Shape: index side is one corpus-linear distinct-shingle pass (the
    persisted standing index at scale — built once, not per batch);
    scoring is an O(batch) left-anti probe of the incoming slice's
    shingles against it plus two map-combinable counts. Differs from
    q209 (global first-occurrence novelty) in the membership frame:
    here novelty is 'absent from the index', the arrival-order
    semantics the streaming ingest maintains batch-by-batch."""
    from flink_mingo_tail_spark.streaming.novelty_ingest import (
        DEFAULT_SHINGLE_K,
        doc_shingle_hashes,
        score_batch_novelty,
    )

    prepare_session(spark)
    # spread() the single-file test scan (1 partition) before the
    # shingle + md5 map work serializes on one core — 3.17 s -> 1.56 s
    # at sf0.1, scale-gated inside spread()
    d = spread(load_table(spark, sf_dir, "documents"))
    inc = d.filter(F.col("doc_id") % 10 == 7)
    idx = d.filter(F.col("doc_id") % 10 != 7)
    # r14 optimization: the index side only feeds a left-anti join,
    # which is multiplicity-blind — the per-doc and global distinct
    # shuffles of the corpus-sized shingle stream bought nothing
    # (2 full shuffles of ~2M rows at sf0.1). The persisted standing
    # index (the production path) stays distinct on disk.
    index_shingles = doc_shingle_hashes(
        idx, DEFAULT_SHINGLE_K, distinct=False
    ).select("h")
    return score_batch_novelty(inc, index_shingles, DEFAULT_SHINGLE_K).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q234 — streaming curation ingest (the composed pipeline, incrementally)
# ---------------------------------------------------------------------------

_ING_BATCH_W = 100  # docs per simulated arrival batch (doc_id DIV 100)


def _curation_ingest_oracle() -> str:
    from flink_mingo_tail_spark.operators.dedup import sql_lsh_band_keys
    from flink_mingo_tail_spark.queries.dedup import (
        _PIPE_STOPS,
        _SQL_SIG,
        MINHASH_K,
    )
    from flink_mingo_tail_spark.streaming.curation_ingest import (
        DEFAULT_BUDGET,
        DEFAULT_EVAL_MOD,
        DEFAULT_ROWS_PER_BAND,
    )

    bands = sql_lsh_band_keys("sig", DEFAULT_ROWS_PER_BAND, MINHASH_K)
    return f"""
    WITH d AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(text, ' ') AS t,
               doc_id // {_ING_BATCH_W} AS b
        FROM documents
    ), s1 AS (
        SELECT *,
               CAST(len(t) AS BIGINT) AS n_toks,
               CASE WHEN doc_id % {DEFAULT_EVAL_MOD} = 0 THEN 'eval_holdout'
                    WHEN len(t) < 15 THEN 'too_short'
                    WHEN len(t) > 5000 THEN 'too_long'
                    WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) < 0.2
                      THEN 'repetitive'
                    WHEN lang = 'en'
                         AND len(list_intersect(list_distinct(t), {_PIPE_STOPS})) < 1
                      THEN 'no_stopwords'
                    END AS r1
        FROM d
    ), qp AS (
        SELECT * FROM s1 WHERE r1 IS NULL
    ), hashes AS (
        -- the standing index hashes RAW text (probe_dedup_index)
        SELECT doc_id, b, md5(text) AS ch FROM qp
    ), ex AS (
        SELECT DISTINCT h.doc_id FROM hashes h
        JOIN hashes h2 ON h2.ch = h.ch AND h2.b < h.b
    ), sigs AS (
        SELECT doc_id, b, {_SQL_SIG} AS sig FROM qp
    ), banded AS (
        SELECT doc_id, b, unnest({bands}) AS band FROM sigs
    ), nd AS (
        SELECT DISTINCT x.doc_id FROM banded x
        JOIN banded y ON y.band = x.band AND y.b < x.b
    ), grams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM qp WHERE len(t) >= 4
    ), probeg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM d WHERE doc_id % {DEFAULT_EVAL_MOD} = 0 AND len(t) >= 4
    ), cont AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN probeg p ON gr.g = p.g
    ), gate AS (
        SELECT q.* FROM qp q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM ex)
          AND q.doc_id NOT IN (SELECT doc_id FROM nd)
          AND q.doc_id NOT IN (SELECT doc_id FROM cont)
    ), packed AS (
        SELECT doc_id,
               CAST(coalesce(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY b, n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM gate
    ), ob AS (
        SELECT doc_id FROM packed WHERE cum_before >= {DEFAULT_BUDGET}
    )
    SELECT s1.doc_id, s1.source, s1.n_toks, CAST(s1.b AS BIGINT) AS ingest_batch,
           coalesce(s1.r1,
                    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup' END,
                    CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END,
                    CASE WHEN ct.doc_id IS NOT NULL THEN 'contaminated' END,
                    CASE WHEN ob.doc_id IS NOT NULL THEN 'over_budget' END,
                    'kept') AS reason
    FROM s1
    LEFT JOIN ex ON ex.doc_id = s1.doc_id
    LEFT JOIN nd ON nd.doc_id = s1.doc_id
    LEFT JOIN cont ct ON ct.doc_id = s1.doc_id
    LEFT JOIN ob ON ob.doc_id = s1.doc_id
    ORDER BY s1.doc_id
    """


@query("q234_streaming_curation", oracle=_curation_ingest_oracle())
def q234_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation pipeline run INCREMENTALLY — q226's
    streaming twin, driven through streaming/curation_ingest's OWN
    foreachBatch body (not a re-implementation) over simulated arrival
    batches of {_ING_BATCH_W} documents (doc_id DIV {_ING_BATCH_W}):
    every batch is quality-gated, probed against the standing dedup
    index AS OF BATCH START (batch-vs-state granularity — docs in one
    batch never discount each other in the dup stages), decontaminated
    against the pre-built eval gram set, and budget-cut against the
    running per-source totals of all earlier committed batches; the
    batch's quality passers are then appended to the index.

    Differs from q226 semantically in exactly the ways arrival order
    forces: dup canon is "first ARRIVED batch" (q226 elects min doc_id
    globally — identical here because batches are doc_id-ordered), dup
    membership is batch-granular (an intra-batch pair survives until a
    later batch collides with the index), and the budget prefix runs in
    (batch, quality) order because a stream cannot re-order the past.
    The oracle replays those batch-granular semantics exactly (b' < b
    joins + the (b, n_chars DESC, doc_id) prefix).

    Scale shape: per batch everything is O(batch) probe rows against
    the standing state — the index side is membership semi-joins on
    (shard, key), the eval gram set is a static broadcast, the budget
    offset is |sources| rows re-derived from committed outputs (one
    source of truth, crash-safe; module docstring has the replay
    proof). The scratch run here is bounded: |corpus|/{_ING_BATCH_W}
    batches, classification collected (|corpus| rows), scratch deleted
    before returning (the q204 policy)."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.streaming.curation_ingest import (
        build_eval_gram_set,
        make_curation_ingest_batch_fn,
    )

    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="fmts-curation-ingest-q234-")
    try:
        eval_grams_path = f"{tmp}/eval_grams"
        build_eval_gram_set(d, eval_grams_path)
        ingest = make_curation_ingest_batch_fn(
            f"{tmp}/index", eval_grams_path, f"{tmp}/out"
        )
        batch_ids = sorted(
            r[0]
            for r in d.select(
                F.expr(f"doc_id DIV {_ING_BATCH_W}").alias("b")
            ).distinct().collect()
        )
        for b in batch_ids:
            ingest(d.filter(F.expr(f"doc_id DIV {_ING_BATCH_W}") == b), int(b))
        rows = (
            spark.read.schema("doc_id long, source string, n_toks long, reason string")
            .option("basePath", f"{tmp}/out")
            .parquet(*[f"{tmp}/out/ingest_batch={b}" for b in batch_ids])
            .withColumn(
                "ingest_batch", F.expr(f"doc_id DIV {_ING_BATCH_W}").cast("long")
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, source string, n_toks long, reason string, ingest_batch long",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q241 — streaming curation WITH the semantic standing index (round 12)
# ---------------------------------------------------------------------------


def _semantic_curation_oracle() -> str:
    """q234's batch-granular replay extended with the SEMANTIC stage:
    the sem CTE is q224/q240's shared _SEM_ORACLE_CTES spelling verbatim
    (one election, three consumers), joined on doc_id — semantic flags
    are batch-invariant because the eval index is static, so no b' < b
    clause is needed; only the budget gate changes (a semantically
    contaminated doc never reaches the prefix)."""
    from flink_mingo_tail_spark.operators.dedup import sql_lsh_band_keys
    from flink_mingo_tail_spark.queries.dedup import (
        _PIPE_STOPS,
        _SQL_SIG,
        MINHASH_K,
    )
    from flink_mingo_tail_spark.queries.similarity import _SEM_ORACLE_CTES
    from flink_mingo_tail_spark.streaming.curation_ingest import (
        DEFAULT_BUDGET,
        DEFAULT_EVAL_MOD,
        DEFAULT_ROWS_PER_BAND,
    )

    bands = sql_lsh_band_keys("sig", DEFAULT_ROWS_PER_BAND, MINHASH_K)
    return f"""
    WITH {_SEM_ORACLE_CTES},
    d AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(text, ' ') AS t,
               doc_id // {_ING_BATCH_W} AS b
        FROM documents
    ), s1 AS (
        SELECT *,
               CAST(len(t) AS BIGINT) AS n_toks,
               CASE WHEN doc_id % {DEFAULT_EVAL_MOD} = 0 THEN 'eval_holdout'
                    WHEN len(t) < 15 THEN 'too_short'
                    WHEN len(t) > 5000 THEN 'too_long'
                    WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) < 0.2
                      THEN 'repetitive'
                    WHEN lang = 'en'
                         AND len(list_intersect(list_distinct(t), {_PIPE_STOPS})) < 1
                      THEN 'no_stopwords'
                    END AS r1
        FROM d
    ), qp AS (
        SELECT * FROM s1 WHERE r1 IS NULL
    ), hashes AS (
        SELECT doc_id, b, md5(text) AS ch FROM qp
    ), ex AS (
        SELECT DISTINCT h.doc_id FROM hashes h
        JOIN hashes h2 ON h2.ch = h.ch AND h2.b < h.b
    ), sigs AS (
        SELECT doc_id, b, {_SQL_SIG} AS sig FROM qp
    ), banded AS (
        SELECT doc_id, b, unnest({bands}) AS band FROM sigs
    ), nd AS (
        SELECT DISTINCT x.doc_id FROM banded x
        JOIN banded y ON y.band = x.band AND y.b < x.b
    ), grams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM qp WHERE len(t) >= 4
    ), probeg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM d WHERE doc_id % {DEFAULT_EVAL_MOD} = 0 AND len(t) >= 4
    ), cont AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN probeg p ON gr.g = p.g
    ), gate AS (
        SELECT q.* FROM qp q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM ex)
          AND q.doc_id NOT IN (SELECT doc_id FROM nd)
          AND q.doc_id NOT IN (SELECT doc_id FROM cont)
          AND q.doc_id NOT IN (SELECT ci FROM sem)
    ), packed AS (
        SELECT doc_id,
               CAST(coalesce(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY b, n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM gate
    ), ob AS (
        SELECT doc_id FROM packed WHERE cum_before >= {DEFAULT_BUDGET}
    )
    SELECT s1.doc_id, s1.source, s1.n_toks, CAST(s1.b AS BIGINT) AS ingest_batch,
           coalesce(s1.r1,
                    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup' END,
                    CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END,
                    CASE WHEN ct.doc_id IS NOT NULL THEN 'contaminated' END,
                    CASE WHEN sm.ci IS NOT NULL THEN 'contaminated_semantic' END,
                    CASE WHEN ob.doc_id IS NOT NULL THEN 'over_budget' END,
                    'kept') AS reason
    FROM s1
    LEFT JOIN ex ON ex.doc_id = s1.doc_id
    LEFT JOIN nd ON nd.doc_id = s1.doc_id
    LEFT JOIN cont ct ON ct.doc_id = s1.doc_id
    LEFT JOIN sem sm ON sm.ci = s1.doc_id
    LEFT JOIN ob ON ob.doc_id = s1.doc_id
    ORDER BY s1.doc_id
    """


@query("q241_semantic_streaming_curation", oracle=_semantic_curation_oracle())
def q241_semantic_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q234's incremental curation pipeline with the SEMANTIC
    decontamination stage live: documents arrive joined with their
    embeddings (vec_id shares the id space — q224's convention; the
    join is a left join, so an un-embedded doc flows through with the
    semantic stage a no-op for it), and each batch is probed against
    the PRE-BUILT eval-side sign-LSH standing index
    (streaming/curation_ingest.build_eval_semantic_index — expanded
    fan-out paid once, plain L keys per batch row, exact-cosine
    re-rank at DEFAULT_SEM_TAU). Verdict precedence gains
    'contaminated_semantic' between the n-gram stage and the budget
    cut, and a semantically flagged doc never consumes budget.

    Semantic flags are batch-INVARIANT (static eval index), so the
    oracle adds no arrival-order clause for them — it reuses q224/
    q240's _SEM_ORACLE_CTES election verbatim; the dup stages and the
    budget prefix keep q234's batch-granular semantics unchanged.

    Scale shape: q234's O(batch) loop plus, per batch, L hash keys per
    embedded row and one occupancy-bounded broadcast candidate join —
    the embedding modality finally probes standing state instead of
    re-deriving it (round-11 verdict "What's missing #1"). Scratch
    bounded and deleted before returning (q204/q234 policy)."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.streaming.curation_ingest import (
        build_eval_gram_set,
        build_eval_semantic_index,
        make_curation_ingest_batch_fn,
    )

    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        # float -> double promotion is exact; all cosine math then runs
        # in double in both engines (oracle casts ::DOUBLE[])
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    docs = d.join(e, d.doc_id == e.vec_id, "left").drop("vec_id")
    tmp = tempfile.mkdtemp(prefix="fmts-curation-ingest-q241-")
    try:
        eval_grams_path = f"{tmp}/eval_grams"
        sem_index_path = f"{tmp}/sem_index"
        build_eval_gram_set(d, eval_grams_path)
        build_eval_semantic_index(e, sem_index_path)
        ingest = make_curation_ingest_batch_fn(
            f"{tmp}/index",
            eval_grams_path,
            f"{tmp}/out",
            semantic_index_path=sem_index_path,
        )
        batch_ids = sorted(
            r[0]
            for r in d.select(
                F.expr(f"doc_id DIV {_ING_BATCH_W}").alias("b")
            ).distinct().collect()
        )
        for b in batch_ids:
            ingest(docs.filter(F.expr(f"doc_id DIV {_ING_BATCH_W}") == b), int(b))
        rows = (
            spark.read.schema("doc_id long, source string, n_toks long, reason string")
            .option("basePath", f"{tmp}/out")
            .parquet(*[f"{tmp}/out/ingest_batch={b}" for b in batch_ids])
            .withColumn(
                "ingest_batch", F.expr(f"doc_id DIV {_ING_BATCH_W}").cast("long")
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, source string, n_toks long, reason string, ingest_batch long",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q248 — streaming curation WITH the perceptual standing index (round 13)
# ---------------------------------------------------------------------------


_PH_ING_BATCHES = 3  # q247's arrival batching (doc_id % 3): the planted
# 5-groups straddle batches, so cross-batch perceptual dups exist by
# construction (DIV-100 batching would align every group inside one
# batch — 100 is a multiple of the group size — and the stage could
# never fire)


def _perceptual_curation_oracle() -> str:
    """q234's batch-granular replay extended with the PERCEPTUAL-DUP
    stage: quality passers' payloads are replayed byte-exactly (q225's
    engine-grid spelling), dHashed in SQL, and a doc is
    'perceptual_dup' when a STRICTLY EARLIER batch's quality passer
    sits within Hamming ham — the pure dense rule, no banding (q247's
    pigeonhole-completeness argument makes the engine's banded standing
    index provably equal to it). The text dup stages keep q234's
    b' < b semantics (over the % batching); a perceptually flagged doc
    never reaches the gram stage or the budget prefix."""
    from flink_mingo_tail_spark.operators.dedup import sql_lsh_band_keys
    from flink_mingo_tail_spark.operators.perceptual_index import DEFAULT_PH_HAM
    from flink_mingo_tail_spark.queries.dedup import (
        _PIPE_STOPS,
        _SQL_SIG,
        MINHASH_K,
    )
    from flink_mingo_tail_spark.queries.multimodal_udf import (
        _PH_SQL_PAYLOAD,
        sql_dhash,
    )
    from flink_mingo_tail_spark.streaming.curation_ingest import (
        DEFAULT_BUDGET,
        DEFAULT_EVAL_MOD,
        DEFAULT_ROWS_PER_BAND,
    )

    bands = sql_lsh_band_keys("sig", DEFAULT_ROWS_PER_BAND, MINHASH_K)
    return f"""
    WITH d AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(text, ' ') AS t,
               doc_id % {_PH_ING_BATCHES} AS b
        FROM documents
    ), s1 AS (
        SELECT *,
               CAST(len(t) AS BIGINT) AS n_toks,
               CASE WHEN doc_id % {DEFAULT_EVAL_MOD} = 0 THEN 'eval_holdout'
                    WHEN len(t) < 15 THEN 'too_short'
                    WHEN len(t) > 5000 THEN 'too_long'
                    WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) < 0.2
                      THEN 'repetitive'
                    WHEN lang = 'en'
                         AND len(list_intersect(list_distinct(t), {_PIPE_STOPS})) < 1
                      THEN 'no_stopwords'
                    END AS r1
        FROM d
    ), qp AS (
        SELECT * FROM s1 WHERE r1 IS NULL
    ), hashes AS (
        SELECT doc_id, b, md5(text) AS ch FROM qp
    ), ex AS (
        SELECT DISTINCT h.doc_id FROM hashes h
        JOIN hashes h2 ON h2.ch = h.ch AND h2.b < h.b
    ), sigs AS (
        SELECT doc_id, b, {_SQL_SIG} AS sig FROM qp
    ), banded AS (
        SELECT doc_id, b, unnest({bands}) AS band FROM sigs
    ), nd AS (
        SELECT DISTINCT x.doc_id FROM banded x
        JOIN banded y ON y.band = x.band AND y.b < x.b
    ), pm AS (
        -- quality passers' payload replay: the perceptual index's
        -- admission set (every passer carries a payload here)
        SELECT doc_id, b, {_PH_SQL_PAYLOAD} AS h FROM qp
    ), ph AS (
        {sql_dhash('pm', 'doc_id, b', out='fp')}
    ), pd AS (
        SELECT DISTINCT x.doc_id
        FROM ph x JOIN ph y ON y.b < x.b
        WHERE bit_count(xor(x.fp, y.fp)) <= {DEFAULT_PH_HAM}
    ), grams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM qp WHERE len(t) >= 4
    ), probeg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM d WHERE doc_id % {DEFAULT_EVAL_MOD} = 0 AND len(t) >= 4
    ), cont AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN probeg p ON gr.g = p.g
    ), gate AS (
        SELECT q.* FROM qp q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM ex)
          AND q.doc_id NOT IN (SELECT doc_id FROM nd)
          AND q.doc_id NOT IN (SELECT doc_id FROM pd)
          AND q.doc_id NOT IN (SELECT doc_id FROM cont)
    ), packed AS (
        SELECT doc_id,
               CAST(coalesce(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY b, n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM gate
    ), ob AS (
        SELECT doc_id FROM packed WHERE cum_before >= {DEFAULT_BUDGET}
    )
    SELECT s1.doc_id, s1.source, s1.n_toks, CAST(s1.b AS BIGINT) AS ingest_batch,
           coalesce(s1.r1,
                    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup' END,
                    CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END,
                    CASE WHEN pdj.doc_id IS NOT NULL THEN 'perceptual_dup' END,
                    CASE WHEN ct.doc_id IS NOT NULL THEN 'contaminated' END,
                    CASE WHEN ob.doc_id IS NOT NULL THEN 'over_budget' END,
                    'kept') AS reason
    FROM s1
    LEFT JOIN ex ON ex.doc_id = s1.doc_id
    LEFT JOIN nd ON nd.doc_id = s1.doc_id
    LEFT JOIN pd pdj ON pdj.doc_id = s1.doc_id
    LEFT JOIN cont ct ON ct.doc_id = s1.doc_id
    LEFT JOIN ob ON ob.doc_id = s1.doc_id
    ORDER BY s1.doc_id
    """


@query("q248_perceptual_streaming_curation", oracle=_perceptual_curation_oracle())
def q248_perceptual_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q234's incremental curation pipeline with the PERCEPTUAL-DUP
    stage live: documents arrive joined with their media payloads
    (synthesize_media_variants — the planted near-dup fixture q225/q247
    share) in q247's {_PH_ING_BATCHES} interleaved arrival batches
    (doc_id % {_PH_ING_BATCHES}, so planted groups straddle batches —
    see _PH_ING_BATCHES), and each batch's quality passers are dHashed
    buffer-level (mapInArrow — the blob column never leaves the Arrow
    hasher) and probed against the GROWING persisted band index
    (operators/perceptual_index) AS OF BATCH START; passers'
    fingerprints append after the classification commits. Verdict
    precedence gains 'perceptual_dup' directly after the text dup
    stages, and a perceptually flagged doc never consumes budget.

    The oracle replays the payload and the dHash bit-exactly but
    applies the pure earlier-batch Hamming rule with no banding —
    q247's independent-derivation argument (pigeonhole recall + exact
    popcount precision) extended to the composed pipeline; the text
    dup stages and budget prefix keep q234's batch-granular semantics.

    Scale shape: q234's O(batch) loop plus, per batch, n_bands band
    rows per passer equi-joined against the standing table with the
    batch side broadcast — the perceptual modality finally probes
    standing state instead of re-deriving candidates per batch
    (round-12 verdict "What's missing #1"). Scratch bounded and
    deleted before returning (q204/q234 policy)."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.multimodal import (
        synthesize_media_variants,
    )
    from flink_mingo_tail_spark.streaming.curation_ingest import (
        build_eval_gram_set,
        make_curation_ingest_batch_fn,
    )

    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    media = synthesize_media_variants(d).select(
        F.col("media_id").alias("doc_id"), "payload"
    )
    docs = d.join(media, "doc_id")
    tmp = tempfile.mkdtemp(prefix="fmts-curation-ingest-q248-")
    try:
        eval_grams_path = f"{tmp}/eval_grams"
        build_eval_gram_set(d, eval_grams_path)
        ingest = make_curation_ingest_batch_fn(
            f"{tmp}/index",
            eval_grams_path,
            f"{tmp}/out",
            perceptual_index_path=f"{tmp}/ph_index",
        )
        batch_ids = list(range(_PH_ING_BATCHES))
        for b in batch_ids:
            ingest(docs.filter(F.col("doc_id") % _PH_ING_BATCHES == b), b)
        rows = (
            spark.read.schema("doc_id long, source string, n_toks long, reason string")
            .option("basePath", f"{tmp}/out")
            .parquet(*[f"{tmp}/out/ingest_batch={b}" for b in batch_ids])
            .withColumn(
                "ingest_batch",
                F.pmod(F.col("doc_id"), F.lit(_PH_ING_BATCHES)).cast("long"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, source string, n_toks long, reason string, ingest_batch long",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q246 — the FULL streaming curation pipeline (every stage live)
# ---------------------------------------------------------------------------


def _full_curation_oracle() -> str:
    """q241's oracle plus the GROWING-index semantic-dup stage AND
    (round 13) the GROWING perceptual-dup stage: quality passers'
    embeddings index into per-batch sign-LSH buckets (plain keys — the
    standing index's expanded=False direction), each batch's probes fan
    Hamming-1 on its own side, and a doc is 'semantic_dup' when a
    STRICTLY EARLIER batch's quality passer sits within the q170/q242
    tau; passers' payloads replay byte-exactly and a doc is
    'perceptual_dup' when an earlier batch's passer sits within dHash
    Hamming ham (the pure dense rule — q247's pigeonhole argument).
    The sem (static eval) election and the planes CTE are the shared
    _SEM_ORACLE_CTES spelling; the dup stages keep q234's
    batch-granular b' < b semantics over q248's interleaved % batching
    (DIV batching aligns every planted payload group inside one batch
    and the perceptual stage could never fire)."""
    from flink_mingo_tail_spark.operators.dedup import sql_lsh_band_keys
    from flink_mingo_tail_spark.operators.perceptual_index import DEFAULT_PH_HAM
    from flink_mingo_tail_spark.operators.semantic_index import DEFAULT_SEM_DUP_TAU
    from flink_mingo_tail_spark.operators.similarity import SQL_COSINE
    from flink_mingo_tail_spark.queries.dedup import (
        _PIPE_STOPS,
        _SQL_SIG,
        MINHASH_K,
    )
    from flink_mingo_tail_spark.queries.multimodal_udf import (
        _PH_SQL_PAYLOAD,
        sql_dhash,
    )
    from flink_mingo_tail_spark.queries.similarity import (
        _LSH_N_BITS,
        _SEM_ORACLE_CTES,
    )
    from flink_mingo_tail_spark.streaming.curation_ingest import (
        DEFAULT_BUDGET,
        DEFAULT_EVAL_MOD,
        DEFAULT_ROWS_PER_BAND,
    )

    bands = sql_lsh_band_keys("sig", DEFAULT_ROWS_PER_BAND, MINHASH_K)
    return f"""
    WITH {_SEM_ORACLE_CTES},
    d AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(text, ' ') AS t,
               doc_id % {_PH_ING_BATCHES} AS b
        FROM documents
    ), s1 AS (
        SELECT *,
               CAST(len(t) AS BIGINT) AS n_toks,
               CASE WHEN doc_id % {DEFAULT_EVAL_MOD} = 0 THEN 'eval_holdout'
                    WHEN len(t) < 15 THEN 'too_short'
                    WHEN len(t) > 5000 THEN 'too_long'
                    WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) < 0.2
                      THEN 'repetitive'
                    WHEN lang = 'en'
                         AND len(list_intersect(list_distinct(t), {_PIPE_STOPS})) < 1
                      THEN 'no_stopwords'
                    END AS r1
        FROM d
    ), qp AS (
        SELECT * FROM s1 WHERE r1 IS NULL
    ), hashes AS (
        SELECT doc_id, b, md5(text) AS ch FROM qp
    ), ex AS (
        SELECT DISTINCT h.doc_id FROM hashes h
        JOIN hashes h2 ON h2.ch = h.ch AND h2.b < h.b
    ), sigs AS (
        SELECT doc_id, b, {_SQL_SIG} AS sig FROM qp
    ), banded AS (
        SELECT doc_id, b, unnest({bands}) AS band FROM sigs
    ), nd AS (
        SELECT DISTINCT x.doc_id FROM banded x
        JOIN banded y ON y.band = x.band AND y.b < x.b
    ), qe AS (
        -- quality passers' embeddings: the growing index's admission set
        SELECT q.doc_id, q.b, e.v FROM qp q JOIN e ON e.vec_id = q.doc_id
    ), qeb AS (
        SELECT qe.doc_id, qe.b, p.tbl,
               CAST(sum(CASE WHEN list_dot_product(qe.v, p.pl) > 0
                             THEN CAST(1 AS BIGINT) << p.bit ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM qe CROSS JOIN planes p
        GROUP BY qe.doc_id, qe.b, p.tbl
    ), qprobes AS (
        SELECT doc_id, b, tbl, bucket FROM qeb
        UNION ALL
        SELECT doc_id, b, tbl, xor(bucket, CAST(1 AS BIGINT) << j) AS bucket
        FROM qeb CROSS JOIN unnest(range(0, {_LSH_N_BITS})) AS t(j)
    ), sdcand AS (
        SELECT DISTINCT p.doc_id AS x, i.doc_id AS y
        FROM qprobes p JOIN qeb i
          ON i.tbl = p.tbl AND i.bucket = p.bucket AND i.b < p.b
    ), sd AS (
        SELECT DISTINCT c.x AS doc_id
        FROM sdcand c JOIN qe ex ON ex.doc_id = c.x
                      JOIN qe ey ON ey.doc_id = c.y
        WHERE round({SQL_COSINE.format(a="ex.v", b="ey.v")}, 6)
              >= CAST({DEFAULT_SEM_DUP_TAU} AS DOUBLE)
    ), pm AS (
        -- quality passers' payload replay (q248's perceptual admission)
        SELECT doc_id, b, {_PH_SQL_PAYLOAD} AS h FROM qp
    ), phf AS (
        {sql_dhash('pm', 'doc_id, b', out='fp')}
    ), pd AS (
        SELECT DISTINCT x.doc_id
        FROM phf x JOIN phf y ON y.b < x.b
        WHERE bit_count(xor(x.fp, y.fp)) <= {DEFAULT_PH_HAM}
    ), grams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM qp WHERE len(t) >= 4
    ), probeg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM d WHERE doc_id % {DEFAULT_EVAL_MOD} = 0 AND len(t) >= 4
    ), cont AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN probeg p ON gr.g = p.g
    ), gate AS (
        SELECT q.* FROM qp q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM ex)
          AND q.doc_id NOT IN (SELECT doc_id FROM nd)
          AND q.doc_id NOT IN (SELECT doc_id FROM pd)
          AND q.doc_id NOT IN (SELECT doc_id FROM sd)
          AND q.doc_id NOT IN (SELECT doc_id FROM cont)
          AND q.doc_id NOT IN (SELECT ci FROM sem)
    ), packed AS (
        SELECT doc_id,
               CAST(coalesce(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY b, n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM gate
    ), ob AS (
        SELECT doc_id FROM packed WHERE cum_before >= {DEFAULT_BUDGET}
    )
    SELECT s1.doc_id, s1.source, s1.n_toks, CAST(s1.b AS BIGINT) AS ingest_batch,
           coalesce(s1.r1,
                    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup' END,
                    CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END,
                    CASE WHEN pdj.doc_id IS NOT NULL THEN 'perceptual_dup' END,
                    CASE WHEN sdj.doc_id IS NOT NULL THEN 'semantic_dup' END,
                    CASE WHEN ct.doc_id IS NOT NULL THEN 'contaminated' END,
                    CASE WHEN sm.ci IS NOT NULL THEN 'contaminated_semantic' END,
                    CASE WHEN ob.doc_id IS NOT NULL THEN 'over_budget' END,
                    'kept') AS reason
    FROM s1
    LEFT JOIN ex ON ex.doc_id = s1.doc_id
    LEFT JOIN nd ON nd.doc_id = s1.doc_id
    LEFT JOIN pd pdj ON pdj.doc_id = s1.doc_id
    LEFT JOIN sd sdj ON sdj.doc_id = s1.doc_id
    LEFT JOIN cont ct ON ct.doc_id = s1.doc_id
    LEFT JOIN sem sm ON sm.ci = s1.doc_id
    LEFT JOIN ob ON ob.doc_id = s1.doc_id
    ORDER BY s1.doc_id
    """


@query("q246_full_curation_ingest", oracle=_full_curation_oracle())
def q246_full_curation_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE streaming curation pipeline — every stage the
    engine owns, live in one checkpointable foreachBatch body: quality
    gate, standing content-hash + MinHash-band dup probes, the GROWING
    perceptual dHash band index (q247/q248's direction, round 13), the
    GROWING sign-LSH semantic-dup index (q242's direction — probe as
    of batch start, append quality passers after commit), static
    4-gram AND semantic eval decontamination (q241's stage), and the
    cross-batch per-source budget cut. q234 proved the text spine,
    q241 the static semantic stage, q248 the perceptual stage; this
    row proves the full composition, reason precedence r1 → exact_dup
    → near_dup → perceptual_dup → semantic_dup → contaminated →
    contaminated_semantic → over_budget → kept, over q248's
    interleaved doc_id % {_PH_ING_BATCHES} arrival batches (planted
    payload groups must straddle batches or the perceptual stage is
    degenerate — see _PH_ING_BATCHES).

    The oracle replays all of it batch-granularly: text, perceptual
    and semantic dup stages join b' < b (arrival order), both
    decontamination elections are batch-invariant (static eval side —
    the shared _SEM_ORACLE_CTES spelling), and the budget prefix runs
    in (batch, quality) order. Per batch the engine does O(batch) hash
    keys, five membership/candidate joins against standing state
    (each with its bounded side broadcast), and three bounded appends
    — no stage re-reads the corpus. Scratch bounded + deleted (q204
    policy)."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.multimodal import (
        synthesize_media_variants,
    )
    from flink_mingo_tail_spark.streaming.curation_ingest import (
        build_eval_gram_set,
        build_eval_semantic_index,
        make_curation_ingest_batch_fn,
    )

    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    media = synthesize_media_variants(d).select(
        F.col("media_id").alias("doc_id"), "payload"
    )
    docs = d.join(e, d.doc_id == e.vec_id, "left").drop("vec_id").join(media, "doc_id")
    tmp = tempfile.mkdtemp(prefix="fmts-curation-ingest-q246-")
    try:
        eval_grams_path = f"{tmp}/eval_grams"
        sem_index_path = f"{tmp}/sem_index"
        build_eval_gram_set(d, eval_grams_path)
        build_eval_semantic_index(e, sem_index_path)
        ingest = make_curation_ingest_batch_fn(
            f"{tmp}/index",
            eval_grams_path,
            f"{tmp}/out",
            semantic_index_path=sem_index_path,
            semantic_dup_index_path=f"{tmp}/semdup_index",
            perceptual_index_path=f"{tmp}/ph_index",
        )
        batch_ids = list(range(_PH_ING_BATCHES))
        for b in batch_ids:
            ingest(docs.filter(F.col("doc_id") % _PH_ING_BATCHES == b), b)
        rows = (
            spark.read.schema("doc_id long, source string, n_toks long, reason string")
            .option("basePath", f"{tmp}/out")
            .parquet(*[f"{tmp}/out/ingest_batch={b}" for b in batch_ids])
            .withColumn(
                "ingest_batch",
                F.pmod(F.col("doc_id"), F.lit(_PH_ING_BATCHES)).cast("long"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, source string, n_toks long, reason string, ingest_batch long",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q260 — streaming curation WITH the standing span index (round 14)
# ---------------------------------------------------------------------------

_SPAN_DUP_FRAC = 0.5  # the boilerplate threshold (classify_batch default)


def _span_curation_oracle() -> str:
    """q234's batch-granular replay extended with the BOILERPLATE stage:
    window keys of quality passers, matched against STRICTLY EARLIER
    batches' passers (y.b < x.b — batch-vs-state granularity), islands-
    merged per doc (the q256/q259 shared spelling pattern), flagged when
    the merged mass reaches {_SPAN_DUP_FRAC} of the doc's tokens."""
    from flink_mingo_tail_spark.operators.dedup import (
        DEFAULT_SPAN_L,
        sql_lsh_band_keys,
    )
    from flink_mingo_tail_spark.queries.dedup import (
        _PIPE_STOPS,
        _SQL_SIG,
        _sql_span_islands,
        MINHASH_K,
    )
    from flink_mingo_tail_spark.streaming.curation_ingest import (
        DEFAULT_BUDGET,
        DEFAULT_EVAL_MOD,
        DEFAULT_ROWS_PER_BAND,
    )

    bands = sql_lsh_band_keys("sig", DEFAULT_ROWS_PER_BAND, MINHASH_K)
    L = DEFAULT_SPAN_L
    return f"""
    WITH d AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(text, ' ') AS t,
               doc_id // {_ING_BATCH_W} AS b
        FROM documents
    ), s1 AS (
        SELECT *,
               CAST(len(t) AS BIGINT) AS n_toks,
               CASE WHEN doc_id % {DEFAULT_EVAL_MOD} = 0 THEN 'eval_holdout'
                    WHEN len(t) < 15 THEN 'too_short'
                    WHEN len(t) > 5000 THEN 'too_long'
                    WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) < 0.2
                      THEN 'repetitive'
                    WHEN lang = 'en'
                         AND len(list_intersect(list_distinct(t), {_PIPE_STOPS})) < 1
                      THEN 'no_stopwords'
                    END AS r1
        FROM d
    ), qp AS (
        SELECT * FROM s1 WHERE r1 IS NULL
    ), hashes AS (
        SELECT doc_id, b, md5(text) AS ch FROM qp
    ), ex AS (
        SELECT DISTINCT h.doc_id FROM hashes h
        JOIN hashes h2 ON h2.ch = h.ch AND h2.b < h.b
    ), sigs AS (
        SELECT doc_id, b, {_SQL_SIG} AS sig FROM qp
    ), banded AS (
        SELECT doc_id, b, unnest({bands}) AS band FROM sigs
    ), nd AS (
        SELECT DISTINCT x.doc_id FROM banded x
        JOIN banded y ON y.band = x.band AND y.b < x.b
    ), swin AS (
        SELECT doc_id, b, i AS pos,
               md5(list_aggregate(t[i:i+{L}-1], 'string_agg', ' ')) AS h
        FROM qp, unnest(range(1, len(t) - {L} + 2)) AS u(i)
    ), smark AS (
        SELECT DISTINCT x.doc_id, x.pos FROM swin x
        JOIN swin y ON y.h = x.h AND y.b < x.b
    ), {_sql_span_islands('smark', out='sp')}, bp AS (
        SELECT q.doc_id FROM qp q JOIN sp ON sp.doc_id = q.doc_id
        WHERE sp.dup_tokens >= {_SPAN_DUP_FRAC} * q.n_toks
    ), grams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM qp WHERE len(t) >= 4
    ), probeg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM d WHERE doc_id % {DEFAULT_EVAL_MOD} = 0 AND len(t) >= 4
    ), cont AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN probeg p ON gr.g = p.g
    ), gate AS (
        SELECT q.* FROM qp q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM ex)
          AND q.doc_id NOT IN (SELECT doc_id FROM nd)
          AND q.doc_id NOT IN (SELECT doc_id FROM bp)
          AND q.doc_id NOT IN (SELECT doc_id FROM cont)
    ), packed AS (
        SELECT doc_id,
               CAST(coalesce(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY b, n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM gate
    ), ob AS (
        SELECT doc_id FROM packed WHERE cum_before >= {DEFAULT_BUDGET}
    )
    SELECT s1.doc_id, s1.source, s1.n_toks, CAST(s1.b AS BIGINT) AS ingest_batch,
           coalesce(s1.r1,
                    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup' END,
                    CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END,
                    CASE WHEN bp.doc_id IS NOT NULL THEN 'boilerplate' END,
                    CASE WHEN ct.doc_id IS NOT NULL THEN 'contaminated' END,
                    CASE WHEN ob.doc_id IS NOT NULL THEN 'over_budget' END,
                    'kept') AS reason
    FROM s1
    LEFT JOIN ex ON ex.doc_id = s1.doc_id
    LEFT JOIN nd ON nd.doc_id = s1.doc_id
    LEFT JOIN bp ON bp.doc_id = s1.doc_id
    LEFT JOIN cont ct ON ct.doc_id = s1.doc_id
    LEFT JOIN ob ON ob.doc_id = s1.doc_id
    ORDER BY s1.doc_id
    """


@query("q260_span_streaming_curation", oracle=_span_curation_oracle())
def q260_span_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q234's streaming curation ingest WITH the substring modality's
    stage live (round 14): a growing standing SPAN index
    (operators/dedup.build_span_index) rides the loop — every batch's
    quality passers probe it AS OF BATCH START and a passer whose
    standing-dup span mass reaches {_SPAN_DUP_FRAC} of its tokens is
    flagged 'boilerplate' (templated content that survives document
    and near dedup because its novel remainder keeps the signature
    distinct); passers' window keys append after the batch commits
    (membership-monotone, replay-idempotent). Runs streaming/
    curation_ingest's OWN foreachBatch body — the oracle replays the
    batch-granular semantics exactly (y.b < x.b window matches,
    islands merge, the {_SPAN_DUP_FRAC} threshold, and the budget
    prefix over the reduced gate).

    Stage order note: 'boilerplate' sits AFTER the text-dup stages
    (an exact/near dup is reported as such even if also span-covered)
    and BEFORE decontamination — mirroring classify_batch's reason
    precedence. Scale shape: per batch, O(batch-tokens) window keys
    semi-joined against the sharded standing key set + the bounded
    islands window; the index grows by appends, never re-scanned.
    Ref parity: SURVEY §2A A6/A7 standing-state discipline; no
    reference twin."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.streaming.curation_ingest import (
        build_eval_gram_set,
        make_curation_ingest_batch_fn,
    )

    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="fmts-span-ingest-q260-")
    try:
        eval_grams_path = f"{tmp}/eval_grams"
        build_eval_gram_set(d, eval_grams_path)
        ingest = make_curation_ingest_batch_fn(
            f"{tmp}/index",
            eval_grams_path,
            f"{tmp}/out",
            span_index_path=f"{tmp}/span_index",
            span_dup_frac=_SPAN_DUP_FRAC,
        )
        batch_ids = sorted(
            r[0]
            for r in d.select(
                F.expr(f"doc_id DIV {_ING_BATCH_W}").alias("b")
            ).distinct().collect()
        )
        for b in batch_ids:
            ingest(d.filter(F.expr(f"doc_id DIV {_ING_BATCH_W}") == b), int(b))
        rows = (
            spark.read.schema("doc_id long, source string, n_toks long, reason string")
            .option("basePath", f"{tmp}/out")
            .parquet(*[f"{tmp}/out/ingest_batch={b}" for b in batch_ids])
            .withColumn(
                "ingest_batch", F.expr(f"doc_id DIV {_ING_BATCH_W}").cast("long")
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, source string, n_toks long, reason string, ingest_batch long",
    ).orderBy("doc_id")
