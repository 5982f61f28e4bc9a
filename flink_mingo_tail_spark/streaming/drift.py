"""Streaming distribution-drift monitor.

The ingest-side alarm a 100 TB training-data pipeline runs on every
feed: per event-time window, compare the arriving value distribution
against a (static, broadcast) reference histogram and emit a chi-square
drift statistic plus a boolean flag. The batch twin with a DuckDB
oracle is q189_drift_windows (queries/streaming_batch.py) — the same
term/sum expression tree — so the arithmetic is oracle-proven there
while this module is proven behaviorally (tests/test_drift.py: the
matching phase stays quiet, the shifted phase trips the flag, windows
finalize exactly once under watermark eviction).

Topology: ONE stateful operator (the watermarked tumbling-window
(window, bucket) count, append mode — each window's histogram emits
exactly once, finalized, at watermark expiry), then a stateless
foreachBatch reduction over the emitted histogram rows: broadcast-join
the reference, micro-round each chi-square term to int64 BEFORE the
per-window sum (the q163 scaled-term idiom, replay-deterministic), sum,
flag. State is bounded by |buckets| per open window; the reference is a
bounded static frame re-broadcast per micro-batch (the stream-static
enrichment pattern).

Reference parity: the reference engine has no analytics surface
(SURVEY.md §2A note); this extends the streaming family the same way
the quorum/dedup operators do.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_histogram(
    df: DataFrame, value_col: str = "value", bucket_width: int = 1000
) -> DataFrame:
    """Bucket histogram of a static frame: one row per bucket with the
    grand total replicated (bucket, ref_n, big_n) — bounded by the
    value domain / bucket_width, broadcastable."""
    b = df.select(
        F.expr(
            f"CAST(round({value_col} * 100) AS BIGINT) div {bucket_width}"
        ).alias("bucket")
    )
    h = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("ref_n"))
    tot = h.agg(F.sum("ref_n").cast("long").alias("big_n"))
    return h.crossJoin(F.broadcast(tot))


def windowed_bucket_counts(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    bucket_width: int = 1000,
) -> DataFrame:
    """The stateful half: watermarked tumbling-window histogram counts.
    Append mode emits each (window, bucket) row once, finalized."""
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.expr(
                f"CAST(round({value_col} * 100) AS BIGINT) div {bucket_width}"
            ).alias("bucket"),
        )
        .groupBy(F.window(ts_col, window).alias("w"), "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
        .select(F.col("w.start").alias("window_start"), "bucket", "obs")
    )


def chi2_drift(
    bucket_counts: DataFrame, reference: DataFrame, threshold_micro: int
) -> DataFrame:
    """The stateless half: per-window chi-square vs the reference, on a
    (window_start, bucket, obs) frame. Expected counts are floored at
    0.5 (the practical chi-square floor), so a bucket the reference
    never saw scores obs^2/0.5 — loud, never a division by zero; q189's
    oracle needs no floor because its reference IS the corpus. Terms
    are micro-rounded to int64 before the per-window sum."""
    e = "greatest(CAST(n_w AS DOUBLE) * ref_n / big_n, 0.5)"
    wn = bucket_counts.groupBy("window_start").agg(
        F.sum("obs").cast("long").alias("n_w")
    )
    terms = (
        bucket_counts.join(F.broadcast(reference), "bucket", "left")
        .withColumn("ref_n", F.coalesce(F.col("ref_n"), F.lit(0)))
        .withColumn("big_n", F.coalesce(F.col("big_n"), F.lit(1)))
        .join(F.broadcast(wn), "window_start")
        .select(
            "window_start",
            "n_w",
            F.expr(
                f"CAST(round((obs - {e}) * (obs - {e}) / {e} * 1000000.0)"
                " AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    return (
        terms.groupBy("window_start", "n_w")
        .agg(F.sum("term_micro").cast("long").alias("chi2_micro"))
        .select(
            "window_start",
            F.col("n_w").alias("n"),
            "chi2_micro",
            (F.col("chi2_micro") > F.lit(int(threshold_micro))).alias("drifted"),
        )
    )


def start_drift_monitor(
    stream: DataFrame,
    reference: DataFrame,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    bucket_width: int = 1000,
    threshold_micro: int = 50_000_000,
):
    """Wire the two halves: append-mode windowed counts -> foreachBatch
    chi-square reduction -> ``on_batch(drift_rows_df, batch_id)``. The
    foreachBatch frame holds only CLOSED windows' histogram rows, so
    each window's drift verdict is computed exactly once; a restart
    replays unprocessed emissions from the checkpoint (foreachBatch's
    at-least-once, idempotent for a keyed sink on window_start)."""
    counts = windowed_bucket_counts(
        stream,
        ts_col=ts_col,
        value_col=value_col,
        window=window,
        watermark=watermark,
        bucket_width=bucket_width,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_batch(chi2_drift(batch_df, reference, threshold_micro), batch_id)

    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_process)
        .start()
    )
