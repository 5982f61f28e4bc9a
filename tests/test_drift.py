"""streaming/drift: the windowed drift monitor trips on a shifted
distribution, stays quiet on a matching one, and finalizes each window
exactly once under watermark eviction. The chi-square arithmetic itself
is oracle-proven by the batch twin q189_drift_windows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_mingo_tail_spark.streaming.drift import (
    chi2_drift,
    reference_histogram,
    start_drift_monitor,
)


def _rows(hour: int, values: list[float]):
    return [
        (datetime(2026, 1, 1, hour, i % 60, i // 60), float(v))
        for i, v in enumerate(values)
    ]


# reference: values uniform over buckets 0..3 (value = bucket * 10 + k)
_REF_VALUES = [b * 10.0 + k for b in range(4) for k in range(5)]
# matching phase: same shape; shifted phase: mass concentrated on a
# bucket the reference barely has, plus a NOVEL bucket (90s)
_MATCH = _REF_VALUES
_SHIFT = [30.0 + (i % 3) for i in range(15)] + [90.0 + (i % 3) for i in range(5)]


def test_chi2_drift_batch_semantics(spark):
    ref = reference_histogram(
        spark.createDataFrame([(v,) for v in _REF_VALUES], "value double")
    )
    counts = spark.createDataFrame(
        _rows(1, _MATCH) + _rows(2, _SHIFT), "ts timestamp, value double"
    ).select(
        F.date_trunc("hour", "ts").alias("window_start"),
        F.expr("CAST(round(value * 100) AS BIGINT) div 1000").alias("bucket"),
    ).groupBy("window_start", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    out = {
        r.window_start.hour: r
        for r in chi2_drift(counts, ref, threshold_micro=5_000_000).collect()
    }
    assert not out[1].drifted, out[1]
    assert out[2].drifted, out[2]
    # the matching window's statistic is exactly 0 (identical shares)
    assert out[1].chi2_micro == 0
    assert out[2].chi2_micro > out[1].chi2_micro


def test_drift_monitor_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    ck = str(tmp_path / "ck")

    def feed(rows):
        spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
            1
        ).write.mode("append").parquet(src)

    feed(_rows(1, _MATCH))
    ref = reference_histogram(
        spark.createDataFrame([(v,) for v in _REF_VALUES], "value double")
    )
    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)

    seen: dict[int, tuple[int, bool]] = {}
    emissions: list[int] = []

    def on_batch(df, batch_id):
        for r in df.collect():
            h = r.window_start.hour
            emissions.append(h)
            seen[h] = (r.chi2_micro, bool(r.drifted))

    q = start_drift_monitor(
        stream,
        ref,
        ck,
        on_batch,
        watermark="30 minutes",
        threshold_micro=5_000_000,
    )
    try:
        q.processAllAvailable()
        feed(_rows(2, _SHIFT))  # advances watermark past hour-1
        q.processAllAvailable()
        feed(_rows(4, _MATCH[:3]))  # advances watermark past hour-2
        q.processAllAvailable()
    finally:
        q.stop()

    assert seen[1] == (0, False), seen  # matching window: exact zero, quiet
    assert seen[2][1] is True, seen  # shifted window: flagged
    # append mode: each closed window emitted exactly once
    assert sorted(emissions) == [1, 2], emissions


def test_drift_monitor_resumes_from_checkpoint(spark, tmp_path):
    """Kill the monitor between phases and restart on the same
    checkpoint: the windowed state and watermark survive, closed
    windows are not re-finalized, and the pending window still closes
    with the right verdict after the restart."""
    src = str(tmp_path / "feed")
    ck = str(tmp_path / "ck")

    def feed(rows):
        spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
            1
        ).write.mode("append").parquet(src)

    ref = reference_histogram(
        spark.createDataFrame([(v,) for v in _REF_VALUES], "value double")
    )

    seen: list[tuple[int, bool]] = []

    def on_batch(df, batch_id):
        seen.extend((r.window_start.hour, bool(r.drifted)) for r in df.collect())

    def start():
        stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
        return start_drift_monitor(
            stream, ref, ck, on_batch, watermark="30 minutes", threshold_micro=5_000_000
        )

    feed(_rows(1, _MATCH))
    q = start()
    try:
        q.processAllAvailable()
        # phase 2 plus a minute-45 straggler: watermark = 02:45 - 30min
        # = 02:15 > hour-1 end, so hour-1 finalizes before the kill
        feed(_rows(2, _SHIFT) + [(datetime(2026, 1, 1, 2, 45), 91.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen == [(1, False)], seen

    # restart on the same checkpoint; only hour-2 may still finalize
    q = start()
    try:
        q.processAllAvailable()  # replays nothing new
        feed(_rows(4, _MATCH[:3]))  # watermark passes hour-2
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen == [(1, False), (2, True)], seen
