"""Edge semantics of the time-series queries (q155/q156/q157)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import load_registry

REGISTRY = load_registry()

_US_DAY = 86_400_000_000


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "fixture")
    df.write.parquet(out + "/events.parquet")
    return out


def _ts(day: int, hour: int = 0) -> datetime:
    # day 0 = 1970-01-02 to keep every timestamp strictly positive
    us = (day + 1) * _US_DAY + hour * 3_600_000_000
    return datetime.utcfromtimestamp(us / 1_000_000)


def test_interpolate_midpoint_and_exact_hit(spark, tmp_path):
    rows = [
        # user 1: obs at day1 12:00 value 10.00 and day3 12:00 value 30.00
        #   -> grid day2 and day3 boundaries; day2 00:00 is 12h/48h along
        (1, _ts(1, 12), 1, "purchase", 10.0, "{}"),
        (2, _ts(3, 12), 1, "purchase", 30.0, "{}"),
        # user 2: a single observation exactly on a day boundary
        (3, _ts(5, 0), 2, "purchase", 7.5, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["day_idx"]): r["interp_micro"]
        for r in REGISTRY["q155_linear_interpolate"].fn(spark, sf_dir).collect()
    }
    # day2 boundary: 12h after first obs of a 48h gap -> 10 + 20*(12/48) = 15.00
    assert got[(1, 3)] == 15_000_000  # day_idx 3 == _ts(2,0)/day
    # day3 boundary: 36h along -> 25.00
    assert got[(1, 4)] == 25_000_000
    # user 2's grid day coincides with its only observation: exact value
    assert got[(2, 6)] == 7_500_000
    assert set(got) == {(1, 3), (1, 4), (2, 6)}


def test_twap_weights_by_duration_not_count(spark, tmp_path):
    rows = [
        # value 100.00 held for 3h, then 1.00 held for 1h, then final obs
        (1, _ts(1, 0), 1, "view", 100.0, "{}"),
        (2, _ts(1, 3), 1, "view", 1.0, "{}"),
        (3, _ts(1, 4), 1, "view", 0.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    [r] = REGISTRY["q156_time_weighted_avg"].fn(spark, sf_dir).collect()
    # twap = (100*3 + 1*1)/4 = 75.25 ; naive avg would be 33.67
    assert r["twap_micro"] == 75_250_000
    assert r["den"] == 4 * 3_600_000_000


def test_zscore_flags_only_the_outlier(spark, tmp_path):
    rows = [
        (i, _ts(1, i), 1, "view", 10.0 + (i % 2) * 0.02, "{}") for i in range(10)
    ]
    rows.append((99, _ts(2, 0), 1, "view", 500.0, "{}"))  # the spike
    sf_dir = _write_events(spark, tmp_path, rows)
    out = REGISTRY["q157_rolling_zscore"].fn(spark, sf_dir).collect()
    assert [r["event_id"] for r in out] == [99]
    # n >= 8 gate: the first 8 events have too little history to flag
    assert all(r["n"] >= 8 for r in out)


def test_zscore_zero_variance_history_flags_any_change(spark, tmp_path):
    rows = [(i, _ts(1, i), 1, "view", 5.0, "{}") for i in range(9)]
    rows.append((50, _ts(1, 10), 1, "view", 5.01, "{}"))
    sf_dir = _write_events(spark, tmp_path, rows)
    out = REGISTRY["q157_rolling_zscore"].fn(spark, sf_dir).collect()
    # sigma = 0 and x != mu: (n*x - s1)^2 > 0 = rhs -> flagged
    assert [r["event_id"] for r in out] == [50]
