"""Incremental zone-map maintenance: exactly-once per file across
restarts, stats identical to the batch recompute, replay-idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.zonemap import skip_stats, zone_map
from flink_mingo_tail_spark.streaming.zonemap_ingest import (
    make_zonemap_batch_fn,
    read_zone_map,
    start_zonemap_ingest,
)
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE

COLS = ["doc_id", "n_chars"]


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")


def _write_wave(spark, data_dir, lo, hi, n_files):
    (
        _docs(spark)
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("append")
        .parquet(data_dir)
    )


def _zm_sorted(df):
    return sorted(
        (r["file"], r["n_rows"], r["doc_id_min"], r["doc_id_max"], r["n_chars_min"], r["n_chars_max"])
        for r in df.collect()
    )


def test_incremental_map_matches_batch_recompute_across_waves(spark, tmp_path):
    data = str(tmp_path / "data")
    zmap = str(tmp_path / "zonemap")
    ckpt = str(tmp_path / "ckpt")
    schema = _docs(spark).schema

    _write_wave(spark, data, 0, 250, 4)
    q = start_zonemap_ingest(spark, data, zmap, ckpt, COLS, schema)
    q.awaitTermination(120)
    assert _zm_sorted(read_zone_map(spark, zmap)) == _zm_sorted(
        zone_map(spark, data, COLS)
    )

    # second landing wave: a restarted catch-up run maps ONLY new files
    _write_wave(spark, data, 250, 500, 4)
    q = start_zonemap_ingest(spark, data, zmap, ckpt, COLS, schema)
    q.awaitTermination(120)
    inc = read_zone_map(spark, zmap)
    assert _zm_sorted(inc) == _zm_sorted(zone_map(spark, data, COLS))
    assert inc.count() == 8

    # the maintained map is usable for skipping exactly like a batch one
    n, s = skip_stats(inc, "doc_id", 0, 60)
    assert n == 8 and s >= 5


def test_batch_fn_replay_is_idempotent(spark, tmp_path):
    data = str(tmp_path / "data")
    zmap = str(tmp_path / "zonemap")
    _write_wave(spark, data, 0, 250, 3)
    bdf = spark.read.parquet(data).select("*", "_metadata")
    fn = make_zonemap_batch_fn(zmap, COLS)
    fn(bdf, 0)
    first = _zm_sorted(read_zone_map(spark, zmap))
    fn(bdf, 0)  # crash-replay of the same batch id: must be a no-op
    assert _zm_sorted(read_zone_map(spark, zmap)) == first
    assert len(first) == 3


def test_multi_batch_catchup_with_max_files_per_trigger(spark, tmp_path):
    """A catch-up run throttled to 2 files per micro-batch still maps
    every file exactly once (AvailableNow drains the backlog across
    several batches in one run)."""
    data = str(tmp_path / "data")
    zmap = str(tmp_path / "zonemap")
    ckpt = str(tmp_path / "ckpt")
    schema = _docs(spark).schema
    _write_wave(spark, data, 0, 500, 6)
    q = start_zonemap_ingest(
        spark, data, zmap, ckpt, COLS, schema, max_files_per_trigger=2
    )
    q.awaitTermination(120)
    inc = read_zone_map(spark, zmap)
    assert inc.count() == 6
    assert _zm_sorted(inc) == _zm_sorted(zone_map(spark, data, COLS))
    # several batch directories, one per micro-batch
    import os
    batches = [d for d in os.listdir(zmap) if d.startswith("batch_id=")]
    assert len(batches) >= 3
