"""Small-file compaction operator: bin-packs a fragmented parquet
directory into ~target-size files without changing the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.compaction import compact_parquet_dir


def _fragmented(spark, path: str, n_files: int = 32, rows: int = 6400) -> None:
    df = spark.range(rows).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)


def test_compacts_to_target_size(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _fragmented(spark, src, n_files=32)
    stats = compact_parquet_dir(spark, src, dst, target_file_bytes=stats_target(spark, src, 4))
    assert stats["files_before"] == 32
    assert 1 <= stats["files_after"] <= 6  # ~4, allow rounding slack
    # content identical (order-free): same row count, same keyed checksum
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    chk = lambda d: d.agg(F.sum(F.col("id") * F.col("k")).alias("s")).collect()[0].s
    assert chk(a) == chk(b)


def stats_target(spark, src: str, want_files: int) -> int:
    """Target bytes that should yield roughly want_files output files."""
    import os
    from urllib.parse import urlparse

    paths = [urlparse(p).path for p in spark.read.parquet(src).inputFiles()]
    total = sum(os.path.getsize(p) for p in paths)
    return max(1, total // want_files)


def test_coalesce_mode_avoids_shuffle_but_merges(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _fragmented(spark, src, n_files=16)
    stats = compact_parquet_dir(
        spark, src, dst, target_file_bytes=stats_target(spark, src, 2), use_coalesce=True
    )
    assert stats["files_after"] <= 3
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()


def test_single_file_noop_shape(spark, tmp_path):
    """A directory already at-or-under target compacts to one file."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _fragmented(spark, src, n_files=3, rows=100)
    stats = compact_parquet_dir(spark, src, dst, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
