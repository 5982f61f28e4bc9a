"""Bucketed (co-located) joins — the zero-shuffle path for repeated
fact-fact joins (SURVEY.md §2B broadcast/bucketing row; pyspark guide
"Partitioning & shuffle").

At 100 TB, orders⋈lineitem on orderkey shuffles both fact tables every
time it runs. Writing both sides bucketed (and sorted) by the join key
moves that shuffle to write time, once: every subsequent join reads
co-located buckets and sort-merge-joins with NO Exchange on either side.
This module wraps the write/read discipline; tests/test_bucketing.py
asserts the Exchange-free plan and result equality with the shuffled
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Persist as a bucketed, per-bucket-sorted managed table. n_buckets
    should match downstream parallelism (cluster: ~2-4x executor count;
    both join sides MUST use the same n_buckets to co-locate)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def co_located_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans a sort-merge join whose children are the
    bucketed scans directly — no Exchange, no sort (buckets pre-sorted)."""
    return spark.table(left_table).join(spark.table(right_table), key)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Persist hive-style partitioned parquet (one directory level per
    partition column). The read-side payoff is PARTITION PRUNING: a
    filter on a partition column prunes entire directories at planning
    time (`PartitionFilters` in the scan, zero I/O for pruned values) —
    at 100 TB, the difference between scanning a day and scanning a
    decade. Partition columns must be low-cardinality (day, source,
    region): every value is a directory, and millions of tiny
    partitions destroy scan parallelism; high-cardinality layout wants
    bucketing (above) or Z-order (operators/../queries/layout.py)
    instead."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_sorted(df: DataFrame, path: str, sort_cols: list[str], n_files: int | None = None) -> None:
    """Persist parquet with rows SORTED WITHIN each output file.

    The read-side payoff is row-group data skipping: parquet stores
    min/max statistics per row group, and a range/point filter on the
    sort column lets the reader drop whole row groups whose [min, max]
    misses the predicate. On an unsorted layout every row group spans
    nearly the full value domain (random rows land everywhere), so no
    group can ever be skipped; sorting makes the per-group ranges
    narrow and disjoint — at 100 TB this is the difference between
    reading ~1/1000th of a table and all of it, with zero query-side
    changes (the skip happens inside the parquet reader under any
    engine). `repartitionByRange` first, so file-level ranges are ALSO
    disjoint and the planner's file pruning composes with the
    row-group skipping. tests/test_bucketing.py verifies the written
    footer statistics narrow accordingly."""
    out = df.repartitionByRange(n_files, *sort_cols) if n_files else df.repartitionByRange(*sort_cols)
    out.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)
