"""File-level zone maps and data-skipping estimation.

The scan-pruning side of the write-layout story: q112 proves the Morton
code clusters (custkey, day) rectangles and `bucketing.write_sorted`
lays files out by a sort key — this module measures what that layout
actually BUYS a predicate: the fraction of files a min/max footer check
can skip without opening them. It reads only Spark's `_metadata`
hidden column plus the pruned stat columns, so building a zone map for
a table costs one narrow scan (at 100 TB you would persist it as a
table-of-files and maintain it incrementally on append — it is exactly
the file-statistics slice of an Iceberg/Delta manifest, computed with
plain DataFrame ops).

`morton_sql` lives here (moved from queries/layout.py) so the write
path, the q112 profile, and the skip measurement share one bit
interleave; queries/layout.py re-imports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def morton_sql(x_expr: str, y_expr: str) -> str:
    """Interleave the low 16 bits of two BIGINT expressions into a Morton
    code, using only `&`, `|`, `*` so the SAME text evaluates identically
    as a Spark SQL expression and as DuckDB oracle SQL."""

    def spread(e: str) -> str:
        s = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in ((256, 16711935), (16, 252645135), (4, 858993459), (2, 1431655765)):
            s = f"(({s} | ({s} * {shift})) & {mask})"
        return s

    return f"({spread(x_expr)} | ({spread(y_expr)} * 2))"


def zone_map(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file (min, max, count) statistics for ``cols`` — one row per
    parquet file under ``path``. One narrow scan: only the stat columns
    plus the `_metadata.file_path` hidden column leave the reader."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def skip_stats(zmap: DataFrame, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(total_files, skippable_files) for the predicate ``col BETWEEN lo
    AND hi``: a file is skippable iff its [min, max] range misses
    [lo, hi] entirely — the same decision a parquet footer check (or a
    manifest-level prune) makes before opening the file."""
    marked = zmap.select(
        F.when((F.col(f"{col}_max") < lo) | (F.col(f"{col}_min") > hi), 1)
        .otherwise(0)
        .alias("skip")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("skip").alias("s"))
    row = marked.first()
    return int(row["n"]), int(row["s"])
