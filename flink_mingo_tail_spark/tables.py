"""Table catalog over the driver-generated Parquet test data.

Schemas documented in FIXTURES.md; the same loader is reused by queries,
tests and bench so that predicate pushdown / column pruning behavior is
uniform (plain ``spark.read.parquet`` — Catalyst handles pruning).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are fixed-size; supplier/part/customer grow with SF and
# must NOT be unconditionally broadcast at 100 TB).
BROADCAST_SAFE = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture generations have stored ``ts`` as either TIMESTAMP(NANOS)
    (which Spark's vectorized Parquet reader rejects) or plain
    timestamp[us]. Branch on the file's actual Arrow schema: for nanos,
    read the column as raw int64 (legacy conf) and truncate to
    microseconds with integer DIV — the same truncation DuckDB applies
    when narrowing ns → its native µs timestamps, so oracle comparisons
    agree exactly (integer DIV, not float division: ns values ~1.7e18
    exceed double's 2^53 integer range). For µs fixtures, pass through
    unchanged — re-applying the nanos path to a TIMESTAMP column is a
    type error (the round-2 regression)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    path = table_path(sf_dir, "events")
    # Spark-written tables are DIRECTORIES of part files (e.g. the
    # scale-probe corpus); driver fixtures are single files. Sniff the
    # schema from any one part file.
    sniff = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
        sniff = parts[0]
    ts_type = str(pq.read_schema(sniff).field("ts").type)
    if ts_type == "timestamp[ns]":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin UTC before the LTZ->NTZ cast so the loader contract (ts is
        # always TIMESTAMP_NTZ, like the us fixtures load natively) holds
        # even when the caller has not run prepare_session yet.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw = spark.read.parquet(path)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load the requested tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register temp views so SQL-form queries can run via spark.sql."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def spread(df: DataFrame) -> DataFrame:
    """Restore compute parallelism for expression-heavy work over a
    small-file corpus. The test corpora arrive as ONE parquet file, so a
    scan yields one partition and per-row-heavy operators (MinHash,
    SimHash, featurizers) serialize on a single core. The deliberate
    round-robin shuffle of the (small) input buys full-core execution
    of the expensive map stage.

    At production scale the same table is thousands of files, the scan
    already parallelizes, and forcing a corpus-wide shuffle capped at
    defaultParallelism would be a scale bug — so the repartition is
    GATED on the scan's file count: a source that already has at least
    defaultParallelism files is returned untouched. ``inputFiles()`` is
    a plan-metadata lookup (the file index is already materialized for
    the scan), unlike the retired ``df.rdd`` probe which forced a
    plan-to-RDD conversion and bypassed AQE stats."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass  # non-file source (rare for this helper): keep the shuffle
    return df.repartition(target)
