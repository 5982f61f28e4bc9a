"""Bucketed co-located join: result parity with the shuffled join AND an
Exchange-free physical plan (the write-once/join-many discipline for
fact-fact joins at scale)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.bucketing import co_located_join, write_bucketed
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "orderkey"), "b_orders", "orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"), "b_lineitem", "orderkey", 8
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _agg(df):
    return (
        df.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .orderBy("o_orderpriority")
    )


def test_bucketed_join_no_exchange_and_same_result(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the sort-merge path (broadcast would hide the bucketing story)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, left, right, "orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"

        bucketed_result = _agg(joined).collect()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed("o_orderkey", "orderkey")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    plain_result = _agg(orders.join(lineitem, "orderkey")).collect()
    assert bucketed_result == plain_result


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Day-partitioned layout: a day filter must become a PartitionFilter
    (directory pruning — zero I/O for other days), never a post-scan
    row filter, and results must match the unpartitioned read."""
    from flink_mingo_tail_spark.operators.bucketing import write_partitioned

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(events, path, ["day"])

    some_day = events.select("day").orderBy("day").first().day
    pruned = spark.read.parquet(path).filter(F.col("day") == F.lit(some_day))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the day predicate lands in PartitionFilters, not PushedFilters
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "day" in pf_line
    # only the matching day's directory is read
    n_expected = events.filter(F.col("day") == F.lit(some_day)).count()
    assert pruned.count() == n_expected
    assert pruned.select(F.countDistinct("day")).first()[0] == 1


def test_sorted_write_narrows_row_group_stats(spark, tmp_path):
    """write_sorted must produce parquet whose per-row-group min/max
    ranges are narrow and disjoint-ish — the footer statistics that
    make predicate-driven row-group skipping possible. Compared
    against an unsorted shuffle write of the same rows, where every
    row group spans ~the whole domain."""
    import glob

    import pyarrow.parquet as pq

    from flink_mingo_tail_spark.operators.bucketing import write_sorted
    from flink_mingo_tail_spark.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    sorted_path = str(tmp_path / "sorted")
    unsorted_path = str(tmp_path / "unsorted")
    write_sorted(li, sorted_path, ["l_extendedprice"], n_files=4)
    li.repartition(4).write.mode("overwrite").parquet(unsorted_path)

    def spans(path):
        covered = 0.0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "l_extendedprice"
                )
                st = col.statistics
                covered += st.max - st.min
        import duckdb

        lohi = duckdb.sql(
            f"SELECT max(l_extendedprice) - min(l_extendedprice) FROM read_parquet('{path}/*.parquet')"
        ).fetchone()[0]
        return covered / lohi  # sum of per-row-group ranges, in domain units

    # sorted: ranges are disjoint, sum ~= 1 domain; unsorted: every row
    # group spans ~the whole domain, sum ~= #row_groups domains
    assert spans(sorted_path) < 1.5
    assert spans(unsorted_path) > 3.0
    # and the data is unchanged
    assert (
        spark.read.parquet(sorted_path).count()
        == spark.read.parquet(unsorted_path).count()
    )
