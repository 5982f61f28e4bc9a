"""Accuracy gates for the sketch aggregates that (by design) have no
DuckDB oracle: approx_count_distinct and percentile_approx."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_ORACLE

REGISTRY = load_registry()


def test_approx_count_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in REGISTRY["q26_approx_count_distinct"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, est in approx.items():
        rel_err = abs(est - exact[k]) / max(exact[k], 1)
        assert rel_err <= 0.05, f"{k}: approx {est} vs exact {exact[k]} (err {rel_err:.3f})"


def test_percentile_approx_close_to_exact(spark):
    approx = {
        r.l_returnflag: r.p50_approx
        for r in REGISTRY["q26b_approx_percentile"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        r.l_returnflag: r.p50
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", 0.5).alias("p50"))
        .collect()
    }
    for k, est in approx.items():
        rel_err = abs(est - exact[k]) / exact[k]
        assert rel_err <= 0.02, f"{k}: approx p50 {est} vs exact {exact[k]}"


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
