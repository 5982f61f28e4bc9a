"""operators/ranks: distributed exact row numbers / ntile equal the
single-partition window spelling on adversarial frames (negatives,
heavy ties, n not divisible by k, empty-ish buckets)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.ranks import distributed_ntile, global_row_number


def _frame(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(7)  # scramble physical order on purpose


def test_global_row_number_matches_window(spark):
    vals = [5, -3, 5, 0, 17, -3, -3, 64, 65, 63, 128, 5, 0, -64, -65, 2]
    df = _frame(spark, vals)
    got = global_row_number(df, F.col("v"), F.col("id"), width=64)
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id"))
    )
    a = {(r.id, r.rowno) for r in got.collect()}
    b = {(r.id, r.rn) for r in want.collect()}
    assert a == b


def test_distributed_ntile_matches_window_all_k(spark):
    vals = [5, -3, 5, 0, 17, -3, -3, 64, 65, 63, 128, 5, 0, -64, -65, 2, 9]
    df = _frame(spark, vals)
    for k in (2, 3, 4, 5, 7):
        got = distributed_ntile(df, F.col("v"), F.col("id"), k=k, out="t", width=16)
        want = df.withColumn("t", F.ntile(k).over(Window.orderBy("v", "id")))
        a = {(r.id, r.t) for r in got.collect()}
        b = {(r.id, r.t) for r in want.collect()}
        assert a == b, f"k={k}"


def test_descending_via_negation(spark):
    vals = [10, 20, 20, 30, 40, 40, 40, 50]
    df = _frame(spark, vals)
    got = distributed_ntile(df, -F.col("v"), F.col("id"), k=3, out="t", width=8)
    want = df.withColumn("t", F.ntile(3).over(Window.orderBy(F.col("v").desc(), "id")))
    assert {(r.id, r.t) for r in got.collect()} == {(r.id, r.t) for r in want.collect()}


def test_grouped_prefix_sum_matches_window(spark):
    # one row per (g, v) as the contract requires; negative values,
    # adjacent buckets, two measures in one pass
    rows = [
        ("a", -130, 3, 1), ("a", -65, 1, 0), ("a", -64, 2, 5),
        ("a", 0, 7, 2), ("a", 63, 1, 1), ("a", 64, 4, 0),
        ("a", 200, 2, 9), ("b", -1, 5, 5), ("b", 0, 1, 1),
        ("b", 1, 2, 0), ("c", 42, 3, 3),
    ]
    df = spark.createDataFrame(rows, "g string, v long, m1 long, m2 long").repartition(5)
    from flink_mingo_tail_spark.operators.ranks import grouped_prefix_sum

    for inclusive in (True, False):
        got = grouped_prefix_sum(
            df,
            ["g"],
            F.col("v"),
            {"s1": F.col("m1"), "s2": F.col("m2")},
            width=64,
            inclusive=inclusive,
        )
        upper = 0 if inclusive else -1
        w = Window.partitionBy("g").orderBy("v").rowsBetween(
            Window.unboundedPreceding, upper
        )
        want = df.withColumn(
            "s1", F.coalesce(F.sum("m1").over(w), F.lit(0)).cast("long")
        ).withColumn("s2", F.coalesce(F.sum("m2").over(w), F.lit(0)).cast("long"))
        a = {(r.g, r.v, r.s1, r.s2) for r in got.collect()}
        b = {(r.g, r.v, r.s1, r.s2) for r in want.collect()}
        assert a == b, f"inclusive={inclusive}"
        assert set(got.columns) == set(df.columns) | {"s1", "s2"}
