"""Misra-Gries two-pass heavy hitters: guarantees and bounds."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.heavyhitters import (
    _mg_absorb,
    exact_heavy_hitters,
    mg_partition_summaries,
)


def _mk_items(spark, counts: dict, partitions: int = 8):
    rows = [(item,) for item, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "item string").repartition(partitions)


def test_mg_absorb_respects_capacity_and_lower_bound():
    counts: dict = {}
    # 100 a's, 50 b's, then 60 distinct singletons through capacity 4
    _mg_absorb(counts, pd.Series({"a": 100, "b": 50}), capacity=4)
    _mg_absorb(counts, pd.Series({f"x{i}": 1 for i in range(60)}), capacity=4)
    assert len(counts) <= 4
    # summary counts are lower bounds of true counts
    assert counts.get("a", 0) <= 100 and counts.get("b", 0) <= 50
    # the dominant item survives the decrement storm
    assert "a" in counts


def test_partition_summaries_bounded_per_partition(spark):
    items = _mk_items(spark, {f"t{i}": 3 for i in range(200)}, partitions=4)
    out = mg_partition_summaries(items, "item", capacity=16)
    per_part = (
        out.withColumn("pid", F.spark_partition_id()).groupBy("pid").count().collect()
    )
    assert all(r["count"] <= 16 for r in per_part)


def test_exact_heavy_hitters_matches_naive_groupby(spark):
    # skewed domain: two heavy items over a 300-item tail
    counts = {"hot1": 400, "hot2": 250}
    counts.update({f"cold{i}": 2 for i in range(300)})
    items = _mk_items(spark, counts)
    n = sum(counts.values())
    k = 10  # threshold n/k = 125
    got = {
        r["item"]: r["cnt"]
        for r in exact_heavy_hitters(items, "item", k=k, capacity=64).collect()
    }
    want = {
        r["item"]: r["count"]
        for r in items.groupBy("item").count().filter(F.col("count") * k >= n).collect()
    }
    assert got == want == {"hot1": 400, "hot2": 250}


def test_capacity_below_k_is_rejected(spark):
    items = _mk_items(spark, {"a": 1})
    with pytest.raises(ValueError, match="superset"):
        exact_heavy_hitters(items, "item", k=100, capacity=50)


def test_output_carries_exact_total(spark):
    counts = {"a": 90, "b": 10}
    items = _mk_items(spark, counts, partitions=2)
    rows = exact_heavy_hitters(items, "item", k=2, capacity=4).collect()
    assert [(r["item"], r["cnt"], r["n_total"]) for r in rows] == [("a", 90, 100)]
