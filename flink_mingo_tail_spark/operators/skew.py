"""Skew mitigation (SURVEY.md §4.2 / pyspark guide "Partitioning &
shuffle"): salting rewrites for hot keys.

AQE's skew-join splitting handles most cases automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py); these manual
rewrites cover the two places AQE cannot help:

* **skewed aggregation** — one giant group still lands on one reducer.
  ``salted_agg`` splits every group into `n_salts` sub-groups (random
  salt is fine for associative aggregates), partially aggregates, then
  re-aggregates without the salt. Shuffle 1 spreads the hot key over
  n_salts reducers; shuffle 2 moves only #groups × n_salts rows.
* **skewed broadcast-side join** — ``replicate_small_side`` explodes the
  small side n_salts× with a salt column while the big side picks a
  random salt, turning one hot partition into n_salts even ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pin_width(df: DataFrame, *keys: str, factor: int = 2, num_partitions: int | None = None) -> DataFrame:
    """Pin a compute-bound-but-byte-small stage at full cluster width.

    AQE coalesces shuffle partitions by BYTES, so a stage whose rows
    are tiny but whose per-row work is heavy (set-intersection
    verification, vectorized scoring) gets squeezed onto a handful of
    tasks and serializes — q154's verify stage measured 38.5 s on 3
    post-coalesce tasks vs ~6 s at full width (SCALE.md). A
    USER-SPECIFIED repartition is exempt from AQE partition coalescing,
    so an explicit key repartition pins every stage that consumes it at
    the requested width. The default ``defaultParallelism * factor``
    scales with the cluster, never with the data — the same code is
    right on local[32] and on 1000 executors.

    Shows up in the plan as ``REPARTITION_BY_NUM`` (asserted by
    tests/test_plans.py), which AQE's coalesce rule skips.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n, *keys)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salt.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` combine the
    partials per keys. The caller picks decomposable pairs, e.g.
    partial ``sum(x) AS s`` + final ``sum(s) AS total``, or partial
    ``count(*) AS c`` + final ``sum(c) AS n``.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def replicate_small_side(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Salted equi-join prep: big side gets a random salt, small side is
    replicated once per salt value; join on [key, __salt]."""
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_replicated = small.select("*", salts)
    return big_salted, small_replicated, [key, "__salt"]
