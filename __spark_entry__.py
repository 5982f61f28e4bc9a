"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``flink_mingo_tail_spark``: the engine's declared query
set (SURVEY.md §2B/§2C) is registered in
``flink_mingo_tail_spark.queries`` — one callable per implemented
operator plus (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from flink_mingo_tail_spark.queries import load_registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_registry()
    return registry["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {name: qd.oracle for name, qd in load_registry().items() if qd.oracle is not None}
