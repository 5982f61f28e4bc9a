"""Declared query set (SURVEY.md §2B/§2C).

Every implemented operator is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
equivalent ANSI-SQL oracle string run by DuckDB on the same Parquet
tables. The driver hash-compares the two at sf=0.01; tests do the same
locally at sf=0.001 and sf=0.01.

Conventions that make the hash comparison meaningful:

* every computed column is aliased identically in Spark and SQL;
* double aggregates go through ``functions.deterministic`` so the values
  are bit-identical across engines;
* every query output has a deterministic global order *content-wise*
  (the driver sorts before hashing, but ties broken by explicit keys
  keep LIMIT/top-k results stable);
* queries never mutate state and never collect to the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None):
    """Register a declared query. ``oracle=None`` marks a non-SQL-expressible op."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


_MODULES = (
    "relational",
    "windows",
    "setops",
    "scalar_funcs",
    "cdc",
    "dedup",
    "similarity",
    "text",
    "streaming_batch",
    "multimodal_udf",
)


def load_registry() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"flink_mingo_tail_spark.queries.{mod}")
    return REGISTRY
