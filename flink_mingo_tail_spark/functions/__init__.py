"""Scalar/aggregate expression helpers (all JVM-side built-ins)."""

from flink_mingo_tail_spark.functions.deterministic import davg, dsum, dval

__all__ = ["dsum", "davg", "dval"]
