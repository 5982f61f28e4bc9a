"""Bit-exact cross-engine aggregate expressions.

Floating-point SUM is order-dependent; Spark sums per-partition then
merges while an oracle engine (DuckDB) sums sequentially, so raw
``sum(double)`` differs in the low bits and breaks value-hash
comparisons. The test data's numeric columns are fixed-point decimals
stored as doubles (prices/discounts/quantities have <= 2 fractional
digits), so every sum here can be made exact:

    sum(x)  ==  sum(round(x * 10^k) as long) / 10^k

The per-row product and round are IEEE-deterministic (identical in any
engine), long addition is associative, and the single final division is
again IEEE-deterministic. ``dsum``/``davg`` encode this pattern; every
hash-checked query uses them instead of raw double sums. At 100 TB scale
this also happens to be the *faster* plan: long sums avoid Kahan-style
compensation and stay inside whole-stage codegen.

The matching oracle-SQL spelling is::

    sum(CAST(round(x * 10^k) AS BIGINT)) / 10^k.0
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scaled_long(value: Column | str, scale: int) -> Column:
    col = F.col(value) if isinstance(value, str) else value
    return F.round(col * F.lit(float(10**scale)), 0).cast("long")


def dval(value: Column | str, scale: int = 2) -> Column:
    """Deterministic fixed-point normalization of a single double value."""
    return _scaled_long(value, scale) / F.lit(float(10**scale))


def dsum(value: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact, order-independent sum of a fixed-point double column.

    ``scale`` must cover the true number of fractional decimal digits of
    the summand (2 for raw prices, 4 for price*(1-disc), 6 for
    price*(1-disc)*(1+tax)).
    """
    return (F.sum(_scaled_long(value, scale)) / F.lit(float(10**scale))).alias(alias)


def davg(value: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact mean: scaled-long sum divided by count, single final division."""
    col = F.col(value) if isinstance(value, str) else value
    return (F.sum(_scaled_long(col, scale)) / (F.count(col) * F.lit(float(10**scale)))).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    """Oracle-SQL twin of :func:`dsum` (ANSI SQL, DuckDB-compatible)."""
    factor = 10**scale
    return f"sum(CAST(round(({expr}) * {factor}) AS BIGINT)) / {factor}.0 AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    """Oracle-SQL twin of :func:`davg`."""
    factor = 10**scale
    return f"sum(CAST(round(({expr}) * {factor}) AS BIGINT)) / (count({expr}) * {factor}.0) AS {alias}"
