"""Driver-contract lint: output schemas every declared query may emit.

The driver canonicalizes both result frames in pandas before hashing.
Types whose pandas export is engine-dependent (or unhashable) are banned
from query outputs:

* arrays/maps/structs — pandas object columns of ndarray/list/dict; the
  driver's ``sort_values`` canonicalizer crashes on them (round-1 q26b:
  "unhashable type: 'list'");
* DATE — exports as midnight-Timestamp from one engine and ``date``
  object from the other;
* DecimalType — exports as ``decimal.Decimal`` objects (round-1 q09:
  a bare ``100.0`` literal in Spark SQL is a decimal and poisoned the
  division's dtype).

Schema inspection is plan-only (no execution), so this covers all 90
queries in seconds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from flink_mingo_tail_spark.queries import load_registry

from .conftest import SF_SMOKE

REGISTRY = load_registry()

_BANNED = (T.ArrayType, T.MapType, T.StructType, T.DateType, T.DecimalType)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_output_schema_driver_safe(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    for field in df.schema.fields:
        assert not isinstance(field.dataType, _BANNED), (
            f"{name}.{field.name} is {field.dataType.simpleString()} — banned by the "
            f"driver contract (array/map/struct/date/decimal outputs break or "
            f"engine-skew the pandas canonicalizer); format/join/cast it instead"
        )


def test_registry_prefix_covers_unchecked_queries():
    """The driver checks a bounded prefix (50 entries in round 1); every
    query without a green round-1 CORRECTNESS row must sit inside it."""
    names = list(REGISTRY)
    from flink_mingo_tail_spark.queries import _NEEDS_DRIVER_ROW

    prefix = set(names[: len(_NEEDS_DRIVER_ROW)])
    missing = [n for n in _NEEDS_DRIVER_ROW if n not in prefix]
    assert not missing, f"front-loaded queries fell outside the driver prefix: {missing}"
