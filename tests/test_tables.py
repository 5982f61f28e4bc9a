"""Schema-pin tests for the driver-generated Parquet fixtures.

Round 2 shipped broken because the driver regenerated ``events.parquet``
with a different physical timestamp type (ns -> us) and the loader's
type-specific workaround turned into an AnalysisException in 31 tests at
once. These pins make fixture drift fail ONE clear test with a readable
message instead. They assert the *loaded* Spark dtypes — i.e. the
contract every query module depends on — not the raw file encoding,
which the loader is allowed to normalize (VERDICT r2 "Next round" #2).
"""

from __future__ import annotations

import os

import pytest

from flink_mingo_tail_spark.tables import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Expected (column, spark dtype) per table, as loaded at 2026-08-13 from
# the round-3 fixture generation. Dict form so a drifted column reports
# by name.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        # Loader contract: ts always lands as a (ntz) timestamp in
        # microsecond precision, whatever the file stores physically.
        "ts": "timestamp_ntz",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_schema_pin(spark, name):
    df = load_table(spark, SF_DIR, name)
    actual = dict(df.dtypes)
    expected = EXPECTED[name]
    assert actual == expected, (
        f"fixture drift in {name!r}: loaded dtypes {actual} != pinned {expected}. "
        "If the driver regenerated the fixtures, update the loader "
        "(flink_mingo_tail_spark/tables.py) to normalize back to the pinned "
        "contract — every query module depends on it."
    )


def test_events_loads_and_counts(spark):
    # The exact failure mode of round 2: events must at least load + count.
    df = load_table(spark, SF_DIR, "events")
    assert df.count() > 0


def test_events_loader_handles_both_timestamp_encodings(spark, tmp_path):
    """The loader must normalize BOTH fixture generations to the same
    contract: timestamp[ns] files (round-1 driver output; Spark's
    vectorized reader rejects them without the legacy conf) and
    timestamp[us] files (round-3 output). Guards the branch whose
    mismatch broke 31 tests in round 2 — in either direction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    micros = [1_700_000_000_000_000, 1_700_000_060_000_000]
    for unit, vals in (("us", micros), ("ns", [m * 1000 for m in micros])):
        d = str(tmp_path / unit)
        import os

        os.makedirs(d)
        table = pa.table({**base, "ts": pa.array(vals, pa.timestamp(unit))})
        pq.write_table(table, os.path.join(d, "events.parquet"))
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz", (unit, df.dtypes)
        got = sorted(r.ts for r in df.select("ts").collect())
        assert [int(t.timestamp() * 1_000_000) for t in got] == micros, (unit, got)
