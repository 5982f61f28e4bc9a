#!/usr/bin/env python
"""Re-prove named queries against their DuckDB oracles (the driver's
comparison, via tests/oracle_utils.run_compare) at one or more SF dirs.

Usage: SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 \
           python scripts/verify_queries.py q154_set_similarity_join ...
"""

from __future__ import annotations

import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

import duckdb

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.session import build_session
from flink_mingo_tail_spark.tables import TABLE_NAMES, table_path
from tests.oracle_utils import run_compare

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    names = sys.argv[1:]
    registry = load_registry()
    spark = build_session("fmts-verify")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = table_path(SF, name)
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
            )
    failed = []
    for name in names:
        qd = registry[name]
        if qd.oracle is None:
            print(f"{name}: NO ORACLE (rows-only)")
            df = qd.fn(spark, SF)
            assert df.count() >= 0
            continue
        try:
            run_compare(spark, con, qd, SF)
            print(f"{name}: OK @ {SF}", flush=True)
        except AssertionError as exc:
            failed.append(name)
            print(f"{name}: FAIL @ {SF}\n{exc}", flush=True)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
