#!/usr/bin/env python
"""Time individual headline queries in isolation (bench methodology:
warm-up at sf0.001, then min-of-N at $SPARK_GRAFT_SF_DIR with the same
collect()/noop action bench.py uses). For optimization-round A/B runs.

Usage: python scripts/time_query.py q154b_set_similarity_tau07 [q... ] [--n 3]
"""

from __future__ import annotations

import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    import bench

    registry = load_registry()
    spark = build_session("fmts-time-query")
    for name in args:
        qd = registry[name]
        bench.run_action(name, qd.fn(spark, WARMUP_SF_DIR))  # warm-up
        best = float("inf")
        samples = []
        for _ in range(n):
            start = time.perf_counter()
            bench.run_action(name, qd.fn(spark, SF_DIR))
            el = time.perf_counter() - start
            samples.append(round(el, 3))
            best = min(best, el)
        print(f"{name}: min={best:.3f}  samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
