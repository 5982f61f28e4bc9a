#!/usr/bin/env python
"""Capture .explain('formatted') for headline (or named) queries into
plans/r15/<query>_<tag>.txt (tag = before/after). Optimization-round
evidence artifact; the judge diffs these against plan claims in
OPTIMIZATION_r15.md.

Usage: python scripts/capture_plans_r15.py <tag> [query ...]
  With explicit query names, non-headline registry queries are captured
  too (round 15 touches operators behind several probe-only queries).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR", os.path.join(REPO_DIR, "plans", "r15"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = list(dict.fromkeys(sys.argv[2:]))
    import bench

    registry = load_registry()
    spark = build_session("fmts-plan-capture")
    os.makedirs(OUT_DIR, exist_ok=True)
    names = only or bench.HEADLINE
    for name in names:
        qd = registry.get(name)
        if qd is None:
            continue
        buf = io.StringIO()
        try:
            df = qd.fn(spark, SF_DIR)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # capture the failure as evidence too
            buf.write(f"PLAN CAPTURE FAILED: {exc!r}\n")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
