#!/usr/bin/env python
"""Capture .explain('formatted') for every HEADLINE query into
plans/r14/<query>_<tag>.txt (tag = before/after). Optimization-round
evidence artifact; the judge diffs these against plan claims in
OPTIMIZATION_r14.md.

Usage: python scripts/capture_plans_r14.py <tag> [query ...]
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


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sys.path.insert(0, REPO_DIR)
    import bench

    registry = load_registry()
    spark = build_session("fmts-plan-capture")
    out_dir = os.path.join(REPO_DIR, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in bench.HEADLINE:
        if only and name not in only:
            continue
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
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
