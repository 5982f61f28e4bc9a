#!/usr/bin/env python
"""Diff two bench sidecars into the PERF-shaped per-query table.

The driver's PERF comparator reads only the compact final stdout line
(which deliberately carries no per-query map — it must stay under the
2,000-byte tail window), so its `per_query` came up empty in round 14
and round-over-round adjudication had to be reconstructed from captured
tails. This script produces that comparison from the run-keyed sidecars
bench.py writes (`bench_detail_c{cpus}.json`, or any historical
`bench_detail.json` / BENCH_r*.json envelope with a `queries` map).

Usage:
    python scripts/bench_compare.py PREV.json NOW.json [--json]

Output (default): a sorted table of per-query speedups (prev/now — >1 is
faster) plus geomean over common queries, total walls, and dropped/new
query names. `--json` emits the same as one PERF-shaped JSON object.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def load_queries(path: str) -> tuple[dict[str, float], float | None]:
    """Return (queries map, total wall) from any bench record shape:
    a bench_detail sidecar, a raw bench.py detail line, or the driver's
    BENCH_r*.json envelope ({"parsed": {...}, "tail": "..."})."""
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(
            f"{path}: no per-query map (driver envelopes only keep the "
            "compact final line — point at the run-keyed sidecar instead)"
        )
    return {k: float(v) for k, v in q.items()}, d.get("value")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prev")
    ap.add_argument("now")
    ap.add_argument("--json", action="store_true", help="emit one PERF-shaped JSON object")
    args = ap.parse_args()

    prev_q, prev_total = load_queries(args.prev)
    now_q, now_total = load_queries(args.now)

    common = sorted(set(prev_q) & set(now_q))
    per_query = {
        n: {
            "prev": prev_q[n],
            "now": now_q[n],
            "speedup": round(prev_q[n] / now_q[n], 3) if now_q[n] > 0 else None,
        }
        for n in common
    }
    ratios = [v["speedup"] for v in per_query.values() if v["speedup"]]
    geomean = (
        round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3) if ratios else None
    )
    out = {
        "n_common": len(common),
        "geomean_speedup": geomean,
        "bench_total_prev": prev_total,
        "bench_total_now": now_total,
        "queries_dropped": sorted(set(prev_q) - set(now_q)),
        "queries_added": sorted(set(now_q) - set(prev_q)),
        "per_query": per_query,
    }
    if args.json:
        json.dump(out, sys.stdout, indent=1, sort_keys=True)
        print()
        return
    width = max((len(n) for n in common), default=10)
    print(f"{'query':<{width}}  {'prev':>8}  {'now':>8}  speedup")
    for n in sorted(common, key=lambda n: per_query[n]["speedup"] or 0.0):
        v = per_query[n]
        print(f"{n:<{width}}  {v['prev']:>8.3f}  {v['now']:>8.3f}  {v['speedup']:>7}")
    print(
        f"\ncommon={len(common)} geomean={geomean} "
        f"total {prev_total} -> {now_total} "
        f"dropped={out['queries_dropped']} added={out['queries_added']}"
    )


if __name__ == "__main__":
    main()
