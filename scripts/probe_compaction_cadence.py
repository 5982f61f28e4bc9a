"""Auto-compaction cadence cost/benefit probe (round-14 verdict #5).

``auto_compact_ratio`` exists with classification-invariance tests;
this probe measures what the knob actually BUYS and COSTS, so the
recommended default is a number, not a guess. It drives the
minimal-config curation ingest body (text dup index + eval gram set —
the dedup index's content table is the cadence's churn estimator, so
the minimal config isolates the cadence's own economics) over
``N_BATCHES`` slices of the sf0.1 documents corpus, with EVERY batch
re-ingested once immediately after it commits: the committed-replay
path re-runs the idempotent index append, so each batch's keys land
twice — a steady ~2x churn stream, exactly the replay/overlap scenario
the knob targets.

Two runs: cadence off (``auto_compact_ratio=None``) and on at the
docstring's recommended 1.3. Per batch it records the ingest wall
(primary + replay calls) and the index directory's bytes on disk;
the JSON lines feed the SCALE.md round-14 table.

Usage: python scripts/probe_compaction_cadence.py [n_batches]
Default 50. Prints one JSON line per run plus a 5-batch-bucketed
summary table to stderr-free stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from flink_mingo_tail_spark.session import build_session  # noqa: E402
from flink_mingo_tail_spark.streaming.curation_ingest import (  # noqa: E402
    build_eval_gram_set,
    make_curation_ingest_batch_fn,
)
from flink_mingo_tail_spark.tables import load_table, spread  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def run(spark, n_batches: int, ratio: float | None) -> dict:
    d = spread(load_table(spark, SF_DIR, "documents")).select(
        "doc_id", "source", "lang", "n_chars", "text"
    )
    n = d.count()
    per = -(-n // n_batches)
    tmp = tempfile.mkdtemp(prefix=f"fmts-cadence-{ratio}-")
    try:
        build_eval_gram_set(d, f"{tmp}/eval_grams")
        ingest = make_curation_ingest_batch_fn(
            f"{tmp}/index",
            f"{tmp}/eval_grams",
            f"{tmp}/out",
            auto_compact_ratio=ratio,
        )
        walls, sizes = [], []
        for b in range(n_batches):
            batch = d.filter(F.col("doc_id") % n_batches == b)
            t0 = time.monotonic()
            ingest(batch, b)
            ingest(batch, b)  # committed replay: pure index churn
            walls.append(round(time.monotonic() - t0, 2))
            sizes.append(dir_bytes(f"{tmp}/index"))
        return {
            "auto_compact_ratio": ratio,
            "n_batches": n_batches,
            "rows_per_batch": per,
            "total_wall_s": round(sum(walls), 1),
            "walls_s": walls,
            "index_bytes": sizes,
            "final_index_bytes": sizes[-1],
            "peak_index_bytes": max(sizes),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = build_session()
    for ratio in (None, 1.3):
        print(json.dumps(run(spark, n_batches, ratio)), flush=True)


if __name__ == "__main__":
    main()
