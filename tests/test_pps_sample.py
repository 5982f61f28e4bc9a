"""q151 — weighted systematic (PPS) sampling via two-level prefix sums.

The registry-wide oracle-parity sweep already hash-checks q151 against
DuckDB on the fixture corpus; these tests cover what the fixture can't:
a document heavier than the step (multiplicity > 1), exact pick
positions against a pure-Python replica, and the scale contract — the
only single-partition window runs over the per-bucket totals, never the
corpus.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries.sketches import _PPS_BUCKET_W, _PPS_STEP


def _py_pps(rows, step):
    """Pure-Python replica: (doc_id, n_chars) -> {doc_id: (n_hits, pick_pos)}."""
    out, cum = {}, 0
    for doc_id, w in sorted(rows):
        before, cum = cum, cum + w
        hits = cum // step - before // step
        if hits:
            out[doc_id] = (hits, before // step + 1)
    return out


def test_pps_matches_python_replica_with_heavy_rows(spark):
    """A document heavier than the step is picked with multiplicity,
    and pick positions are exact — including rows spanning bucket
    boundaries (doc_ids straddle the DIV-100 buckets)."""
    from flink_mingo_tail_spark.queries.sketches import q151_pps_systematic_sample

    rows = [
        (0, 900),
        (1, 900),       # cum 1800 — no pick yet
        (2, 300),       # cum 2100 -> pick 1
        (99, 150),      # bucket 0 ends
        (100, 5000),    # heavier than step: crosses 2 boundaries -> 2 hits
        (101, 10),
        (250, 1995),    # cum 9355 -> crosses 8000? replica decides
        (399, 2000),    # exactly one step of weight
    ]
    expected = _py_pps(rows, _PPS_STEP)

    # run the query body against a temp view shaped like documents
    df = spark.createDataFrame(
        [(d, f"s{d % 3}", w) for d, w in rows], "doc_id long, source string, n_chars long"
    )
    # inline replication of the q151 plan over an arbitrary frame
    d = df.select("doc_id", "source", "n_chars", F.expr(f"doc_id DIV {_PPS_BUCKET_W}").alias("b"))
    from pyspark.sql import Window

    w_in = Window.partitionBy("b").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    within = d.withColumn("within", F.sum("n_chars").over(w_in))
    btot = d.groupBy("b").agg(F.sum("n_chars").alias("tot"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select("b", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off"))
    scored = within.join(offs, "b").select(
        "doc_id", "n_chars", (F.col("off") + F.col("within")).alias("cum_after")
    )
    got = {
        r.doc_id: (r.n_hits, r.pick_pos)
        for r in scored.select(
            "doc_id",
            (F.expr(f"cum_after DIV {_PPS_STEP}") - F.expr(f"(cum_after - n_chars) DIV {_PPS_STEP}")).alias("n_hits"),
            (F.expr(f"(cum_after - n_chars) DIV {_PPS_STEP}") + 1).alias("pick_pos"),
        )
        .filter(F.col("n_hits") >= 1)
        .collect()
    }
    assert got == expected
    assert got[100][0] >= 2  # the heavy row really was multi-hit


def test_pps_plan_single_partition_window_only_on_bucket_totals(spark):
    """The scale contract: the corpus-level running sum is partitioned
    by bucket (parallel); the ONLY single-partition exchange feeds the
    window over per-bucket totals. A naive global `ORDER BY doc_id`
    window would put the whole corpus through one task."""
    from flink_mingo_tail_spark.queries import load_registry

    from .conftest import SF_ORACLE

    df = load_registry()["q151_pps_systematic_sample"].fn(spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # two windows: the partition-parallel per-bucket running sum and
    # the bucket-totals offset window
    assert plan.count("Window") >= 2
    # exactly one SinglePartition exchange (the bucket-totals window;
    # the final orderBy is a range partition, not a gather)
    assert plan.count("SinglePartition") == 1, plan
    # the per-doc running sum is partitioned by the bucket column
    assert "partitionBy=[b" in plan.replace(" ", "") or "hashpartitioning(b" in plan
