"""Standing span index (operators/dedup.py round 14): probe-vs-in-query
equivalence, manifest discipline, append/compact maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import (
    DEFAULT_SPAN_L,
    build_span_index,
    compact_span_index,
    duplicated_token_spans,
    probe_span_index,
)
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE


def _split(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    return (
        d.filter(F.col("doc_id") % 10 != 7),
        d.filter(F.col("doc_id") % 10 == 7),
    )


def test_probe_matches_cross_side_in_query_detection(spark, tmp_path):
    """Probing the standing index equals running the in-query detector
    on (index ∪ incoming) and keeping only CROSS-side incoming spans:
    for incoming docs with no self/within-batch duplication, the
    standing probe and the corpus detector agree on every span."""
    idx_side, incoming = _split(spark)
    path = f"{tmp_path}/sidx"
    build_span_index(idx_side, path)
    probed = {
        (r.doc_id, r.span_start, r.span_end)
        for r in probe_span_index(incoming, path).collect()
    }
    # reference: every incoming window whose key exists on the index
    # side, islands-merged — derived independently of the index code
    L = DEFAULT_SPAN_L

    def windows(df):
        t = df.select("doc_id", F.split("text", " ", -1).alias("toks"))
        return (
            t.filter(F.size("toks") >= L)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("toks") - L + 1)).alias("pos"),
                "toks",
            )
            .select(
                "doc_id",
                "pos",
                F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos"), L))).alias("h"),
            )
        )

    iw = windows(idx_side).select("h").distinct()
    marked = windows(incoming).join(iw, "h", "left_semi").select("doc_id", "pos")
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        marked.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(F.col("prev").isNull() | (F.col("pos") - F.col("prev") > L), 1)
            .otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("pos").alias("e"))
    )
    want = {(r.doc_id, r.s, r.e) for r in runs.collect()}
    assert probed == want
    assert probed  # non-degenerate on the fixture


def test_span_index_append_extends_membership(spark, tmp_path):
    """Appending a second batch makes ITS spans visible to later probes;
    membership-only appends are replay-idempotent (verdicts unchanged
    after a verbatim re-append)."""
    idx_side, incoming = _split(spark)
    b0 = idx_side.filter(F.col("doc_id") % 3 != 1)
    b1 = idx_side.filter(F.col("doc_id") % 3 == 1)
    path = f"{tmp_path}/sidx"
    build_span_index(b0, path)
    before = probe_span_index(incoming, path).count()
    build_span_index(b1, path, mode="append")
    mid = {
        (r.doc_id, r.span_start, r.span_end)
        for r in probe_span_index(incoming, path).collect()
    }
    build_span_index(b1, path, mode="append")  # verbatim replay
    after = {
        (r.doc_id, r.span_start, r.span_end)
        for r in probe_span_index(incoming, path).collect()
    }
    assert mid == after
    assert len(mid) >= before
    # full index equals the one-shot build
    full_path = f"{tmp_path}/full"
    build_span_index(idx_side, full_path)
    want = {
        (r.doc_id, r.span_start, r.span_end)
        for r in probe_span_index(incoming, full_path).collect()
    }
    assert mid == want


def test_span_index_compaction_is_verdict_invariant(spark, tmp_path):
    idx_side, incoming = _split(spark)
    path = f"{tmp_path}/sidx"
    build_span_index(idx_side, path)
    build_span_index(idx_side, path, mode="append")  # verbatim churn
    before = {
        (r.doc_id, r.span_start, r.span_end)
        for r in probe_span_index(incoming, path).collect()
    }
    stats = compact_span_index(spark, path)
    nb, na = stats["windows"]
    assert nb == 2 * na
    after = {
        (r.doc_id, r.span_start, r.span_end)
        for r in probe_span_index(incoming, path).collect()
    }
    assert before == after


def test_span_index_manifest_discipline(spark, tmp_path):
    d, _ = _split(spark)
    path = f"{tmp_path}/sidx"
    with pytest.raises(ValueError, match="no manifest found"):
        build_span_index(d, path, mode="append")
    build_span_index(d, path, span_l=6)
    with pytest.raises(ValueError, match="refusing to append"):
        build_span_index(d, path, span_l=8, mode="append")
    with pytest.raises(ValueError, match="no span index manifest"):
        probe_span_index(d, f"{tmp_path}/nope")
    with pytest.raises(ValueError, match="no span index manifest"):
        compact_span_index(spark, f"{tmp_path}/nope2")
    # cross-family guard: a dedup-index manifest read with the span
    # schema must be rejected at the gate
    from flink_mingo_tail_spark.operators.dedup import build_dedup_index

    ded = f"{tmp_path}/ded"
    build_dedup_index(d.limit(50), ded)
    with pytest.raises(ValueError, match="wrong index family"):
        probe_span_index(d, ded)


def test_self_duplication_within_batch_is_not_reported(spark, tmp_path):
    """The standing probe reports only spans shared with the INDEX —
    two incoming docs duplicating each other (but absent from the
    index) yield nothing, the q117 batch-vs-state granularity."""
    rows = [(1, " ".join(f"i{j}" for j in range(20)))]
    twin = " ".join(f"z{j}" for j in range(20))
    inc = [(100, twin), (101, twin)]
    path = f"{tmp_path}/sidx"
    ddl = "doc_id long, text string"
    build_span_index(spark.createDataFrame(rows, ddl), path)
    out = probe_span_index(spark.createDataFrame(inc, ddl), path)
    assert out.count() == 0


def test_persisted_audit_equals_in_query_derivation(spark, tmp_path):
    """audit_span_index off the persisted windows table EQUALS q261's
    in-query derivation from the same corpus (the q245/
    audit_semantic_index twin pattern), and refuses a manifest-less
    path."""
    from flink_mingo_tail_spark.operators.dedup import audit_span_index
    from flink_mingo_tail_spark.queries.dedup import q261_span_index_audit

    from .conftest import SF_SMOKE as sf

    d = load_table(spark, sf, "documents")
    path = f"{tmp_path}/sidx"
    build_span_index(d, path)
    persisted = [tuple(r) for r in audit_span_index(spark, path).collect()]
    inquery = [tuple(r) for r in q261_span_index_audit(spark, sf).collect()]
    assert persisted == inquery
    with pytest.raises(ValueError, match="no span index manifest"):
        audit_span_index(spark, f"{tmp_path}/nope")
