"""Perceptual (dHash) standing index (operators/perceptual_index.py):
build/probe/append semantics, the pigeonhole completeness contract,
manifest discipline, compaction invariance, and the batch-of-one
equivalence to q225's batch classification (the q240≡q224 pattern
applied to the perceptual modality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.multimodal import (
    dhash_arrow,
    synthesize_media_variants,
)
from flink_mingo_tail_spark.operators.perceptual_index import (
    DEFAULT_PH_HAM,
    audit_perceptual_index,
    build_perceptual_index,
    compact_perceptual_index,
    probe_perceptual_index,
)
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE


def _fingerprints(spark, limit=None):
    d = load_table(spark, SF_SMOKE, "documents")
    if limit is not None:
        d = d.filter(F.col("doc_id") < limit)
    return dhash_arrow(synthesize_media_variants(d))


def _dense_hits(fp_rows, index_rows, ham=DEFAULT_PH_HAM):
    """The dense rule the index must reproduce exactly: hit iff any
    indexed fingerprint is within Hamming ham."""
    return {
        mid: any(bin(ph ^ iph).count("1") <= ham for _, iph in index_rows)
        for mid, ph in fp_rows
    }


def test_probe_equals_dense_hamming_rule(spark, tmp_path):
    """Band-collide + popcount == the dense 'within Hamming ham of any
    indexed fingerprint' rule, row for row (pigeonhole completeness +
    exact confirm)."""
    fp = _fingerprints(spark, limit=120)
    idx_side = fp.filter(F.col("media_id") % 3 != 1)
    probes = fp.filter(F.col("media_id") % 3 == 1)
    path = f"{tmp_path}/phidx"
    build_perceptual_index(idx_side, path)
    got = {
        r.media_id: r.perceptual_hit
        for r in probe_perceptual_index(probes, path).collect()
    }
    want = _dense_hits(
        [(r.media_id, r.ph) for r in probes.collect()],
        [(r.media_id, r.ph) for r in idx_side.collect()],
    )
    assert got == want
    assert any(got.values()) and not all(got.values())  # non-degenerate


def test_build_refuses_pigeonhole_violation(spark, tmp_path):
    fp = _fingerprints(spark, limit=20)
    with pytest.raises(ValueError, match="pigeonhole"):
        build_perceptual_index(fp, f"{tmp_path}/bad", n_bands=3, ham=3)


def test_append_refuses_manifest_drift_and_probe_reads_manifest(spark, tmp_path):
    fp = _fingerprints(spark, limit=60)
    path = f"{tmp_path}/phidx"
    build_perceptual_index(fp, path, n_shards=8)
    with pytest.raises(ValueError, match="refusing to append"):
        build_perceptual_index(fp, path, n_shards=16, mode="append")
    with pytest.raises(ValueError, match="no manifest found"):
        build_perceptual_index(fp, f"{tmp_path}/fresh", mode="append")
    # probe never guesses: params come from the manifest (n_shards=8)
    got = probe_perceptual_index(fp.limit(10), path).collect()
    assert all(r.perceptual_hit for r in got)  # every probe is indexed itself


def test_append_extends_membership_and_replay_is_idempotent(spark, tmp_path):
    fp = _fingerprints(spark, limit=90)
    b0 = fp.filter(F.col("media_id") % 3 == 0)
    b1 = fp.filter(F.col("media_id") % 3 == 1)
    probes = fp.filter(F.col("media_id") % 3 == 2)
    path = f"{tmp_path}/phidx"
    build_perceptual_index(b0, path)
    before = {
        r.media_id: r.perceptual_hit
        for r in probe_perceptual_index(probes, path).collect()
    }
    build_perceptual_index(b1, path, mode="append")
    build_perceptual_index(b1, path, mode="append")  # replayed batch
    after = {
        r.media_id: r.perceptual_hit
        for r in probe_perceptual_index(probes, path).collect()
    }
    # membership-monotone: hits only grow
    assert all(after[m] or not before[m] for m in before)
    assert any(after[m] and not before[m] for m in before), "b1 added no coverage"
    want = _dense_hits(
        [(r.media_id, r.ph) for r in probes.collect()],
        [(r.media_id, r.ph) for r in b0.unionByName(b1).collect()],
    )
    assert after == want


def test_compaction_preserves_probe_verdicts(spark, tmp_path):
    fp = _fingerprints(spark, limit=90)
    idx_side = fp.filter(F.col("media_id") % 3 != 2)
    probes = fp.filter(F.col("media_id") % 3 == 2)
    path = f"{tmp_path}/phidx"
    build_perceptual_index(idx_side, path)
    build_perceptual_index(idx_side, path, mode="append")  # verbatim churn
    before = {
        r.media_id: r.perceptual_hit
        for r in probe_perceptual_index(probes, path).collect()
    }
    stats = compact_perceptual_index(spark, path)
    for tbl, (nb, na) in stats.items():
        assert nb == 2 * na, (tbl, nb, na)
    after = {
        r.media_id: r.perceptual_hit
        for r in probe_perceptual_index(probes, path).collect()
    }
    assert before == after


def test_audit_counts_band_rows(spark, tmp_path):
    fp = _fingerprints(spark, limit=60)
    path = f"{tmp_path}/phidx"
    build_perceptual_index(fp, path)
    audit = {r.band: r for r in audit_perceptual_index(spark, path).collect()}
    n = fp.count()
    assert set(audit) == {0, 1, 2, 3}
    for band, row in audit.items():
        # every fingerprint contributes exactly one row per band
        assert row.n_buckets <= 256  # 8-bit band
        assert row.max_occ >= 1
        total = (
            spark.read.parquet(f"{path}/bands")
            .filter(F.col("band") == band)
            .count()
        )
        assert total == n


def test_cross_family_manifest_read_is_rejected(spark, tmp_path):
    from flink_mingo_tail_spark.operators.dedup import build_dedup_index

    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 60)
    ded_path = f"{tmp_path}/ded"
    build_dedup_index(d, ded_path)
    fp = _fingerprints(spark, limit=20)
    with pytest.raises(ValueError, match="wrong index family"):
        probe_perceptual_index(fp, ded_path)
    with pytest.raises(ValueError, match="wrong index family"):
        compact_perceptual_index(spark, ded_path)


def test_probe_plan_is_band_equi_join_not_cartesian(spark, tmp_path):
    """Plan contract: candidates come from an equi-join on
    (shard, band, bits) with the popcount confirm as a filter — never a
    cartesian / nested-loop over fingerprints; with broadcast_side=
    'probe' the bounded batch broadcasts (the streaming direction)."""
    fp = _fingerprints(spark, limit=120)
    idx_side = fp.filter(F.col("media_id") % 3 != 1)
    probes = fp.filter(F.col("media_id") % 3 == 1)
    path = f"{tmp_path}/phidx"
    build_perceptual_index(idx_side, path)
    df = probe_perceptual_index(probes, path, broadcast_side="probe")
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band" in plan and "bits" in plan
    assert "BroadcastHashJoin" in plan


def test_batch_of_one_matches_q225_classification(spark):
    """Driving media through the standing index ONE AT A TIME in id
    order (probe before append) must flag exactly the media that appear
    as the LATER member (media_b) of some q225 near-dup pair — the
    q240≡q224 equivalence proof for the perceptual modality."""
    from flink_mingo_tail_spark.queries.multimodal_udf import (
        perceptual_near_dup_pairs,
    )

    limit = 30
    fp_rows = sorted(
        (r.media_id, r.ph)
        for r in _fingerprints(spark, limit=limit).collect()
    )
    index_rows: list[tuple[int, int]] = []
    got = {}
    for mid, ph in fp_rows:  # batch-of-one, computed with the dense rule
        got[mid] = any(
            bin(ph ^ iph).count("1") <= DEFAULT_PH_HAM for _, iph in index_rows
        )
        index_rows.append((mid, ph))
    pairs = (
        perceptual_near_dup_pairs(spark, SF_SMOKE)
        .filter(F.col("media_b") < limit)
        .collect()
    )
    want_hit = {r.media_b for r in pairs}
    assert {m for m, hit in got.items() if hit} == want_hit
    assert want_hit, "fixture planted no near-dup structure below the limit"


def test_batch_of_one_through_the_real_index(spark, tmp_path):
    """Same batch-of-one equivalence, but through the PERSISTED index
    (build/probe/append round trips) on a small slice — proves the
    banded standing index, not just the dense rule."""
    fp = _fingerprints(spark, limit=12)
    ids = sorted(r.media_id for r in fp.select("media_id").collect())
    path = f"{tmp_path}/phidx"
    got = {}
    for i, mid in enumerate(ids):
        one = fp.filter(F.col("media_id") == mid)
        if i == 0:
            got[mid] = False
            build_perceptual_index(one, path)
            continue
        got[mid] = probe_perceptual_index(one, path).head().perceptual_hit
        build_perceptual_index(one, path, mode="append")
    fp_rows = sorted((r.media_id, r.ph) for r in fp.collect())
    want = {}
    seen: list[tuple[int, int]] = []
    for mid, ph in fp_rows:
        want[mid] = any(
            bin(ph ^ iph).count("1") <= DEFAULT_PH_HAM for _, iph in seen
        )
        seen.append((mid, ph))
    assert got == want
    assert any(got.values()), "12 ids cover 2+ planted groups; hits expected"
