"""Standing-index compaction: probe verdicts are INVARIANT across the
distinct-rewrite swap, row counts shrink by exactly the churn factor,
and compaction refuses a manifest-less path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import (
    build_dedup_index,
    compact_dedup_index,
    probe_dedup_index,
)
from flink_mingo_tail_spark.operators.semantic_index import (
    build_semantic_index,
    compact_semantic_index,
    probe_semantic_index,
)
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE


def test_dedup_index_compaction_preserves_probe_verdicts(spark, tmp_path):
    path = f"{tmp_path}/didx"
    d = load_table(spark, SF_SMOKE, "documents")
    idx_side = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    build_dedup_index(idx_side, path, mode="overwrite")
    build_dedup_index(idx_side, path, mode="append")  # verbatim churn
    before = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    stats = compact_dedup_index(spark, path)
    for tbl, (nb, na) in stats.items():
        assert nb == 2 * na, (tbl, nb, na)  # exactly the churn factor
    after = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    assert before == after
    # non-degenerate fixture: at least one dup class AND some 'new'
    assert "new" in set(before.values())
    assert {"exact_dup", "near_dup"} & set(before.values())


def test_semantic_index_compaction_preserves_probe_verdicts(spark, tmp_path):
    path = f"{tmp_path}/sidx"
    e = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    idx_side = e.filter(F.col("vec_id") % 3 == 0)
    probes = e.filter((F.col("vec_id") % 3 == 1) & (F.col("vec_id") < 240))
    build_semantic_index(idx_side, path, expanded=False)
    build_semantic_index(idx_side, path, expanded=False, mode="append")
    before = {
        r.vec_id: r.semantic_hit
        for r in probe_semantic_index(probes, path, tau=0.25).collect()
    }
    stats = compact_semantic_index(spark, path)
    for tbl, (nb, na) in stats.items():
        assert nb == 2 * na, (tbl, nb, na)
    after = {
        r.vec_id: r.semantic_hit
        for r in probe_semantic_index(probes, path, tau=0.25).collect()
    }
    assert before == after
    assert any(before.values())  # non-degenerate: some hits exist


def test_compaction_recovers_from_mid_swap_crash(spark, tmp_path):
    """A crash between rename-aside and rename-in leaves {path} missing
    with the canonical table parked at {path}.compact.old; re-running
    compaction must restore it and converge, and probe verdicts must
    be unchanged (ADVICE round 12)."""
    import os

    path = f"{tmp_path}/didx"
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    idx_side = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    build_dedup_index(idx_side, path, mode="overwrite")
    build_dedup_index(idx_side, path, mode="append")
    before = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    # simulate the crash window on the content table: rename-aside done,
    # rename-in never happened
    os.rename(f"{path}/content", f"{path}/content.compact.old")
    stats = compact_dedup_index(spark, path)
    for tbl, (nb, na) in stats.items():
        assert nb == 2 * na, (tbl, nb, na)
    assert not os.path.exists(f"{path}/content.compact.old")
    after = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    assert before == after


def test_compaction_merges_parked_copy_when_appends_recreated_the_table(spark, tmp_path):
    """The round-13 review's data-loss composition: a compaction crash
    between rename-aside and rename-in parks the canonical table at
    .compact.old; an ingest APPEND then recreates {path} with only a
    recent batch's rows. Re-running compaction must UNION the parked
    copy back in — not delete it as stale — so no membership is lost
    and probe verdicts match a never-crashed index."""
    import os

    path = f"{tmp_path}/didx"
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 300)
    full = d.filter(F.col("doc_id") % 10 != 7)
    late = d.filter((F.col("doc_id") % 10 == 3))  # arrives after the crash
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    build_dedup_index(full, path, mode="overwrite")
    # crash window on content: rename-aside happened, rename-in did not
    os.rename(f"{path}/content", f"{path}/content.compact.old")
    # the ingest loop appends before anyone notices: content is recreated
    # with ONLY this batch's hashes
    build_dedup_index(late, path, mode="append")
    assert os.path.exists(f"{path}/content.compact.old")
    compact_dedup_index(spark, path)
    assert not os.path.exists(f"{path}/content.compact.old")
    got = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    # reference: an index that never crashed, same admissions
    ref_path = f"{tmp_path}/ref"
    build_dedup_index(full, ref_path, mode="overwrite")
    build_dedup_index(late, ref_path, mode="append")
    compact_dedup_index(spark, ref_path)
    want = {r.doc_id: r.status for r in probe_dedup_index(incoming, ref_path).collect()}
    assert got == want


def test_compaction_missing_table_without_backup_is_a_readable_error(spark, tmp_path):
    """{path} missing and NO .compact.old parked: fail loudly at entry
    (nothing to recover from), not with a raw spark.read path error."""
    import shutil

    path = f"{tmp_path}/didx2"
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 100)
    build_dedup_index(d, path, mode="overwrite")
    shutil.rmtree(f"{path}/bands")
    with pytest.raises(IOError, match="exists to recover"):
        compact_dedup_index(spark, path)


def test_compaction_refuses_manifestless_path(spark, tmp_path):
    with pytest.raises(ValueError, match="no dedup index manifest"):
        compact_dedup_index(spark, f"{tmp_path}/nope")
    with pytest.raises(ValueError, match="no semantic index manifest"):
        compact_semantic_index(spark, f"{tmp_path}/nope2")


def test_cross_family_manifest_read_is_rejected_at_the_gate(spark, tmp_path):
    """Pointing a dedup operator at a semantic index (or vice versa)
    must fail at the manifest gate with a readable error, not
    mid-maintenance with a path-not-found / TypeError (round-12
    review finding)."""
    e = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).filter(F.col("vec_id") < 60)
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 60)
    sem_path, ded_path = f"{tmp_path}/sem", f"{tmp_path}/ded"
    build_semantic_index(e, sem_path, expanded=False)
    build_dedup_index(d, ded_path)
    with pytest.raises(ValueError, match="wrong index family"):
        compact_dedup_index(spark, sem_path)
    with pytest.raises(ValueError, match="wrong index family"):
        probe_dedup_index(d, sem_path)
    with pytest.raises(ValueError, match="wrong index family"):
        compact_semantic_index(spark, ded_path)
    with pytest.raises(ValueError, match="wrong index family"):
        probe_semantic_index(e, ded_path)


def test_compaction_survives_tmp_only_merge_with_parked_copy_cleared(spark, tmp_path):
    """The round-13 ADVICE data-loss window, replayed as a post-crash
    STATE: a prior (pre-fix) run merged the parked canonical copy into
    .compact.tmp, deleted the parked copy, and crashed before
    rename-in — so the only copy of the parked membership lives in a
    complete .compact.tmp while {path} holds just a recent append.
    The reconcile-by-append entry must fold the complete tmp back into
    {path} (never blindly overwrite it), so no membership is lost."""
    import os
    import shutil

    path = f"{tmp_path}/didx"
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 300)
    full = d.filter(F.col("doc_id") % 10 != 7)
    late = d.filter(F.col("doc_id") % 10 == 3)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    build_dedup_index(full, path, mode="overwrite")
    # the crashed run's complete merged rewrite sits at .compact.tmp
    # (with _SUCCESS) — simulated by copying the canonical table there
    shutil.copytree(f"{path}/content", f"{path}/content.compact.tmp")
    assert os.path.exists(f"{path}/content.compact.tmp/_SUCCESS")
    # the parked copy is already gone and path was recreated by an
    # ingest append with ONLY the late batch's hashes
    shutil.rmtree(f"{path}/content")
    build_dedup_index(late, path, mode="append")
    compact_dedup_index(spark, path)
    assert not os.path.exists(f"{path}/content.compact.tmp")
    got = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    ref_path = f"{tmp_path}/ref"
    build_dedup_index(full, ref_path, mode="overwrite")
    build_dedup_index(late, ref_path, mode="append")
    compact_dedup_index(spark, ref_path)
    want = {r.doc_id: r.status for r in probe_dedup_index(incoming, ref_path).collect()}
    assert got == want


def test_compaction_recovers_from_aside_parked_crash(spark, tmp_path):
    """Round-14 swap names: a crash between rename-aside and rename-in
    now parks the canonical table at {path}.compact.aside (with the
    stale rewrite still at .compact.tmp). Re-running must restore from
    aside, fold the tmp, and converge with verdicts unchanged."""
    import os
    import shutil

    path = f"{tmp_path}/didx"
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    idx_side = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    build_dedup_index(idx_side, path, mode="overwrite")
    build_dedup_index(idx_side, path, mode="append")
    before = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    # crash window: tmp written, rename-aside done, rename-in never ran
    shutil.copytree(f"{path}/content", f"{path}/content.compact.tmp")
    os.rename(f"{path}/content", f"{path}/content.compact.aside")
    compact_dedup_index(spark, path)
    assert not os.path.exists(f"{path}/content.compact.aside")
    assert not os.path.exists(f"{path}/content.compact.tmp")
    after = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    assert before == after


def test_compaction_clears_obsolete_aside_after_rename_in_crash(spark, tmp_path):
    """Crash between rename-in and delete-aside: {path} already holds
    the compacted table and .compact.aside is the obsolete pre-swap
    copy. Re-running must reconcile it away (append is a no-op under
    DISTINCT) and end clean."""
    import os
    import shutil

    path = f"{tmp_path}/didx"
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    idx_side = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    build_dedup_index(idx_side, path, mode="overwrite")
    before = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    shutil.copytree(f"{path}/content", f"{path}/content.compact.aside")
    stats = compact_dedup_index(spark, path)
    nb, na = stats["content"]
    assert nb == 2 * na  # aside re-appended, then collapsed by DISTINCT
    assert not os.path.exists(f"{path}/content.compact.aside")
    after = {r.doc_id: r.status for r in probe_dedup_index(incoming, path).collect()}
    assert before == after
