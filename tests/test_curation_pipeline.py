"""q226 composed-pipeline semantics: stage precedence, survivor-set
consistency with the component queries (q71/q73/q75b), and the
budget-cut prefix property. The DuckDB oracle is the independent
cross-engine check; these tests pin the SEMANTIC relationships the
hash comparison alone can't express."""

from __future__ import annotations

from flink_mingo_tail_spark.queries import load_registry

from .conftest import SF_ORACLE

REGISTRY = load_registry()

_VALID = {
    "eval_holdout",
    "too_short",
    "too_long",
    "repetitive",
    "no_stopwords",
    "exact_dup",
    "near_dup",
    "contaminated",
    "over_budget",
    "kept",
}


def _rows(spark):
    return REGISTRY["q226_curation_pipeline"].fn(spark, SF_ORACLE).collect()


def test_pipeline_covers_every_doc_with_one_valid_reason(spark):
    rows = _rows(spark)
    n_docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        assert r.reason in _VALID, r
        assert r.keep == (r.reason == "kept"), r
        if r.doc_id % 100 == 0:
            assert r.reason == "eval_holdout", r


def test_pipeline_stage_flags_subset_component_queries(spark):
    """Later-stage reasons must be consistent with the standalone
    component queries: an 'exact_dup' doc is a non-keeper in q71; a
    'near_dup' doc is near-dup in q73 (1x8 full-signature collision
    implies collision in both of q73's 2x4 half-bands); a
    'contaminated' doc is contaminated in q75b."""
    rows = {r.doc_id: r.reason for r in _rows(spark)}
    q71 = {
        r.doc_id: r.is_keeper
        for r in REGISTRY["q71_content_hash_dedup"].fn(spark, SF_ORACLE).collect()
    }
    q73 = {
        r.doc_id: r.is_near_dup
        for r in REGISTRY["q73_minhash_lsh_dedup"].fn(spark, SF_ORACLE).collect()
    }
    q75b = {
        r.doc_id: r.contaminated
        for r in REGISTRY["q75b_decontaminate"].fn(spark, SF_ORACLE).collect()
    }
    for doc_id, reason in rows.items():
        if reason == "exact_dup":
            assert q71[doc_id] is False, doc_id
        elif reason == "near_dup":
            assert q73[doc_id] is True, doc_id
        elif reason == "contaminated":
            assert q75b[doc_id] is True, doc_id


def test_pipeline_budget_cut_is_quality_prefix_per_source(spark):
    """Within every source, the budget stage must keep exactly the
    n_chars-desc (doc_id tiebreak) PREFIX of the docs that reached it:
    no kept doc may rank below an over_budget doc of the same source,
    and the strictly-before-cumulative-tokens of every kept doc is
    under the budget."""
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.queries.dedup import _PIPE_BUDGET

    reasons = {r.doc_id: r.reason for r in _rows(spark)}
    meta = {
        r.doc_id: (r.source, r.n_chars, r.n_toks)
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "source", "n_chars", F.size(F.split("text", " ")).alias("n_toks"))
        .collect()
    }
    by_source: dict = {}
    for doc_id, reason in reasons.items():
        if reason in ("kept", "over_budget"):
            src, n_chars, n_toks = meta[doc_id]
            by_source.setdefault(src, []).append((-n_chars, doc_id, n_toks, reason))
    assert by_source, "no docs reached the budget stage"
    saw_over_budget = False
    for src, docs in by_source.items():
        docs.sort()
        cum = 0
        for _neg, doc_id, n_toks, reason in docs:
            expect = "kept" if cum < _PIPE_BUDGET else "over_budget"
            assert reason == expect, (src, doc_id, cum, reason)
            saw_over_budget |= reason == "over_budget"
            cum += n_toks
    assert saw_over_budget  # the stage demonstrably fires at this SF


def test_persist_knob_classification_identical(spark):
    """The 100 TB stage-boundary persist (curation_verdict's
    persist_stage_boundary=True) must not change a single verdict, and
    the q227 rollup built over it must match the default-mode rollup —
    the shared-plan contract holds in both modes."""
    from flink_mingo_tail_spark.queries.dedup import curation_verdict

    base = curation_verdict(spark, SF_ORACLE)
    persisted = curation_verdict(spark, SF_ORACLE, persist_stage_boundary=True)
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(base.collect(), key=key) == sorted(persisted.collect(), key=key)
    roll = lambda df: sorted(  # noqa: E731
        df.groupBy("source", "reason").count().collect(),
        key=lambda r: (r.source, r.reason),
    )
    assert roll(base) == roll(persisted)
