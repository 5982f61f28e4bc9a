"""duplicated_token_spans (operators/dedup.py round 14): planted-span
recovery, maximal merging, self-repetition, and the short-doc guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import (
    DEFAULT_SPAN_L,
    duplicated_token_spans,
)
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_cross_doc_span_is_recovered_maximally(spark):
    """A 2L-token span shared by two docs at different offsets comes
    back as ONE maximal span per doc covering exactly those tokens."""
    L = DEFAULT_SPAN_L
    shared = _toks("s", 2 * L)
    a = _toks("a", 5) + " " + shared + " " + _toks("b", 5)
    b = _toks("c", 9) + " " + shared + " " + _toks("d", 3)
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicated_token_spans(_docs(spark, [(1, a), (2, b)])).collect()
    }
    # doc 1: shared tokens occupy positions 6..6+2L-1; window starts
    # run 6..6+L; doc 2: starts at 10
    assert spans[1] == (6, 6 + L)
    assert spans[2] == (10, 10 + L)
    # duplicated token mass = span_end - span_start + L = 2L, both docs
    for s, e in spans.values():
        assert e - s + L == 2 * L


def test_self_repetition_counts_as_duplication(spark):
    """The same L-token span twice in ONE doc is duplication (the
    memorizable-boilerplate rule includes self-repeats)."""
    L = DEFAULT_SPAN_L
    rep = _toks("r", L)
    text = rep + " " + _toks("x", L) + " " + rep
    out = duplicated_token_spans(_docs(spark, [(1, text)])).collect()
    got = sorted((r.span_start, r.span_end) for r in out)
    assert got == [(1, 1), (2 * L + 1, 2 * L + 1)]


def test_adjacent_and_disjoint_spans(spark):
    """Two shared spans separated by MORE than L novel tokens stay two
    islands; separated by fewer they merge into one (the gap rule
    pos - prev > L)."""
    L = DEFAULT_SPAN_L
    s1, s2 = _toks("p", L), _toks("q", L)
    far_a = s1 + " " + _toks("u", L + 1) + " " + s2
    far_b = s1 + " " + _toks("v", L + 1) + " " + s2
    near_a = s1 + " " + s2 + " " + _toks("w", 3)
    near_b = s1 + " " + s2 + " " + _toks("y", 3)
    far = duplicated_token_spans(_docs(spark, [(1, far_a), (2, far_b)]))
    assert far.filter(F.col("doc_id") == 1).count() == 2
    near = duplicated_token_spans(_docs(spark, [(1, near_a), (2, near_b)]))
    assert near.filter(F.col("doc_id") == 1).count() == 1


def test_short_docs_and_unique_docs_yield_nothing(spark):
    L = DEFAULT_SPAN_L
    out = duplicated_token_spans(
        _docs(
            spark,
            [
                (1, _toks("a", L - 1)),  # below the window width
                (2, _toks("b", 3 * L)),  # unique content
            ],
        )
    )
    assert out.count() == 0


def test_fixture_is_nondegenerate_and_spans_are_windows(spark):
    """On the real corpus: some docs carry duplicated spans, spans sit
    inside their documents, and every span's windows really collide
    (span_end >= span_start)."""
    d = load_table(spark, SF_SMOKE, "documents")
    spans = duplicated_token_spans(d)
    n = spans.count()
    assert n > 0
    assert spans.filter(F.col("span_end") < F.col("span_start")).count() == 0
    joined = spans.join(
        d.select("doc_id", F.size(F.split("text", " ", -1)).alias("n_toks")),
        "doc_id",
    )
    assert (
        joined.filter(
            F.col("span_end") + F.lit(DEFAULT_SPAN_L) - 1 > F.col("n_toks")
        ).count()
        == 0
    )


def test_trim_apply_consistency_and_survivorship(spark):
    """q262's applied rewrite agrees with q258's plan doc-for-doc
    (n_kept_tokens = kept_tokens), leaves untouched docs verbatim, and
    keeps exactly one copy of a planted duplicated span (the earliest
    occurrence survives, later ones are cut)."""
    from flink_mingo_tail_spark.queries.dedup import (
        q258_span_trim_plan,
        q262_span_trim_apply,
    )

    plan = {
        r.doc_id: (r.n_toks, r.kept_tokens)
        for r in q258_span_trim_plan(spark, SF_SMOKE).collect()
    }
    applied = {
        r.doc_id: (r.kept_text, r.n_kept_tokens)
        for r in q262_span_trim_apply(spark, SF_SMOKE).collect()
    }
    assert set(plan) == set(applied)
    d = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    changed = 0
    for doc_id, (n_toks, kept_toks) in plan.items():
        text, n_kept = applied[doc_id]
        assert n_kept == kept_toks, doc_id
        if kept_toks == n_toks:
            assert text == d[doc_id], doc_id  # untouched docs verbatim
        else:
            changed += 1
            assert len(text.split(" ")) == kept_toks or (text == "" and kept_toks == 0)
    assert changed > 0  # the fixture really has trims


def test_trim_apply_keeps_earliest_occurrence(spark):
    """Planted: the shared span survives in the earlier doc and is cut
    from the later one."""
    from flink_mingo_tail_spark.operators.dedup import (
        DEFAULT_SPAN_L,
        _merge_span_islands,
        _span_windows,
    )
    from pyspark.sql.window import Window

    L = DEFAULT_SPAN_L
    shared = _toks("s", L)
    a_txt = shared + " " + _toks("a", 5)
    b_txt = _toks("b", 5) + " " + shared
    docs = _docs(spark, [(1, a_txt), (2, b_txt)])
    w = _span_windows(docs, id_col="doc_id", text_col="text", span_l=L)
    dup = w.groupBy("h").count().filter(F.col("count") > 1).select("h")
    marked = w.join(dup, "h", "left_semi")
    removable = (
        marked.withColumn(
            "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "pos"))
        )
        .filter(F.col("rn") > 1)
        .select("doc_id", "pos")
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in _merge_span_islands(removable, id_col="doc_id", span_l=L).collect()
    }
    # only doc 2's copy (window start at position 6) is removable
    assert spans == {(2, 6, 6)}
