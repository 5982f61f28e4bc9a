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
