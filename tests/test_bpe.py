"""q188's greedy merge fold vs an independent Python reference.

The DuckDB oracle replays the SAME fold recurrence, so oracle parity
alone proves cross-engine agreement, not merge semantics. This test
checks the Spark fold against a straight-line Python implementation of
greedy left-to-right BPE merging on adversarial and random symbol
sequences (overlap runs like 'aaa', adjacent repeats like 'abab',
multi-char symbols from earlier rounds)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries.indexing import _SPARK_FOLD


def greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _spark_fold(spark, cases):
    df = spark.createDataFrame(
        [(i, syms, a, b) for i, (syms, a, b) in enumerate(cases)],
        "id long, syms array<string>, a string, b string",
    )
    rows = df.select("id", F.expr(_SPARK_FOLD).alias("merged")).collect()
    return {r.id: r.merged for r in rows}


def test_fold_adversarial_cases(spark):
    cases = [
        (list("aaa"), "a", "a"),          # overlap run -> [aa, a]
        (list("aaaa"), "a", "a"),         # -> [aa, aa]
        (list("abab"), "a", "b"),         # adjacent repeats -> [ab, ab]
        (list("aab"), "a", "b"),          # -> [a, ab]
        (["ab", "a", "b"], "a", "b"),     # multi-char bystander -> [ab, ab]
        (["a", "ab"], "a", "b"),          # no match (second symbol is 'ab')
        (list("xyz"), "a", "b"),          # no match at all
        (["b", "a"], "a", "b"),           # wrong order
    ]
    got = _spark_fold(spark, cases)
    for i, (syms, a, b) in enumerate(cases):
        assert got[i] == greedy_merge(syms, a, b), (syms, a, b, got[i])


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "ab", "bc"]),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([("a", "b"), ("b", "c"), ("a", "a"), ("ab", "c")]),
)
def test_fold_matches_reference(spark, syms, merge):
    a, b = merge
    got = _spark_fold(spark, [(syms, a, b)])
    assert got[0] == greedy_merge(syms, a, b), (syms, a, b, got[0])
