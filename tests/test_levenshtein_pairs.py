"""q140 prefix-filter soundness on names where the ED-Join count bound
is vacuous (<= q*t distinct bigrams): short names, length-1 names, and
degenerate repetitive names must flow through the fallback block and
never be silently lost (ADVICE r5, queries/layout.py)."""

from __future__ import annotations

from itertools import combinations

from flink_mingo_tail_spark.queries import load_registry

REGISTRY = load_registry()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(parts):
    out = []
    for (ka, ba, na), (kb, bb, nb) in combinations(sorted(parts), 2):
        if ba == bb and _lev(na, nb) <= 1:
            out.append((ka, kb, _lev(na, nb)))
    return sorted(out)


def test_short_and_degenerate_names_are_not_lost(spark, tmp_path):
    parts = [
        # zero-bigram and one-bigram names: invisible to the prefix join
        (1, "B1", "a"),       # no bigrams at all
        (2, "B1", "ab"),      # {ab}; dist('a','ab') = 1 -> must pair with 1
        (3, "B1", "ac"),      # {ac}; dist('ab','ac') = 1, ZERO shared bigrams
        (4, "B1", "abc"),     # {ab,bc}; dist('ab','abc') = 1
        # degenerate repetitive long names with only 2 distinct bigrams
        (5, "B1", "ababab"),  # {ab,ba}
        (6, "B1", "abababa"), # {ab,ba}; dist = 1 -> must pair with 5
        # normal long names: main prefix path
        (7, "B1", "misty golden drab"),
        (8, "B1", "misty golden drag"),  # dist 1
        (9, "B2", "ab"),      # same name as 2, different brand: no pair
    ]
    df = spark.createDataFrame(parts, "p_partkey long, p_brand string, p_name string")
    sf_dir = str(tmp_path / "fx")
    df.write.parquet(sf_dir + "/part.parquet")
    got = sorted(
        (r.p1, r.p2, r.dist)
        for r in REGISTRY["q140_levenshtein_pairs"].fn(spark, sf_dir).collect()
    )
    assert got == _brute(parts)
    # the fixture must actually exercise the vacuous-bound cases
    assert (2, 3, 1) in got and (1, 2, 1) in got and (5, 6, 1) in got
