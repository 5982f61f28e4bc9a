"""q154 prefix-filter losslessness on adversarial boundary corpora."""

from __future__ import annotations

from itertools import combinations

from flink_mingo_tail_spark.queries import load_registry

REGISTRY = load_registry()


def _bigrams(text: str) -> set:
    toks = text.split(" ")
    return {f"{a} {b}" for a, b in zip(toks, toks[1:])}


def _brute_force(docs: dict, tau: float = 0.5):
    out = []
    for (ida, ta), (idb, tb) in combinations(sorted(docs.items()), 2):
        sa, sb = _bigrams(ta), _bigrams(tb)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        un = len(sa | sb)
        if inter >= tau * un:
            out.append((ida, idb, inter, un))
    return sorted(out)


def _run(spark, tmp_path, docs: dict):
    rows = [(i, t, "en", "src0", len(t)) for i, t in docs.items()]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "fx")
    df.write.parquet(sf_dir + "/documents.parquet")
    got = REGISTRY["q154_set_similarity_join"].fn(spark, sf_dir).collect()
    return sorted((r.doc_a, r.doc_b, r.inter, r.un) for r in got)


def test_boundary_identical_and_empty_sets(spark, tmp_path):
    docs = {
        1: "p1 p2 q1",        # {p1 p2, p2 q1}
        2: "p1 p2",           # {p1 p2} -> J(1,2) = 1/2 exactly: keep
        3: "p1 p2 q2",        # J(1,3) = 1/3: drop; J(2,3) = 1/2: keep
        4: "p1 p2 q1",        # identical to 1: J = 1
        5: "solo",            # single token -> empty bigram set: excluded
        6: "solo",            # a second empty set must not form a 0/0 pair
        7: "alpha beta gamma delta",  # disjoint bigrams from the rest
    }
    assert _run(spark, tmp_path, docs) == _brute_force(docs)


def test_rare_prefix_still_catches_pairs_dominated_by_common_tokens(spark, tmp_path):
    # bigram 'c c' is ubiquitous (low selectivity, sorts LAST in the
    # rarest-first order); true pairs must still be found through it
    filler = " ".join("c" * 1 for _ in range(6))  # "c c c c c c" -> {c c}
    docs = {
        1: filler + " a b",   # {c c, c a, a b}
        2: filler + " a b",   # identical: J = 1
        3: filler,            # {c c}: J(3, 1) = 1/3 drop; J(3, 4..9) = 1 keep
    }
    docs.update({i: filler for i in range(4, 10)})
    assert _run(spark, tmp_path, docs) == _brute_force(docs)


def test_length_filter_does_not_drop_threshold_pairs(spark, tmp_path):
    # |A| = 2, |B| = 4, shared 2 bigrams: J = 2/4 = 0.5 — exactly at the
    # tau*max <= min length-filter boundary (2*2 >= 4*1)
    docs = {
        1: "a b c",            # {a b, b c}
        2: "a b c d e",        # {a b, b c, c d, d e}
    }
    assert _run(spark, tmp_path, docs) == _brute_force(docs) == [(1, 2, 2, 4)]
