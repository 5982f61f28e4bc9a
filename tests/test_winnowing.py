"""q213 winnowing: the MOSS guarantee, tested as an algorithmic property.

Schleimer/Wilkerson/Aiken: if two documents share a substring of at
least k + w - 1 tokens, local-min selection picks at least one
IDENTICAL fingerprint from the shared region in both documents — for
ANY surrounding text. Deterministic seeds stand in for hypothesis here
(one Spark round-trip over a small batch beats a session per example).
"""

from __future__ import annotations

import random

from flink_mingo_tail_spark.queries.dedup import _WIN_K, _WIN_W

_MIN_SHARED = _WIN_K + _WIN_W - 1


def _rand_tokens(rng: random.Random, n: int) -> list[str]:
    return [f"w{rng.randrange(50)}" for _ in range(n)]


def test_shared_substring_yields_shared_fingerprint(spark):
    from flink_mingo_tail_spark.queries import load_registry

    rows = []
    expected_pairs = []
    for seed in range(10):
        rng = random.Random(seed)
        shared = _rand_tokens(rng, _MIN_SHARED + rng.randrange(4))
        a = _rand_tokens(rng, rng.randrange(30)) + shared + _rand_tokens(rng, rng.randrange(30))
        b = _rand_tokens(rng, rng.randrange(30)) + shared + _rand_tokens(rng, rng.randrange(30))
        rows.append((2 * seed, " ".join(a), "x", "t", len(a)))
        rows.append((2 * seed + 1, " ".join(b), "x", "t", len(b)))
        expected_pairs.append((2 * seed, 2 * seed + 1))
    import tempfile

    with tempfile.TemporaryDirectory(prefix="fmts-winnow-") as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        fps = load_registry()["q213_winnowing_fingerprints"].fn(spark, tmp)
        got = {(r["doc_id"], r["fp"]) for r in fps.collect()}
    by_doc: dict[int, set[int]] = {}
    for doc, fp in got:
        by_doc.setdefault(doc, set()).add(fp)
    for da, db in expected_pairs:
        assert by_doc.get(da) and by_doc.get(db), (da, db)
        assert by_doc[da] & by_doc[db], f"docs {da}/{db} share no fingerprint"


def test_disjoint_vocabulary_shares_nothing(spark):
    from flink_mingo_tail_spark.queries import load_registry

    a = " ".join(f"a{i}" for i in range(40))
    b = " ".join(f"b{i}" for i in range(40))
    import tempfile

    with tempfile.TemporaryDirectory(prefix="fmts-winnow-") as tmp:
        spark.createDataFrame(
            [(0, a, "x", "t", 40), (1, b, "x", "t", 40)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        fps = load_registry()["q213_winnowing_fingerprints"].fn(spark, tmp)
        got = {(r["doc_id"], r["fp"]) for r in fps.collect()}
    fa = {fp for d, fp in got if d == 0}
    fb = {fp for d, fp in got if d == 1}
    assert fa and fb and not (fa & fb)
