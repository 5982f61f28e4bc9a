"""q232 — per-source BPE fertility against a pure-Python trainer.

The oracle sweep hash-checks the rollup; this replica independently
trains the 3-round merge table (greedy argmax with the (count desc, a,
b) tie-break), segments the vocabulary with the same left-to-right
fold, and recomputes every output column — so a bug that hit Spark and
the SQL oracle symmetrically (shared spelling, q188's fold) would
still be caught here."""

from __future__ import annotations

import duckdb

from flink_mingo_tail_spark.queries import load_registry
from flink_mingo_tail_spark.queries.indexing import _BPE_ROUNDS
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def _fold(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _py_fertility(rows):
    swc: dict[tuple[str, str], int] = {}
    for src, text in rows:
        for w in text.split(" "):
            swc[(src, w)] = swc.get((src, w), 0) + 1
    wc: dict[str, int] = {}
    for (_, w), c in swc.items():
        wc[w] = wc.get(w, 0) + c
    seg = {w: list(w) for w in wc}
    for _ in range(_BPE_ROUNDS):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in seg.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + wc[w]
        a, b = min(pc, key=lambda k: (-pc[k], k))
        seg = {w: _fold(syms, a, b) for w, syms in seg.items()}
    agg: dict[str, list[int]] = {}
    for (src, w), c in swc.items():
        e = agg.setdefault(src, [0, 0, 0])
        e[0] += c
        e[1] += c * len(w)
        e[2] += c * len(seg[w])
    return {
        src: (
            nw,
            nc,
            nb,
            round(nb * 1000.0 / nw),
            round(nc * 1000.0 / nb),
        )
        for src, (nw, nc, nb) in agg.items()
    }


def test_fertility_matches_python_bpe_trainer(spark):
    rows = duckdb.connect().execute(
        f"SELECT source, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    expected = _py_fertility(rows)
    got = {
        r.source: (
            r.n_words,
            r.n_chars,
            r.n_bpe_tokens,
            r.tokens_per_word_milli,
            r.chars_per_token_milli,
        )
        for r in REGISTRY["q232_bpe_fertility_by_source"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_fertility_bounds(spark):
    """Merges only ever shrink a segmentation: words <= bpe tokens <=
    chars, for every source."""
    for r in REGISTRY["q232_bpe_fertility_by_source"].fn(spark, SF_SMOKE).collect():
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars
        assert r.tokens_per_word_milli >= 1000
        assert r.chars_per_token_milli >= 1000
