"""Packing-domain guards must FIRE and must SURVIVE optimization.

Round-7 verdict #1: q190's original guard was `withColumn(assert_true)
.drop(...)` — the expression hung off a column that was immediately
dropped, so Catalyst's column pruning deleted it and the docstring's
"ENFORCED" claim was false. The correct spelling (q158's) folds the
CASE WHEN out-of-domain THEN raise_error branch INTO the consumed
packed expression, where pruning cannot touch it.

Three layers of protection here:

1. guard-fires tests: a genuinely violating row raises at runtime;
2. plan tests: the raise_error branch is present in the OPTIMIZED plan
   (not just the analyzed one — pruning runs in the optimizer);
3. a source lint: `F.assert_true` is banned from the engine package
   outright, because the only failure mode we have ever had with it is
   the prunable-detached form. Guards must be written as raise_error
   branches inside consumed expressions.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from flink_mingo_tail_spark.queries import load_registry

REGISTRY = load_registry()

_US_DAY = 86_400_000_000


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source, n_chars)."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "fixture")
    df.write.parquet(out + "/documents.parquet")
    return out


def test_q190_guard_fires_on_oversized_n_chars(spark, tmp_path):
    # n_chars = 2^29 is one past the packing domain — must raise, not
    # silently misorder the quality prefix.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c", "en", "src0", 5),
            (2, "d e", "en", "src0", 1 << 29),
        ],
    )
    with pytest.raises(Exception, match="packed order key domain exceeded"):
        REGISTRY["q190_token_budget_cut"].fn(spark, sf).collect()


def test_q190_guard_fires_on_oversized_doc_id(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1 << 34, "a b c", "en", "src0", 5),
            (2, "d e", "en", "src0", 3),
        ],
    )
    with pytest.raises(Exception, match="packed order key domain exceeded"):
        REGISTRY["q190_token_budget_cut"].fn(spark, sf).collect()


def test_q190_in_domain_rows_pass_and_order_by_quality(spark, tmp_path):
    # Same fixture shape, all rows in-domain: the guard must be
    # invisible and the per-source quality prefix (n_chars desc) intact.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b", "en", "src0", 100),
            (2, "c d e f", "en", "src0", 400),
            (3, "g", "en", "src0", 50),
        ],
    )
    rows = REGISTRY["q190_token_budget_cut"].fn(spark, sf).collect()
    got = {r["doc_id"]: r["cum_before"] for r in rows}
    # quality order is n_chars desc: doc 2 (0 before), doc 1 (4 before),
    # doc 3 (4+2=6 before) — all under the 100-token budget.
    assert got == {2: 0, 1: 4, 3: 6}


def test_q190_guard_survives_optimization(spark):
    """The regression that motivated this file: pruning must NOT be able
    to delete the domain check. raise_error sits inside the consumed
    packed key, so the OPTIMIZED plan retains it."""
    df = REGISTRY["q190_token_budget_cut"].fn(spark, "/root/testdata/sf0.001")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in optimized
    assert "packed order key domain exceeded" in optimized


def test_q158_guard_fires_on_out_of_domain_v100(spark, tmp_path):
    # v100 >= 2^18 would corrupt the packed open/close anchors
    # IDENTICALLY in Spark and DuckDB, invisible to the hash check —
    # the guard is the only line of defense.
    big_value = float((1 << 18) + 1) / 100.0  # v100 = round(value*100)
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 0), 7, "view", big_value, "{}"),
            (2, datetime(2024, 1, 1, 0, 0, 1), 7, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "fixture")
    df.write.parquet(out + "/events.parquet")
    with pytest.raises(Exception, match="out of packing domain"):
        REGISTRY["q158_ohlc_bars"].fn(spark, out).collect()


def test_q158_guard_survives_optimization(spark):
    df = REGISTRY["q158_ohlc_bars"].fn(spark, "/root/testdata/sf0.001")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in optimized
    assert "out of packing domain" in optimized


def test_no_assert_true_anywhere_in_engine_source():
    """Source lint (round-7 verdict #2): `assert_true` attached to a
    dropped column is silently prunable — the engine bans the function
    and requires the raise_error-inside-consumed-expression pattern
    instead. This keeps the q190 mistake unrepeatable."""
    pkg = os.path.join(os.path.dirname(__file__), "..", "flink_mingo_tail_spark")
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path, encoding="utf-8") as fh:
                for lineno, line in enumerate(fh, 1):
                    if "assert_true" in line:
                        offenders.append(f"{path}:{lineno}: {line.strip()}")
    assert not offenders, (
        "assert_true found in engine source — use the raise_error branch "
        "inside a consumed expression instead (prunable-guard lint):\n"
        + "\n".join(offenders)
    )
