"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared query through Spark AND its oracle SQL through DuckDB,
canonicalizes both results (column-name sort, row sort, exact value
stringification) and asserts equality. Exact string canonicalization is
deliberately unforgiving: repr() of a float64 round-trips exactly, so
any cross-engine floating drift fails here before the driver sees it.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        if f == int(f) and abs(f) < 2**53:
            return str(int(f))  # 5.0 == 5 regardless of engine dtype choice
        return repr(f)
    if isinstance(v, Decimal):
        return _canon_value(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, str):
        return v
    if pd.isna(v):
        return "∅"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(row[c]) for c in cols) for _, row in df[cols].iterrows()]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonicalize(spark_pdf)
    o_rows = canonicalize(oracle_pdf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, oracle): {diffs}")


def run_compare(spark, duck, qdef, sf_dir: str) -> None:
    sdf = qdef.fn(spark, sf_dir).toPandas()
    odf = duck.execute(qdef.oracle).fetchdf()
    compare_frames(sdf, odf, qdef.name)
