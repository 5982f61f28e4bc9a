"""Property-based oracle tests (SURVEY.md §5.2 item 4): Hypothesis
generates predicate/aggregation parameters; Spark and DuckDB must agree
on every instance — this sweeps the predicate space the hand-written
query set can't enumerate."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_mingo_tail_spark.tables import load_table, table_path

from .conftest import SF_SMOKE

FLAGS = ["A", "N", "R"]
STATUSES = ["F", "O"]


@pytest.fixture(scope="module")
def duck_li():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(SF_SMOKE, 'lineitem')}')"
    )
    return con


@pytest.fixture(scope="module")
def spark_li(spark):
    df = load_table(spark, SF_SMOKE, "lineitem")
    df.cache().count()
    return df


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    qty_lo=st.integers(min_value=0, max_value=55),
    disc_hi=st.integers(min_value=0, max_value=11),
    flag=st.sampled_from(FLAGS + STATUSES),  # sometimes a non-matching flag value
    negate=st.booleans(),
)
def test_random_conjunctive_filters_match(spark_li, duck_li, qty_lo, disc_hi, flag, negate):
    disc = disc_hi / 100.0
    cond = (F.col("l_quantity") >= qty_lo) & (F.col("l_discount") <= disc)
    sql = f"l_quantity >= {qty_lo} AND l_discount <= {disc}"
    if negate:
        cond = cond & (F.col("l_returnflag") != flag)
        sql += f" AND l_returnflag <> '{flag}'"
    else:
        cond = cond & (F.col("l_returnflag") == flag)
        sql += f" AND l_returnflag = '{flag}'"
    got = spark_li.filter(cond).count()
    want = duck_li.execute(f"SELECT count(*) FROM lineitem WHERE {sql}").fetchone()[0]
    assert got == want, f"filter mismatch for: {sql}"


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    key=st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey"]),
    qty_lo=st.integers(min_value=0, max_value=50),
)
def test_random_grouped_scaled_sums_match(spark_li, duck_li, key, qty_lo):
    got = {
        (r[0], r[1])
        for r in spark_li.filter(F.col("l_quantity") >= qty_lo)
        .groupBy(key)
        .agg((F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))).alias("cents"))
        .collect()
    }
    want = set(
        map(
            tuple,
            duck_li.execute(
                f"""SELECT {key}, sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    FROM lineitem WHERE l_quantity >= {qty_lo} GROUP BY {key}"""
            ).fetchall(),
        )
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(k=st.integers(min_value=1, max_value=200), asc=st.booleans())
def test_random_topk_matches(spark_li, duck_li, k, asc):
    order = F.col("l_extendedprice").asc() if asc else F.col("l_extendedprice").desc()
    got = [
        (r.l_orderkey, r.l_linenumber)
        for r in spark_li.orderBy(order, "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber")
        .limit(k)
        .collect()
    ]
    dir_sql = "ASC" if asc else "DESC"
    want = duck_li.execute(
        f"""SELECT l_orderkey, l_linenumber FROM lineitem
            ORDER BY l_extendedprice {dir_sql}, l_orderkey, l_linenumber LIMIT {k}"""
    ).fetchall()
    assert got == [tuple(w) for w in want]


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    nums=st.lists(
        st.integers(min_value=1, max_value=10**9), min_size=1, max_size=50, unique=True
    ),
    use_exp=st.booleans(),
)
def test_grid_rounded_transcendentals_agree_cross_engine(spark, nums, use_exp):
    """The queries/model.py doctrine: transcendentals are not
    correctly-rounded, so per-row results must be rounded to a coarse
    grid BEFORE summation — this sweep checks Spark's and DuckDB's
    ln/exp agree exactly on the 1e-6 grid over random integer inputs
    (ln of 1..1e9; exp of the matching negative magnitudes)."""
    import duckdb

    con = duckdb.connect()
    if use_exp:
        # exp over [-20, 0): z = -n / 5e7 spans the sigmoid's active range
        spark_vals = (
            spark.createDataFrame([(n,) for n in nums], "n long")
            .select(
                F.expr(
                    "CAST(round(exp(-(CAST(n AS DOUBLE) / 50000000.0)) * 1000000.0)"
                    " AS BIGINT) AS g"
                )
            )
            .collect()
        )
        duck_vals = con.execute(
            "SELECT CAST(round(exp(-(CAST(n AS DOUBLE) / 50000000.0)) * 1000000.0)"
            " AS BIGINT) FROM (SELECT unnest(?) AS n)",
            [nums],
        ).fetchall()
    else:
        spark_vals = (
            spark.createDataFrame([(n,) for n in nums], "n long")
            .select(
                F.expr("CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS g")
            )
            .collect()
        )
        duck_vals = con.execute(
            "SELECT CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)"
            " FROM (SELECT unnest(?) AS n)",
            [nums],
        ).fetchall()
    assert sorted(r[0] for r in spark_vals) == sorted(r[0] for r in duck_vals)
