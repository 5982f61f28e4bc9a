"""Set operations (SURVEY.md §2B "Set operations"; ref seed A8 fan-in
union at MongoDBOplogSource.java:96-107 — the streaming twin lives in
streaming/pipeline.py; these are the batch surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


def _segments(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping customer sets: big spenders vs AUTOMOBILE segment."""
    c = _t(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 6000).select("c_custkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return rich, auto


_RICH = "SELECT c_custkey FROM customer WHERE c_acctbal > 6000"
_AUTO = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"


@query(
    "q40_union_all",
    oracle=f"""
    SELECT c_custkey, count(*) AS n_appearances
    FROM (({_RICH}) UNION ALL ({_AUTO}))
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def q40_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — the fan-in merge, ref A8): customers
    appearing in both sets keep multiplicity 2."""
    rich, auto = _segments(spark, sf_dir)
    return (
        rich.unionByName(auto)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_appearances"))
        .orderBy("c_custkey")
    )


@query(
    "q41_union_distinct",
    oracle=f"SELECT count(*) AS n_union FROM (({_RICH}) UNION ({_AUTO}))",
)
def q41_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics) — dedup after merge."""
    rich, auto = _segments(spark, sf_dir)
    return rich.unionByName(auto).distinct().agg(F.count("*").alias("n_union"))


@query(
    "q42_intersect",
    oracle=f"""
    SELECT c_custkey FROM ({_RICH})
    INTERSECT
    SELECT c_custkey FROM ({_AUTO})
    ORDER BY c_custkey
    """,
)
def q42_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    rich, auto = _segments(spark, sf_dir)
    return rich.intersect(auto).orderBy("c_custkey")


@query(
    "q43_except",
    oracle=f"""
    SELECT c_custkey FROM ({_RICH})
    EXCEPT
    SELECT c_custkey FROM ({_AUTO})
    ORDER BY c_custkey
    """,
)
def q43_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — rich customers outside AUTOMOBILE."""
    rich, auto = _segments(spark, sf_dir)
    return rich.subtract(auto).orderBy("c_custkey")


@query(
    "q44_intersect_all",
    oracle="""
    SELECT l_orderkey FROM (
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT ALL
        SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    )
    ORDER BY l_orderkey
    LIMIT 1000
    """,
)
def q44_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, multiplicity = min of the two)."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    f = li.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    return r.intersectAll(f).orderBy("l_orderkey").limit(1000)


@query(
    "q45_except_all",
    oracle="""
    SELECT l_orderkey FROM (
        SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
    )
    ORDER BY l_orderkey
    LIMIT 1000
    """,
)
def q45_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics, multiplicity subtraction)."""
    li = _t(spark, sf_dir, "lineitem")
    hi = li.filter(F.col("l_quantity") >= 25).select("l_orderkey")
    n = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    return hi.exceptAll(n).orderBy("l_orderkey").limit(1000)
