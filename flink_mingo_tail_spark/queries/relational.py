"""Relational core: filter/project, joins (all variants), aggregations.

Capability closure of SURVEY.md §2B "Projections / filters", "Joins",
"Aggregations". The reference seeds: conjunctive pushed-down filters
(``MongoOplogTailMapper.java:90-98``), projection/envelope
(``ElasticsearchEmbeddedNodeSink.java:60-62``); every join/agg shape is
declared surface with no reference counterpart (SURVEY.md §2A note).

Scale notes (100 TB): filters/projections push to the Parquet scan via
Catalyst; region/nation joins are explicitly broadcast (fixed-size dims);
fact-fact joins (orders⋈lineitem) shuffle on the join key and rely on AQE
skew splitting; every aggregate is partial+final (map-side combine) by
construction of ``groupBy().agg()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.functions.deterministic import davg, dsum, sql_davg, sql_dsum
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Filters / projections
# --------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty', 0)},
           {sql_dsum('l_extendedprice', 'sum_base_price', 2)},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 4)},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 6)},
           {sql_davg('l_quantity', 'avg_qty', 0)},
           {sql_davg('l_extendedprice', 'avg_price', 2)},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → hash-agg (partial+final) → sort.

    Flagship batch aggregate; the groupBy keys have tiny cardinality so
    the shuffle moves only #groups × #partitions rows after map-side
    combine — scale-safe at any SF.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty", 0),
            dsum("l_extendedprice", "sum_base_price", 2),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price", 4),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
                6,
            ),
            davg("l_quantity", "avg_qty", 0),
            davg("l_extendedprice", "avg_price", 2),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_filter_project_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 45 AND l_discount > 0.05
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND l_returnflag <> 'A'
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_quantity, l_returnflag
    LIMIT 100
    """,
)
def q02_filter_project_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter + projection + top-k (ref A3/A5 batch analog).

    Mirrors the reference's pushed-down conjunction
    (MongoOplogTailMapper.java:90-98): every predicate reaches the
    Parquet scan (PushedFilters), projection prunes to 5 of 11 columns,
    and orderBy+limit compiles to TakeOrderedAndProject (no global sort).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 45)
            & (F.col("l_discount") > 0.05)
            & F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
            )
            & (F.col("l_returnflag") != "A")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy(
            F.col("l_extendedprice").desc(),
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_returnflag",
        )
        .limit(100)
    )


@query(
    "q03_isnull_in_between",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(CASE WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 1 END) AS n_mid
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderdate IS NOT NULL
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q03_isnull_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / IS NULL / BETWEEN predicate battery (ref A3 closure)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F") & F.col("o_orderdate").isNotNull())
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count(F.when(F.col("o_totalprice").between(50000, 150000), 1)).alias("n_mid"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "q10_inner_join_agg",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           {sql_dsum('o.o_totalprice', 'revenue', 2)}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q10_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer + agg. Catalyst picks the physical
    join; at 100 TB both sides are large → sort-merge/shuffled-hash on
    the shuffled key, with AQE free to demote to broadcast at small SF."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue", 2))
        .orderBy("c_mktsegment")
    )


@query(
    "q11_broadcast_dim_join",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           {sql_dsum('c.c_acctbal', 'total_acctbal', 2)}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def q11_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two fixed-size dims, explicitly broadcast.

    region/nation are constant-size regardless of SF (25/5 rows), so at
    100 TB the only scan that matters is customer; broadcast removes both
    shuffles entirely (SURVEY.md §2B "broadcast join")."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal", "total_acctbal", 2))
        .orderBy("r_name", "n_name")
    )


@query(
    "q12_left_outer_join",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_orders
    """,
)
def q12_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (TPC-H Q13
    shape): count-of-counts histogram, two-level aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers")).orderBy("n_orders")


@query(
    "q13_right_full_outer",
    oracle="""
    SELECT
      count(*) AS n_rows,
      count(CASE WHEN s.s_suppkey IS NULL THEN 1 END) AS nation_only,
      count(CASE WHEN n.n_nationkey IS NULL THEN 1 END) AS supplier_only
    FROM supplier s FULL OUTER JOIN nation n
      ON s.s_nationkey = n.n_nationkey AND s.s_acctbal > 5000
    """,
)
def q13_right_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with a non-key condition in the ON clause — both
    unmatched sides survive; checks null-extension semantics exactly."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    joined = s.join(n, (s.s_nationkey == n.n_nationkey) & (s.s_acctbal > 5000), "full")
    return joined.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("s_suppkey").isNull(), 1)).alias("nation_only"),
        F.count(F.when(F.col("n_nationkey").isNull(), 1)).alias("supplier_only"),
    )


@query(
    "q14_semi_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          AND o.o_totalprice > 100000
    )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q14_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). Semi joins never duplicate the left side,
    so the shuffle carries customer once regardless of order count."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big_f = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
    return (
        c.join(big_f, c.c_custkey == big_f.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "q15_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c.c_custkey
    """,
)
def q15_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers that never ordered."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q16_cross_theta_join",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a CROSS JOIN nation b
    WHERE a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
    ORDER BY nation_a, nation_b
    """,
)
def q16_cross_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + theta predicate (nested-loop shape) on the fixed-size
    dim — the one join family where a broadcast nested loop is the right
    physical plan at any scale (both sides constant)."""
    n = _t(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.crossJoin(F.broadcast(b))
        .filter((F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (F.col("a.n_name") < F.col("b.n_name")))
        .select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))
        .orderBy("nation_a", "nation_b")
    )


@query(
    "q17_range_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lineitems,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'early_revenue', 4)}
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q17_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: lineitems shipped within 30 days of the order.

    The equi key carries the shuffle (co-partitioned on orderkey); the
    range predicate evaluates post-match, so no nested-loop blowup —
    the scale-correct way to phrase an interval join when an equi key
    exists (pure interval joins are in q18)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.date_add(o.o_orderdate, 30).cast("timestamp"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "early_revenue", 4),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@query(
    "q20_groupby_battery",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {sql_dsum('value', 'total_value', 2)},
           {sql_davg('value', 'avg_value', 2)},
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q20_groupby_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate battery: count/distinct/sum/avg/min/max in one pass
    (distinct agg expands to a two-phase plan automatically)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "total_value", 2),
            davg("value", "avg_value", 2),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q21_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q21_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2B grouping sets family)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q22_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "q23_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS n, grouping(c_mktsegment) AS g_seg,
           grouping(c_nationkey) AS g_nat
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
)
def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers, via SQL (the
    DataFrame API has no grouping-sets verb; Catalyst plan is identical)."""
    prepare_session(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n, grouping(c_mktsegment) AS g_seg,
               grouping(c_nationkey) AS g_nat
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
        """
    )


@query(
    "q24_dedup_batch",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_shipdate
    FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem)
    ORDER BY l_returnflag, l_linestatus, l_shipdate
    LIMIT 500
    """,
)
def q24_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch dropDuplicates (ref A6's batch analog; SURVEY §2B dedup)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_shipdate")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus", "l_shipdate")
        .limit(500)
    )


@query(
    "q25_collect_list_set",
    oracle="""
    SELECT n.n_name,
           array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), ',') AS segments,
           count(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q25_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set aggregation (sorted for determinism — collect order is
    partition-dependent, so normalize with sort_array)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("n_name")
    )


@query(
    "q26_approx_count_distinct",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q26_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). Sketch estimates are engine-specific
    (Spark HLL++ vs DuckDB HLL differ by design), so the raw estimate
    never reaches the hash: the query emits the EXACT counts plus an
    `approx_ok` accuracy gate (estimate within ±5% of exact at rsd=0.01
    — a 5-sigma band) that the oracle asserts as constant TRUE. This
    turns the round-1 `no_oracle` red row into a hash-checked accuracy
    contract."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "n_events",
            "n_users",
            (
                F.abs(F.col("approx_users") - F.col("n_users"))
                <= 0.05 * F.col("n_users")
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


@query(
    "q27_exact_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q27_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (Spark `percentile` == DuckDB
    quantile_cont: both sort and linearly interpolate — deterministic,
    unlike percentile_approx which stays available for the scale path)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("p50_qty"),
            F.percentile("l_extendedprice", 0.9).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q27b_percentile_rank_select",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q27b_percentile_rank_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact percentiles as q27, computed by the continuous-domain
    SCALE path (`operators/percentile.py`): approx-bracket rank
    selection in two distributed hash-agg passes. The built-in is a
    value→count map aggregate — fine on bounded domains, but on
    continuous columns (distinct ≈ n) its per-group final merge is one
    n-sized hash map on one reducer; this path stays partition-parallel
    regardless of cardinality (measured 4.8× faster at 30M distinct
    values, SCALE.md). Bitwise-equal to the built-in (and so to DuckDB
    quantile_cont; see tests/test_percentile.py)."""
    from flink_mingo_tail_spark.operators.percentile import exact_percentiles

    li = _t(spark, sf_dir, "lineitem")
    return exact_percentiles(
        li,
        ["l_returnflag"],
        [("l_quantity", 0.5, "p50_qty"), ("l_extendedprice", 0.9, "p90_price")],
        # 10_000: below every group's size from sf0.01 up (~20k rows per
        # return flag), so the driver's oracle gate exercises the
        # distributed rank-select path — while keeping the collected
        # interior at ~8n/accuracy rows. The earlier accuracy=1000 made
        # the interior grow to ~240k rows/group at the 50x probe and the
        # rank-select lost to the built-in there (SCALE.md round-4 note).
        accuracy=10_000,
    ).orderBy("l_returnflag")


@query(
    "q28_having_scalar_subquery",
    oracle="""
    SELECT c_nationkey, count(*) AS n_rich
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_nationkey
    HAVING count(*) >= 10
    ORDER BY c_nationkey
    """,
)
def q28_having_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + HAVING, in SQL form (Catalyst decorrelates).

    avg() here is only a filter bound (not an output), so cross-engine
    float drift cannot affect the result unless a customer sits within
    1e-12 of the mean — the synthetic data does not."""
    prepare_session(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_rich
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        GROUP BY c_nationkey
        HAVING count(*) >= 10
        ORDER BY c_nationkey
        """
    )


@query(
    "q29_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                AS BIGINT) AS qty_F,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                AS BIGINT) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q29_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list so no extra distinct pass — required
    practice at scale; implicit pivot scans the column twice)."""
    li = _t(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("long")))
        .na.fill(0)
    )
    return pivoted.select(
        "l_returnflag", F.col("F").alias("qty_F"), F.col("O").alias("qty_O")
    ).orderBy("l_returnflag")


@query(
    "q26b_approx_percentile",
    oracle="""
    SELECT l_returnflag, count(*) AS n_items,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q26b_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch) — the constant-memory quantile path
    for 100 TB (exact percentile q27 sorts per group).

    Sketch boundaries are engine-specific, so the raw estimate never
    reaches the hash (and round 1's array-typed `iqr_approx` output
    crashed the driver canonicalizer — arrays are now banned by
    tests/test_output_contract.py). Instead the query verifies the
    sketch's rank-error contract IN-QUERY: for each group, the fraction
    of rows strictly below / at-or-below the estimate must bracket the
    target quantile within ±1% (accuracy=1000 guarantees ±0.1%); the
    oracle asserts the gate columns as constant TRUE."""
    li = _t(spark, sf_dir, "lineitem")
    apx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.25, 1000).alias("a25"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.75, 1000).alias("a75"),
    )
    j = li.select("l_returnflag", "l_extendedprice").join(F.broadcast(apx), "l_returnflag")
    stats = j.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        *[
            agg
            for q, a in ((25, "a25"), (50, "a50"), (75, "a75"))
            for agg in (
                F.sum((F.col("l_extendedprice") < F.col(a)).cast("long")).alias(f"lt{q}"),
                F.sum((F.col("l_extendedprice") <= F.col(a)).cast("long")).alias(f"le{q}"),
            )
        ],
    )
    out = stats.select(
        "l_returnflag",
        "n_items",
        *[
            (
                (F.col(f"lt{q}") <= (q / 100.0 + 0.01) * F.col("n_items"))
                & (F.col(f"le{q}") >= (q / 100.0 - 0.01) * F.col("n_items"))
            ).alias(f"p{q}_ok")
            for q in (25, 50, 75)
        ],
    )
    return out.select("l_returnflag", "n_items", "p25_ok", "p50_ok", "p75_ok").orderBy(
        "l_returnflag"
    )


@query(
    "q19_salted_skew_agg",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           {sql_dsum('l_extendedprice', 'total_price', 2)}
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q19_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (operators/skew.py): the rewrite for
    hot group keys that AQE cannot split (one giant group = one reducer).
    Result is provably identical to the direct aggregate — the oracle IS
    the direct aggregate — while the hot key fans over 16 sub-groups.
    l_returnflag has 3 values over the whole table: exactly the shape
    that melts a reducer at 100 TB without this rewrite."""
    from flink_mingo_tail_spark.operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return salted_agg(
        li.withColumn("__cents", cents),
        keys=["l_returnflag"],
        partial_aggs=[F.count("*").alias("__c"), F.sum("__cents").alias("__s")],
        final_aggs=[
            F.sum("__c").alias("n"),
            (F.sum("__s") / 100.0).alias("total_price"),
        ],
        n_salts=16,
    ).orderBy("l_returnflag")


@query(
    "q18_multiway_join",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 4)},
           count(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q18_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join — two constant dims broadcast, the
    customer⋈orders⋈lineitem fact chain shuffles on its keys (Catalyst
    orders the joins; AQE re-plans at runtime), supplier joined on the
    composite (suppkey, nationkey) for the local-supplier semantics."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q09_correlated_agg_subquery",
    oracle=f"""
    SELECT p.p_brand,
           count(*) AS n_small_orders,
           {sql_dsum('l.l_extendedprice', 'small_order_revenue', 2)}
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE 2 * CAST(round(l.l_quantity * 100) AS BIGINT)
          * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        < (SELECT CAST(sum(CAST(round(l2.l_quantity * 100) AS BIGINT)) AS BIGINT)
           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q09_correlated_agg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery (per-part average
    threshold), in SQL form — Catalyst decorrelates it into an
    aggregate + self-join, the plan a hand-writer would build (§4.4:
    decorrelation is free).

    The threshold `q < 0.5*avg(q)` is evaluated as the exact-integer
    cross-multiplication `2*q_scaled*cnt < sum(q_scaled)` in BOTH
    engines: floats in the predicate flip row membership when a
    quantity lands exactly on the bound (the round-1 q09 hash miss), so
    no division/average ever happens."""
    prepare_session(spark)
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT p.p_brand,
               count(*) AS n_small_orders,
               -- CAST: a bare 100.0 literal is DecimalType in Spark SQL and the
               -- division would surface as decimal128/object in pandas (driver
               -- contract bans it); double/double matches the oracle exactly.
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE)
                   AS small_order_revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE 2 * CAST(round(l.l_quantity * 100) AS BIGINT)
              * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT))
               FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """
    )


@query(
    "q123_salted_skew_join",
    oracle=f"""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 6 THEN 1 ELSE l_suppkey END AS sk,
             l_extendedprice, l_discount
      FROM lineitem
    )
    SELECT s.s_nationkey,
           count(*) AS n_items,
           {sql_dsum('f.l_extendedprice * (1 - f.l_discount)', 'revenue', 4)}
    FROM fact f JOIN supplier s ON s.s_suppkey = f.sk
    GROUP BY s.s_nationkey
    ORDER BY s.s_nationkey
    """,
)
def q123_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted SHUFFLE join under a hot key (operators/skew.
    replicate_small_side) — the companion to q19's salted aggregation.

    The fact side maps 60% of lineitem onto ONE supplier key (the
    synthetic hot key every real fact table has: the null-ish default,
    the house account, the crawler's top domain). A plain shuffle join
    would land 60% of the table on a single reducer — AQE skew-join can
    split the *partition*, but every split still collides on the same
    dim row's hash bucket. The salted rewrite fans the hot key over 16
    sub-keys: the dim side replicates 16×, the fact side picks a
    deterministic-per-row salt, and the join key becomes (sk, salt) —
    uniform by construction. The salt never reaches the output, so the
    result provably equals the unsalted join (the oracle IS the
    unsalted join). `shuffle_hash` hint: at 100 TB the dim side is
    past the broadcast threshold (where salting would be moot).

    Scale: dim replication costs 16×|supplier| rows — still tiny vs the
    fact side; the post-join aggregate is partial+final on 25 nation
    keys, itself salted-safe because the combine is map-side."""
    from flink_mingo_tail_spark.operators.skew import replicate_small_side

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 6, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("sk"),
        "l_extendedprice",
        "l_discount",
    )
    dim = supp.select(F.col("s_suppkey").alias("sk"), "s_nationkey")
    big, small, join_keys = replicate_small_side(fact, dim, "sk", n_salts=16)
    return (
        big.join(small.hint("shuffle_hash"), join_keys)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4),
        )
        .orderBy("s_nationkey")
    )


@query(
    "q136_unpivot_nation_metrics",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, count(*) AS n_customers,
             sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS customer_bal
      FROM customer GROUP BY 1
    ), s AS (
      SELECT s_nationkey AS nk, count(*) AS n_suppliers,
             sum(CAST(round(s_acctbal * 100) AS BIGINT)) / 100.0 AS supplier_bal
      FROM supplier GROUP BY 1
    ), wide AS (
      SELECT n.n_name,
             CAST(coalesce(c.n_customers, 0) AS DOUBLE) AS n_customers,
             CAST(coalesce(s.n_suppliers, 0) AS DOUBLE) AS n_suppliers,
             coalesce(c.customer_bal, 0.0) AS customer_bal,
             coalesce(s.supplier_bal, 0.0) AS supplier_bal
      FROM nation n
      LEFT JOIN c ON c.nk = n.n_nationkey
      LEFT JOIN s ON s.nk = n.n_nationkey
    )
    SELECT n_name, 'n_customers'  AS metric, n_customers  AS value FROM wide
    UNION ALL
    SELECT n_name, 'n_suppliers'  AS metric, n_suppliers  AS value FROM wide
    UNION ALL
    SELECT n_name, 'customer_bal' AS metric, customer_bal AS value FROM wide
    UNION ALL
    SELECT n_name, 'supplier_bal' AS metric, supplier_bal AS value FROM wide
    ORDER BY n_name, metric
    """,
)
def q136_unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape with the NATIVE ``DataFrame.unpivot`` API
    (SQL UNPIVOT / melt) — the typed counterpart of q88's ``stack()``
    expression form, here over a multi-table wide aggregate (customer +
    supplier metrics joined onto the nation dim) rather than a single
    pivot's output. The unpivot itself is a narrow
    per-row expansion (Catalyst `Expand` node — no shuffle, no extra
    scan); the only shuffles are the two upstream aggregates, and the
    nation dim joins stay broadcast. The oracle spells the honest
    ANSI form (one UNION ALL arm per metric); values are exact
    scaled-long sums and counts cast to double, so both engines
    hash-match bit-for-bit."""
    n = _t(spark, sf_dir, "nation")
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal", "customer_bal"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"), dsum("s_acctbal", "supplier_bal"))
    )
    wide = (
        n.join(F.broadcast(c), n.n_nationkey == c.nk, "left")
        .join(F.broadcast(s), n.n_nationkey == s.nk, "left")
        .select(
            "n_name",
            F.coalesce(F.col("n_customers").cast("double"), F.lit(0.0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers").cast("double"), F.lit(0.0)).alias("n_suppliers"),
            F.coalesce("customer_bal", F.lit(0.0)).alias("customer_bal"),
            F.coalesce("supplier_bal", F.lit(0.0)).alias("supplier_bal"),
        )
    )
    return wide.unpivot(
        ["n_name"],
        ["n_customers", "n_suppliers", "customer_bal", "supplier_bal"],
        "metric",
        "value",
    ).orderBy("n_name", "metric")


_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.n_customers
FROM region r,
LATERAL (
  SELECT n.n_name, count(*) AS n_customers
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n_name
  LIMIT 2
) t
ORDER BY r_name, n_customers DESC, n_name
"""


@query("q142_lateral_topk_per_region", oracle=_LATERAL_SQL)
def q142_lateral_topk_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL table subquery (SQL:1999 / Spark 3.2+): for
    each region, the top-2 nations by customer count — the declarative
    spelling of per-group top-k. Catalyst DECORRELATES the lateral into
    a join + window under the hood (no per-outer-row re-execution, which
    is what a naive lateral would cost at 100 TB); the same text runs
    verbatim on DuckDB, making this the strongest cross-engine parity
    row in the join family — identical SQL, independent planners."""
    prepare_session(spark)
    for t in ("region", "nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


@query(
    "q143_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT nullif(c_mktsegment, 'BUILDING') AS seg, count(*) AS n_a
      FROM customer GROUP BY 1
    ), b AS (
      SELECT nullif(c_mktsegment, 'MACHINERY') AS seg, count(*) AS n_b
      FROM customer GROUP BY 1
    )
    SELECT a.seg, a.n_a, b.n_b
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    ORDER BY a.seg
    """,
)
def q143_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing — the semantics CDC and
    entity-resolution joins need when the key is legitimately absent
    (a plain equi-join silently drops every NULL-keyed row, the classic
    reconciliation bug). Physically `<=>` still hashes like an
    equi-key, so the join stays a hash join, NOT a nested loop — the
    NULL bucket hashes to one partition, which is also the scale
    caveat: a mostly-NULL key needs the salting treatment (q123)."""
    prepare_session(spark)
    c = load_table(spark, sf_dir, "customer")
    a = c.groupBy(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")).agg(
        F.count("*").alias("n_a")
    )
    b = c.groupBy(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg")).agg(
        F.count("*").alias("n_b")
    )
    return (
        a.join(b, a.seg.eqNullSafe(b.seg))
        .select(a.seg, "n_a", "n_b")
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q173 — PIVOT (wide conditional-aggregation report)
# ---------------------------------------------------------------------------


@query(
    "q173_pivot_report",
    oracle="""
    WITH t AS (
      SELECT l_returnflag AS flag, l_linestatus AS status,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev
      FROM lineitem
    )
    SELECT flag,
           CAST(sum(rev) FILTER (WHERE status = 'F') AS BIGINT) AS rev_f,
           CAST(sum(rev) FILTER (WHERE status = 'O') AS BIGINT) AS rev_o,
           CAST(count(*) FILTER (WHERE status = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE status = 'O') AS BIGINT) AS n_o
    FROM t GROUP BY flag
    ORDER BY flag
    """,
)
def q173_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: rotate the l_linestatus dimension into columns
    (``DataFrame.pivot`` with an EXPLICIT value list — the declared-
    surface operator q88/q136's unpivot reverses). Revenue enters as an
    exact 1e4-scaled long so sums are order-independent.

    Scale: pivot with explicit values compiles to ONE hash aggregate
    whose buffer holds |values| x |aggs| slots — same single-shuffle
    shape as the FILTER-clause spelling the oracle uses (and what
    Catalyst rewrites pivot into); omitting the value list would add a
    distinct-scan of the pivot column first, which is why the explicit
    list is the 100-TB form.
    """
    prepare_session(spark)
    li = _t(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("rev"),
    )
    p = (
        t.groupBy("flag")
        .pivot("status", ["F", "O"])
        .agg(F.sum("rev").alias("rev"), F.count(F.lit(1)).alias("n"))
    )
    # pivot names columns {value}_{aggalias}; project to the oracle's names
    return p.select(
        "flag",
        F.col("F_rev").alias("rev_f"),
        F.col("O_rev").alias("rev_o"),
        F.col("F_n").alias("n_f"),
        F.col("O_n").alias("n_o"),
    ).orderBy("flag")
