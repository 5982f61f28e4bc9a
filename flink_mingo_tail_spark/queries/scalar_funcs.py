"""Scalar function batteries: string / date / math / array / map / json /
conditional (SURVEY.md §2B "Scalar functions"; ref-domain seed: opaque
JSON payload access, SURVEY §1.2-§1.3).

All expressions are JVM built-ins (whole-stage codegen) — no Python UDFs
anywhere in this module. Each battery picks functions whose semantics are
identical in Spark and DuckDB so the oracle hash matches exactly; where
the engines' spellings differ (e.g. get_json_object vs json_extract_string)
the oracle uses DuckDB's spelling of the same ANSI semantics.
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


@query(
    "q50_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           length(p_name) AS name_len,
           substr(p_name, 1, 8) AS name_prefix,
           concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           trim(p_name) AS name_trim,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           replace(p_type, ' ', '_') AS type_snake,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green,
           strpos(p_name, 'a') AS first_a
    FROM part
    ORDER BY p_partkey
    LIMIT 1000
    """,
)
def q50_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery: upper/lower/length/substr/concat/trim/lpad/replace/
    LIKE/instr — all codegen'd, all ANSI-identical across engines."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias("brand_size"),
            F.trim(F.col("p_name")).alias("name_trim"),
            F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("is_green"),
            F.instr(F.col("p_name"), "a").alias("first_a"),
        )
        .orderBy("p_partkey")
        .limit(1000)
    )


@query(
    "q51_regex_split",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           len(string_split(p_name, ' ')) AS n_words,
           string_split(p_name, ' ')[1] AS word1
    FROM part
    WHERE regexp_matches(p_name, '^[a-z]')
    ORDER BY p_partkey
    LIMIT 1000
    """,
)
def q51_regex_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + split battery. Spark regexp_replace is global by default
    (DuckDB needs the 'g' flag for the same semantics); split() here uses
    a literal separator so both engines tokenize identically."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").rlike("^[a-z]"))
        .select(
            "p_partkey",
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
            F.size(F.split("p_name", " ", -1)).alias("n_words"),
            F.split("p_name", " ", -1).getItem(0).alias("word1"),
        )
        .orderBy("p_partkey")
        .limit(1000)
    )


@query(
    "q52_date_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           dayofweek(o_orderdate) + 1 AS order_dow,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(CAST(o_orderdate + INTERVAL 90 DAY AS DATE), '%Y-%m-%d') AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def q52_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery. DuckDB dayofweek is 0=Sunday while Spark's is
    1=Sunday — the oracle adds 1 to align. DATE-typed outputs are
    formatted as ISO strings: pandas exports of DATE differ between
    engines (midnight timestamp vs date object), which would break the
    value hash even though the dates are equal."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofweek("o_orderdate").alias("order_dow"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.date_format(F.date_add(F.to_date("o_orderdate"), 90), "yyyy-MM-dd").alias("due_date"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_epoch_start"
            ),
            F.unix_timestamp("o_orderdate").alias("unix_ts"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "q53_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100 / 7) AS BIGINT) AS price_div7_c,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           abs(l_quantity - 25) AS qty_dev,
           CAST(pow(l_quantity, 2) AS DOUBLE) AS qty_sq,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
           CAST(sign(l_quantity - 25.0) AS BIGINT) AS qty_sign,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_discount, l_tax
    LIMIT 1000
    """,
)
def q53_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery. Driver-contract hardening (round 2):

    - (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
      (~20% duplicate pairs), so the LIMIT cutoff needs a total order —
      every raw input column that feeds an output joins the sort key;
      remaining ties are fully identical rows, so membership at the
      boundary is engine-independent.
    - floor/ceil/sign return DOUBLE/TINYINT in DuckDB's pandas export vs
      Spark's LongType — both sides cast to BIGINT.
    - round(x/7, 2) is replaced by a scaled-long hundredths quotient:
      cents/7 has fractional part k/7 (never .5), so HALF_UP (Spark)
      vs round-half-even (DuckDB nearbyint) can never disagree.
    - sqrt is IEEE-correctly-rounded in both engines; ln agrees to
      <=1 ulp, and 6dp rounding puts the disagreement window ~1e-15 of
      a 1e-6 boundary — collision-safe."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100 / 7, 0).cast("long").alias("price_div7_c"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
            F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            F.pow("l_quantity", 2).alias("qty_sq"),
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
            (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
            F.signum(F.col("l_quantity") - 25.0).cast("long").alias("qty_sign"),
            F.greatest("l_tax", "l_discount").alias("max_rate"),
            F.least("l_tax", "l_discount").alias("min_rate"),
            "l_extendedprice", "l_quantity", "l_discount", "l_tax",
        )
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity",
                 "l_discount", "l_tax")
        .limit(1000)
        .drop("l_extendedprice", "l_quantity", "l_discount", "l_tax")
    )


@query(
    "q54_array_funcs",
    oracle="""
    SELECT doc_id,
           tokens[1] AS first_token,
           len(tokens) AS n_tokens,
           len(list_distinct(tokens)) AS n_distinct_tokens,
           list_contains(tokens, 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(tokens))[1:5], ',') AS first5_sorted,
           list_sort(list_transform(list_distinct(tokens), t -> upper(t)))[1] AS first_upper
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
    ORDER BY doc_id
    LIMIT 400
    """,
)
def q54_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery over tokenized documents: element access, size,
    distinct, contains, slice, sort, and a lambda transform — all native
    Catalyst array expressions (no UDF; SURVEY §2B array family)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ", -1).alias("tokens"))
    return (
        toks.select(
            "doc_id",
            F.col("tokens").getItem(0).alias("first_token"),
            F.size("tokens").alias("n_tokens"),
            F.size(F.array_distinct("tokens")).alias("n_distinct_tokens"),
            F.array_contains("tokens", "spark").alias("has_spark"),
            F.array_join(F.slice(F.sort_array(F.array_distinct("tokens")), 1, 5), ",").alias("first5_sorted"),
            F.sort_array(F.transform(F.array_distinct("tokens"), lambda t: F.upper(t)))
            .getItem(0)
            .alias("first_upper"),
        )
        .orderBy("doc_id")
        .limit(400)
    )


@query(
    "q55_explode_posexplode",
    oracle="""
    SELECT t.token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    WHERE t.token <> ''
    GROUP BY t.token
    ORDER BY n DESC, t.token
    LIMIT 50
    """,
)
def q55_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → term frequency (the array-to-rows lateral pattern)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ", -1)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(50)
    )


@query(
    "q56_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           json_valid(props) AS is_valid
    FROM events
    ORDER BY event_id
    LIMIT 2000
    """,
)
def q56_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload access (ref §1.2: the oplog's `o`/`o2` documents are
    carried as JSON strings; get_json_object is the pushdown-friendly
    accessor for dynamic payloads, SURVEY §1.3)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
            # Tri-state to mirror DuckDB's json_valid: NULL input => NULL,
            # not false (the two engines otherwise disagree on NULL props).
            F.when(F.col("props").isNull(), F.lit(None).cast("boolean"))
            .otherwise(F.get_json_object("props", "$").isNotNull())
            .alias("is_valid"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


@query(
    "q57_map_funcs",
    oracle="""
    SELECT event_type,
           map_extract(map {'click': 1, 'view': 2, 'purchase': 3, 'signup': 4, 'error': 5},
                       event_type)[1] AS type_code,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q57_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at lookup (SURVEY §2B map family)."""
    e = _t(spark, sf_dir, "events")
    code_map = F.create_map(
        F.lit("click"), F.lit(1),
        F.lit("view"), F.lit(2),
        F.lit("purchase"), F.lit(3),
        F.lit("signup"), F.lit(4),
        F.lit("error"), F.lit(5),
    )
    return (
        e.select("event_type", F.element_at(code_map, F.col("event_type")).alias("type_code"))
        .groupBy("event_type", "type_code")
        .agg(F.count("*").alias("n"))
        .select("event_type", "type_code", "n")
        .orderBy("event_type")
    )


@query(
    "q58_conditional_null",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END AS urgent_price
    FROM orders
    ORDER BY o_orderkey
    LIMIT 2000
    """,
)
def q58_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif battery."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "big")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("small")
            .alias("bucket"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
                "status_norm"
            ),
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).alias(
                "urgent_price"
            ),
        )
        .orderBy("o_orderkey")
        .limit(2000)
    )


@query(
    "q59_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    ORDER BY doc_id
    LIMIT 400
    """,
)
def q59_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash parity (md5/sha2 are bit-identical across
    engines — the foundation for the dedup family in queries/dedup.py)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2("text", 256).alias("text_sha256"),
        )
        .orderBy("doc_id")
        .limit(400)
    )


@query(
    "q84_levenshtein_datediff",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, p_type) AS brand_type_dist,
           levenshtein(p_name, reverse(p_name)) AS palindrome_dist
    FROM part
    WHERE p_size > 40
    ORDER BY p_partkey
    LIMIT 500
    """,
)
def q84_levenshtein_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance battery (levenshtein is ANSI-identical across
    engines; the fuzzy-matching primitive under record linkage)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_size") > 40)
        .select(
            "p_partkey",
            F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
            F.levenshtein("p_name", F.reverse(F.col("p_name"))).alias("palindrome_dist"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@query(
    "q85_months_between",
    oracle="""
    SELECT o_orderkey,
           date_diff('month', date_trunc('month', TIMESTAMP '1995-01-01'),
                     date_trunc('month', o_orderdate)) AS months_since_start
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def q85_months_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month arithmetic. Spark months_between over month-truncated dates
    is integer-valued, matching DuckDB's date_diff('month') exactly (raw
    months_between uses 31-day fractions no other engine reproduces)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")),
                F.date_trunc("month", F.lit("1995-01-01").cast("timestamp")),
            )
            .cast("long")
            .alias("months_since_start"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "q86_json_struct_access",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, 'k') AS BIGINT) AS k_typed,
           CAST(json_extract_string(props, 'k') AS BIGINT) % 10 AS k_bucket,
           json_extract_string(props, 'missing') AS absent_field
    FROM events
    WHERE CAST(json_extract_string(props, 'k') AS BIGINT) >= 50
    ORDER BY event_id
    LIMIT 1000
    """,
)
def q86_json_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON payload access via from_json (schema projection of a
    dynamic document — the §1.3 pattern for the oplog's `o` payloads),
    plus missing-field null semantics."""
    e = _t(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k bigint, missing string"))
    return (
        parsed.filter(F.col("p.k") >= 50)
        .select(
            "event_id",
            F.col("p.k").alias("k_typed"),
            (F.col("p.k") % 10).alias("k_bucket"),
            F.col("p.missing").alias("absent_field"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


@query(
    "q87_subquery_in_exists",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n
    FROM customer c
    WHERE c.c_nationkey IN (
            SELECT n.n_nationkey FROM nation n
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('ASIA', 'EUROPE'))
      AND EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q87_subquery_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + correlated EXISTS subqueries in SQL form — Catalyst rewrites
    both to semi-joins (decorrelation is free, SURVEY §4.4)."""
    prepare_session(spark)
    for t in ("customer", "nation", "region", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n
        FROM customer c
        WHERE c.c_nationkey IN (
                SELECT n.n_nationkey FROM nation n
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name IN ('ASIA', 'EUROPE'))
          AND EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


@query(
    "q88_unpivot",
    oracle="""
    WITH pivoted AS (
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS qty_F,
               CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS qty_O
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'F' AS linestatus, qty_F AS qty FROM pivoted
    UNION ALL
    SELECT l_returnflag, 'O' AS linestatus, qty_O AS qty FROM pivoted
    ORDER BY l_returnflag, linestatus
    """,
)
def q88_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack() — wide-to-long reshaping (inverse of q29)."""
    li = _t(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("long")))
        .na.fill(0)
    )
    return (
        pivoted.select(
            "l_returnflag",
            F.expr("stack(2, 'F', F, 'O', O) AS (linestatus, qty)"),
        )
        .select("l_returnflag", "linestatus", "qty")
        .orderBy("l_returnflag", "linestatus")
    )


@query(
    "q89_distinct_agg_minby_maxby",
    oracle="""
    SELECT o_orderpriority,
           sum(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_distinct_price,
           arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey)
               AS biggest_order,
           arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey)
               AS smallest_order
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q89_distinct_agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(DISTINCT) and min_by/max_by (arg-extremum) aggregates. The
    ranking key embeds the orderkey so ties are impossible — max_by on a
    tied key is engine-arbitrary otherwise."""
    o = _t(spark, sf_dir, "orders")
    rank_key = F.round(F.col("o_totalprice") * 100, 0).cast("long") * 1000000 + F.col("o_orderkey")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            (
                F.sum_distinct(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0
            ).alias("sum_distinct_price"),
            F.max_by("o_orderkey", rank_key).alias("biggest_order"),
            F.min_by("o_orderkey", rank_key).alias("smallest_order"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q133_variant_shredding",
    oracle="""
    WITH v AS (
      SELECT event_type,
             props,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_over_50
    FROM v
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q133_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via the Spark 4 VARIANT type: the JSON
    payload column is parsed ONCE (`try_parse_json` → binary variant
    encoding) and every field extraction is a typed `variant_get` over
    that encoding — versus q56's `get_json_object`, which re-parses the
    JSON string per extracted field. At 100 TB with wide payloads and
    many extractions, parse-once is the difference between one and N
    string-parse passes; variant is also the shredding-friendly format
    (columnar field extraction at the scan in Spark 4 parquet).

    The DuckDB oracle extracts the same typed fields from the raw JSON
    — integer aggregates only, so the comparison is exact."""
    prepare_session(spark)
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        "props",
        F.variant_get(F.try_parse_json("props"), "$.k", "long").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("props").isNull().cast("int")).alias("n_null_props"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum((F.col("k") > 50).cast("int")).alias("n_k_over_50"),
        )
        .orderBy("event_type")
    )


@query(
    "q144_try_arithmetic",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
           CAST(sum(CASE WHEN l_linenumber % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           CAST(sum(CASE WHEN l_linenumber % 2 = 0 THEN l_linenumber END) AS BIGINT)
               AS parsed_sum
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q144_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe expression family: the engine runs with
    `spark.sql.ansi.enabled=true` (strict overflow/cast/division
    errors, pinned in prepare_session), so fallible arithmetic must go
    through the `try_*` forms — `try_divide` yields NULL on zero
    denominators instead of failing the job, `try_cast` yields NULL on
    malformed input. At 100 TB this is the difference between one bad
    row killing a 10-hour job and a countable NULL column. The query
    counts the NULL outcomes (exact integers; the raw ratio doubles
    never reach the hash): division by (l_quantity - 25) nulls exactly
    the quantity-25 rows, and try_cast parses only the even-linenumber
    branch that holds a numeric string. The oracle spells the same
    outcomes with portable CASE guards."""
    li = _t(spark, sf_dir, "lineitem")
    probed = li.select(
        "l_returnflag",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias("ratio"),
        F.when(F.col("l_linenumber") % 2 == 0, F.col("l_linenumber").cast("string"))
        .otherwise(F.col("l_returnflag"))
        .try_cast("int")
        .alias("parsed"),
    )
    return (
        probed.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("ratio").isNull().cast("long")).alias("n_div_null"),
            F.sum(F.col("parsed").isNotNull().cast("long")).alias("n_parsed"),
            F.sum("parsed").alias("parsed_sum"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q166_higher_order_funcs",
    oracle="""
    WITH a AS (
      SELECT l_orderkey,
             list_sort(list(CAST(round(l_quantity * 100) AS BIGINT))) AS arr
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(arr) AS n_items,
           CAST(list_reduce(arr, (acc, x) -> acc + x) AS BIGINT) AS total_q100,
           CAST(coalesce(list_max(list_transform(list_zip(arr[2:], arr[:len(arr)-1]),
                p -> p[1] - p[2])), 0) AS BIGINT) AS max_gap_q100,
           len(list_filter(arr, x -> x % 200 = 0)) AS n_even_units,
           len(list_filter(arr, x -> x > 4000)) > 0 AS any_above_40,
           len(list_filter(arr, x -> x <= 0)) = 0 AS all_positive
    FROM a
    ORDER BY l_orderkey
    """,
)
def q166_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-lambda battery over each order's sorted
    quantity list: aggregate (fold), zip_with over shifted slices
    (adjacent gaps), filter, exists, forall — all JVM array lambdas
    inside one codegen'd projection, zero Python.

    The list is sort_array(collect_list(...)) so its order — and
    therefore the fold and the adjacent-gap zip — is deterministic
    under any partitioning; quantities are exact v100 longs. DuckDB
    spells exists/forall as len(list_filter(...)) comparisons and the
    shifted zip as arr[2:] x arr[:n-1] (1-based slices); semantics are
    identical.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.round(F.col("l_quantity") * 100, 0).cast("long").alias("q100")
    )
    a = li.groupBy("l_orderkey").agg(F.sort_array(F.collect_list("q100")).alias("arr"))
    gaps = F.zip_with(
        F.expr("slice(arr, 2, size(arr) - 1)"),
        F.expr("slice(arr, 1, size(arr) - 1)"),
        lambda hi, lo: hi - lo,
    )
    return (
        a.select(
            "l_orderkey",
            F.size("arr").alias("n_items"),
            F.aggregate("arr", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
                "total_q100"
            ),
            F.coalesce(F.array_max(gaps), F.lit(0)).cast("long").alias("max_gap_q100"),
            F.size(F.filter("arr", lambda x: x % 200 == 0)).alias("n_even_units"),
            F.exists("arr", lambda x: x > 4000).alias("any_above_40"),
            F.forall("arr", lambda x: x > 0).alias("all_positive"),
        )
        .orderBy("l_orderkey")
    )
