"""Advanced batch operators: Pareto frontier, blocked fuzzy join,
Z-order layout (north-star extension).

Three operator families a 100 TB lakehouse needs that have no built-in
Spark primitive — each expressed as a composition of DataFrame ops whose
physical plan survives scale-up (no cross joins, no global single-task
windows over unbounded input):

* skyline / Pareto frontier — multi-objective filtering (the shape of a
  "best quality per length budget" training-data cut);
* edit-distance self-join with exact neighborhood blocking — entity
  resolution without the quadratic candidate explosion;
* Z-order (Morton) clustering keys — multi-dimensional data-skipping
  layout for the write path.

All arithmetic is integer-only (µs/day indexes, price cents, bit
interleaving via `&`/`|`/`*` — identical in any engine), so the driver's
value-hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table

_US_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# q110 — Pareto frontier (skyline): most-recent-and-cheapest orders
# ---------------------------------------------------------------------------

@query(
    "q110_pareto_frontier",
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey,
             epoch_us(o_orderdate) // {_US_DAY} AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), w AS (
      SELECT *,
             MIN(cents) OVER (ORDER BY day
                              RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS min_later,
             MIN(cents) OVER (PARTITION BY day) AS day_min
      FROM t
    )
    SELECT day, cents, o_orderkey
    FROM w
    WHERE (min_later IS NULL OR cents < min_later) AND cents = day_min
    ORDER BY day, o_orderkey
    """,
)
def q110_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline: orders not dominated on (recency↑, price↓) — r is out iff
    a strictly later order is at most as expensive, or a same-day order
    is strictly cheaper.

    Scale shape: the oracle's single `MIN OVER (ORDER BY day)` is a
    one-task window — fine for DuckDB, a scale-killer for Spark — so the
    Spark plan decomposes the suffix-min into two bounded levels:

    * per-bucket (day DIV 32): a `rangeBetween(1 FOLLOWING, ∞)` window
      PARTITIONED by bucket — parallel in the buckets;
    * cross-bucket: suffix-min over the per-bucket minima — a
      single-task window, but over |buckets| rows (aggregate output,
      ~day-range/32), never over order volume — then broadcast back.

    A row survives iff it beats `least(both levels)` and its day's min.
    Same two-level trick as the gap-fill spine (q107): every unbounded
    sequential dependency runs on pre-aggregated, calendar-bounded data.
    """
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        # o_orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC so the
        # cast is lossless and matches DuckDB's naive epoch_us exactly
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV {_US_DAY}").alias("day"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    ).withColumn("bucket", F.expr("day DIV 32"))

    # level 1: within-bucket suffix-min over strictly later days (parallel)
    in_bucket = Window.partitionBy("bucket").orderBy("day").rangeBetween(1, Window.unboundedFollowing)
    # level 2: cross-bucket suffix-min over the tiny per-bucket aggregate
    bucket_min = t.groupBy("bucket").agg(F.min("cents").alias("bmin"))
    later_buckets = (
        Window.orderBy("bucket").rowsBetween(1, Window.unboundedFollowing)
    )  # |buckets| rows only
    bucket_suffix = bucket_min.withColumn("later_bucket_min", F.min("bmin").over(later_buckets)).select(
        "bucket", "later_bucket_min"
    )

    day_min = Window.partitionBy("day")
    w = (
        t.join(F.broadcast(bucket_suffix), "bucket")
        # F.least skips NULLs (returns the least non-null operand), so this
        # is NULL only when no later row exists in either level.
        .withColumn("min_later", F.least(F.min("cents").over(in_bucket), F.col("later_bucket_min")))
        .withColumn("day_min", F.min("cents").over(day_min))
    )
    return (
        w.filter(F.col("min_later").isNull() | (F.col("cents") < F.col("min_later")))
        .filter(F.col("cents") == F.col("day_min"))
        .select("day", "cents", "o_orderkey")
        .orderBy("day", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q111 — edit-distance self-join with exact neighborhood blocking
# ---------------------------------------------------------------------------

_NAME_DIGITS = 9  # c_name = 'Customer#' + 9 digits, fixed length


@query(
    "q111_fuzzy_name_join",
    oracle="""
    WITH p AS (
      SELECT c1.c_custkey AS k1, c2.c_custkey AS k2
      FROM customer c1 JOIN customer c2
        ON c1.c_custkey <> c2.c_custkey
       AND length(c1.c_name) = length(c2.c_name)
       AND levenshtein(c1.c_name, c2.c_name) <= 1
    )
    SELECT k1 AS c_custkey,
           COUNT(*) AS n_similar,
           CAST(SUM(k2) AS BIGINT) AS sim_key_sum
    FROM p
    GROUP BY k1
    ORDER BY c_custkey
    """,
)
def q111_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join: customers whose names are within edit distance 1,
    found WITHOUT a quadratic candidate step.

    Blocking is the substitution-neighborhood (SymSpell-style) scheme:
    for fixed-length strings, distance ≤ 1 means exactly one position
    differs, so each name emits 9 masked variants (one digit position
    wildcarded) and a true pair collides on EXACTLY ONE mask — the
    blocked equi-join is exact (no recall loss) and needs no pair dedup.

    Scale shape: candidate blocks are bounded by the alphabet (≤ 10
    names share a mask regardless of data volume — perfectly skew-free
    join keys), vs the pigeonhole-halves alternative whose block sizes
    track key-prefix density. The 9× key expansion is of a (key, name)
    projection only. The levenshtein filter is a JVM scalar on the
    (tiny) candidate set.
    """
    prepare_session(spark)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    masks = F.array(
        *[
            F.concat(
                F.substring("c_name", 1, 9 + i),
                F.lit("*"),
                F.substring("c_name", 9 + i + 2, _NAME_DIGITS - i - 1),
            )
            for i in range(_NAME_DIGITS)
        ]
    )
    e = c.select("c_custkey", "c_name", F.explode(masks).alias("mask"))
    left = e.select(
        F.col("c_custkey").alias("k1"), F.col("c_name").alias("n1"), "mask"
    )
    right = e.select(
        F.col("c_custkey").alias("k2"), F.col("c_name").alias("n2"), "mask"
    )
    pairs = (
        left.join(right, "mask")
        .filter(F.col("k1") != F.col("k2"))
        .filter(F.length("n1") == F.length("n2"))
        .filter(F.levenshtein("n1", "n2") <= 1)
    )
    return (
        pairs.groupBy(F.col("k1").alias("c_custkey"))
        .agg(F.count("*").alias("n_similar"), F.sum("k2").alias("sim_key_sum"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q112 — Z-order (Morton) clustering keys
# ---------------------------------------------------------------------------

# the bit interleave is shared with the zone-map skip measurement
# (operators/zonemap.py) so the write path, the q112 profile, and the
# file-skipping evidence use ONE definition
from flink_mingo_tail_spark.operators.zonemap import morton_sql as _morton_sql


_MORTON = _morton_sql("o_custkey", "unix_micros_day")


@query(
    "q112_zorder_layout",
    oracle=f"""
    WITH t AS (
      SELECT o_custkey, epoch_us(o_orderdate) // {_US_DAY} AS unix_micros_day
      FROM orders
    ), m AS (
      SELECT o_custkey, unix_micros_day, {_MORTON} AS morton FROM t
    )
    SELECT morton // 65536 AS z_range,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_custkey) AS custkey_lo, MAX(o_custkey) AS custkey_hi,
           MIN(unix_micros_day) AS day_lo, MAX(unix_micros_day) AS day_hi
    FROM m
    GROUP BY z_range
    ORDER BY z_range
    """,
)
def q112_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering: interleave (customer, order-day) bits into a
    Morton code and profile each 2^16-wide code range — the locality
    evidence (each range spans a narrow custkey × day rectangle) that
    makes Morton the right write-layout sort key for two-dimensional
    data skipping.

    Production write path this query validates::

        df.withColumn("z", F.expr(morton_sql))
          .repartitionByRange(N, "z").sortWithinPartitions("z")
          .write.parquet(...)

    — after which min/max parquet footers prune on BOTH dimensions for
    rectangle predicates, not just the leading sort column. The bit
    interleave is `&`/`|`/`*`-only (no engine-specific shift builtins),
    one codegen'd projection; the range profile is a partial+final agg
    over 256 groups.
    """
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_custkey",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV {_US_DAY}").alias("unix_micros_day"),
    )
    m = t.withColumn("morton", F.expr(_morton_sql("o_custkey", "unix_micros_day")))
    return (
        m.groupBy(F.expr("morton DIV 65536").alias("z_range"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_custkey").alias("custkey_lo"),
            F.max("o_custkey").alias("custkey_hi"),
            F.min("unix_micros_day").alias("day_lo"),
            F.max("unix_micros_day").alias("day_hi"),
        )
        .orderBy("z_range")
    )


# ---------------------------------------------------------------------------
# q140 — edit-distance near-pairs with brand + length-band blocking
# ---------------------------------------------------------------------------

_LEV_MAX = 1  # unit-cost edit distance threshold for "near"
_LEV_PREFIX = 2 * _LEV_MAX + 1  # q*t+1 rarest bigrams per name (q=2)


@query(
    "q140_levenshtein_pairs",
    oracle=f"""
    SELECT a.p_partkey AS p1, b.p_partkey AS p2,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= {_LEV_MAX}
    WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
    ORDER BY p1, p2
    """,
)
def q140_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate pairs over part names using the
    built-in ``levenshtein`` (JVM-side, codegen) with its THRESHOLD
    argument — the banded O(t*n) early-exit form, not the full O(n^2)
    DP.

    Candidate generation (round-5 rewrite) is ED-Join-style PREFIX
    FILTERING, sound for distance <= t: one edit changes at most q
    bigrams, so two names within distance 1 must share at least one of
    the q*t+1 = 3 bigrams that are RAREST under a single global
    frequency order. Candidates are therefore an equi-join on
    (brand, length-key, prefix-bigram) — brand because the pair
    definition requires it, a +-1 length-key (emitted 3x on one side)
    because distance <= t implies a length gap <= t, and the prefix
    bigram to bound block sizes by gram rarity. The earlier
    brand+length-band-only blocking measured 61.6 s at the 10x probe
    (25 brands -> per-brand blocks grow linearly with copies, pairs
    quadratically); the prefix join keeps every block tiny.

    SOUNDNESS PRECONDITION: the ED-Join count bound |shared grams| >=
    max(|GA|,|GB|) - q*t is vacuous when the larger distinct-bigram set
    has <= q*t grams — e.g. 'ab' vs 'ac' are distance 1 yet share ZERO
    bigrams, and length-1 names have no bigrams at all. Such names
    (size(grams) <= q*t: every name shorter than q*t+2 chars, plus
    degenerate repetitive ones like 'ababab') are routed through a
    separate brand+length-band block joined all-pairs — the set of
    strings with <= 2 distinct bigrams is alphabet-bounded and tiny on
    any corpus, so the quadratic block is safe. Mixed pairs (one short,
    one long) keep max(|GA|,|GB|) >= q*t+1, where the q*t+1-prefix join
    is sound on both sides (prefix length needed on the smaller side is
    |GA| - max + q*t + 1 <= q*t+1). The oracle is the unblocked brute
    join, so the driver hash check IS the soundness proof: a lost pair
    would hash-mismatch."""
    prepare_session(spark)
    p = load_table(spark, sf_dir, "part")
    base = p.select(
        F.col("p_partkey").alias("pk"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name"),
        F.length("p_name").alias("len"),
        F.array_distinct(
            F.expr("transform(sequence(1, length(p_name) - 1), i -> substring(p_name, i, 2))")
        ).alias("grams"),
    )
    # single global gram order: frequency ascending, gram lexicographic
    # tiebreak — a deterministic total order both prefixes use. The
    # bigram vocabulary over names is tiny (letters+space -> ~1e3
    # grams), so AQE broadcasts the rank side of the join.
    rank = (
        base.select(F.explode("grams").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c"))
        .select("g", F.struct(F.col("c"), F.col("g")).alias("ord"))
    )
    exploded = base.select("pk", "brand", "name", "len", F.explode("grams").alias("g")).join(
        rank, "g"
    )
    w = Window.partitionBy("pk").orderBy("ord")
    prefix = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _LEV_PREFIX)
        .select("pk", "brand", "name", "len", "g")
    )
    a = prefix.select(
        F.col("brand"), F.col("g"), F.col("len").alias("lk"),
        F.col("pk").alias("p1"), F.col("name").alias("name1"),
    )
    # b emits len-1/len/len+1 keys so the join covers the length band
    b = prefix.select(
        F.col("brand"), F.col("g"),
        F.explode(F.array(F.col("len") - 1, F.col("len"), F.col("len") + 1)).alias("lk"),
        F.col("pk").alias("p2"), F.col("name").alias("name2"),
    )
    cand = a.join(b, ["brand", "g", "lk"]).filter(F.col("p1") < F.col("p2"))
    # fallback block for names where the prefix bound is vacuous
    # (<= q*t distinct bigrams — see docstring): all-pairs within
    # brand + length band. BOTH orientations of a short/short pair are
    # emitted only once via p1 < p2; short/long pairs stay in the main
    # prefix join, which remains sound for them.
    short = base.filter(F.size("grams") <= 2 * _LEV_MAX)
    a_s = short.select(
        "brand", F.col("len").alias("lk"),
        F.col("pk").alias("p1"), F.col("name").alias("name1"),
    )
    b_s = short.select(
        "brand",
        F.explode(F.array(F.col("len") - 1, F.col("len"), F.col("len") + 1)).alias("lk"),
        F.col("pk").alias("p2"), F.col("name").alias("name2"),
    )
    cand_short = a_s.join(b_s, ["brand", "lk"]).filter(F.col("p1") < F.col("p2"))
    cand = cand.select("p1", "name1", "p2", "name2").unionByName(
        cand_short.select("p1", "name1", "p2", "name2")
    )
    # Score BEFORE deduplicating: a pair can arrive via <=3 shared
    # prefix grams, but the duplicate rows are narrow and the
    # early-exit threshold call is cheap — deduplicating first would
    # shuffle wide (p1, name1, p2, name2) rows (measured slower at the
    # 10x probe than just scoring the <=3x duplicates).
    dist = F.levenshtein("name1", "name2", _LEV_MAX)
    return (
        cand.select("p1", "p2", dist.alias("dist"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _LEV_MAX))
        .distinct()
        .orderBy("p1", "p2")
    )


# ---------------------------------------------------------------------------
# q204 — file-level zone map + data-skipping measurement (round 9)
# ---------------------------------------------------------------------------

_ZM_ZONES = 16  # target zone count; production targets file-sized zones


@query(
    "q204_zonemap_skip_stats",
    oracle=f"""
    WITH m AS (
      SELECT max(o_orderkey) AS mx, max(o_custkey) AS cmx FROM orders
    ), z AS (
      SELECT CAST(o_orderkey // (m.mx // {_ZM_ZONES} + 1) AS BIGINT) AS zone,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(o_orderkey) AS BIGINT) AS ok_min,
             CAST(max(o_orderkey) AS BIGINT) AS ok_max,
             CAST(min(o_custkey) AS BIGINT) AS ck_min,
             CAST(max(o_custkey) AS BIGINT) AS ck_max
      FROM orders, m
      GROUP BY 1
    )
    SELECT z.zone, CAST(1 AS BIGINT) AS n_files, z.n_rows,
           z.ok_min, z.ok_max, z.ck_min, z.ck_max,
           CAST(CASE WHEN z.ok_max < m.mx // 4 OR z.ok_min > m.mx // 2
                     THEN 1 ELSE 0 END AS BIGINT) AS skip_layout_key,
           CAST(CASE WHEN z.ck_max < m.cmx // 4 OR z.ck_min > m.cmx // 2
                     THEN 1 ELSE 0 END AS BIGINT) AS skip_random_key
    FROM z, m
    ORDER BY z.zone
    """,
)
def q204_zonemap_skip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map round trip on REAL files (round-8 verdict #5: promote
    `operators/zonemap.py` from test-only proof to a driver-green row).

    Orders are written to a scratch layout partitioned by a
    deterministic zone key (`o_orderkey DIV zone_width` — data-derived,
    so the same rule sizes ~16 zones at any SF); `zone_map` then reads
    back per-FILE (min, max, count) statistics through Spark's
    `_metadata.file_path` hidden column — the file-statistics slice of
    an Iceberg/Delta manifest — and each file's skip decision for two
    equal-selectivity BETWEEN predicates is the exact footer-prune
    test from `skip_stats`. The layout-key predicate skips most zones
    (min/max ranges tile the key space); the uncorrelated-key predicate
    skips ~none — the measured contrast that justifies sort/Morton
    write layouts (q112) at 100 TB.

    The oracle replays the zone CONTENTS logically (a zone's file holds
    exactly the rows with that zone key; `repartition("zone")` pins one
    file per zone, which the oracle asserts via the literal n_files=1)
    — so a Spark-side stats drift, a lost row, or a double-written file
    all hash-mismatch. The only collect is the zone-map itself: a
    manifest of ≤ {_ZM_ZONES + 1} rows by construction (same bounded-
    matrix policy as the centroid collects), so the scratch layout can
    be deleted before returning.
    """
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.zonemap import zone_map

    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    mrow = o.agg(F.max("o_orderkey").alias("mx"), F.max("o_custkey").alias("cmx")).first()
    mx, cmx = int(mrow["mx"]), int(mrow["cmx"])
    zw = mx // _ZM_ZONES + 1
    tmp = tempfile.mkdtemp(prefix="fmts-zonemap-q204-")
    try:
        path = f"{tmp}/orders_zoned"
        (
            o.withColumn("zone", F.expr(f"o_orderkey DIV {zw}"))
            .repartition("zone")
            .write.partitionBy("zone")
            .mode("overwrite")
            .parquet(path)
        )
        zmap = zone_map(spark, path, ["o_orderkey", "o_custkey"])
        rows = (
            zmap.select(
                F.regexp_extract("file", r"zone=(\d+)", 1).cast("long").alias("zone"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("o_orderkey_min").cast("long").alias("ok_min"),
                F.col("o_orderkey_max").cast("long").alias("ok_max"),
                F.col("o_custkey_min").cast("long").alias("ck_min"),
                F.col("o_custkey_max").cast("long").alias("ck_max"),
            )
            .groupBy("zone")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.min("ok_min").alias("ok_min"),
                F.max("ok_max").alias("ok_max"),
                F.min("ck_min").alias("ck_min"),
                F.max("ck_max").alias("ck_max"),
            )
            .select(
                "zone",
                "n_files",
                "n_rows",
                "ok_min",
                "ok_max",
                "ck_min",
                "ck_max",
                F.when((F.col("ok_max") < mx // 4) | (F.col("ok_min") > mx // 2), 1)
                .otherwise(0)
                .cast("long")
                .alias("skip_layout_key"),
                F.when((F.col("ck_max") < cmx // 4) | (F.col("ck_min") > cmx // 2), 1)
                .otherwise(0)
                .cast("long")
                .alias("skip_random_key"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(
        rows,
        schema=(
            "zone long, n_files long, n_rows long, ok_min long, ok_max long, "
            "ck_min long, ck_max long, skip_layout_key long, skip_random_key long"
        ),
    )
    return out.orderBy("zone")
