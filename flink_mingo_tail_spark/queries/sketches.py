"""Mergeable-sketch and deterministic-sampling queries (north-star
extension, SURVEY.md §2C).

Two operations every 100 TB pipeline runs constantly:

* **Re-aggregatable distinct sketches** (q134): Apache DataSketches HLL
  via ``hll_sketch_agg`` / ``hll_union_agg``. The scale story is the
  MERGE: per-partition (here per-``event_type``) sketches roll up to any
  coarser grain without re-scanning the base data — the pattern that
  replaces count-distinct re-computation over a 100 TB fact table with a
  kilobyte-sized sketch union. Sketch estimates are engine-specific, so
  (exactly like q26) the raw estimate never reaches the driver hash: the
  query emits EXACT counts plus an accuracy gate the oracle asserts as
  constant TRUE.

* **Deterministic stratified sampling** (q135): per-stratum Bernoulli
  sampling decided by a pure integer predicate over the shared md5 hash
  (operators/dedup.md5_long) — no RNG, no driver state. This matters at
  scale for two reasons: ``df.sample()`` draws from a per-task RNG, so a
  task RETRY can emit a different sample (breaking exactly-once sinks
  and any audit trail), and rate changes recompute from scratch; the
  hash predicate is embarrassingly parallel, reproducible across
  retries/engines, and monotone in the rate (raising the rate only ADDS
  rows — incremental top-up, never a reshuffle of the kept set).

Reference parity: the reference engine (JaiHirsch/flink-mingo-tail) has
no aggregation surface at all (SURVEY.md §0); these extend the declared
engine alongside q26's HLL++ row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import md5_long, salted_md5_long, sql_md5_long
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table

_LG_K = 14          # DataSketches lgConfigK: rse ~= 1.04/sqrt(2^14) ~ 0.8%
_GATE = 0.05        # |estimate - exact| <= 5% of exact (a >5-sigma band)
_SAMPLE_SALT = 7    # salt for the membership hash (decoupled from MinHash salts)


@query(
    "q134_hll_sketch_rollup",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events
    ORDER BY event_type
    """,
)
def q134_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches-HLL distinct-user sketches per event_type, rolled up
    to the global grain by UNIONING THE SKETCHES (``hll_union_agg``), not
    by re-scanning events — the mergeable-summary pattern that makes
    distinct counts re-aggregatable at 100 TB (per-day sketches union to
    month/quarter in kilobytes). Both grains are accuracy-gated against
    the exact distinct count at lgConfigK=14 (±5%, >5σ); the oracle
    asserts the gates as constant TRUE so the hash checks exact values
    only (estimates differ across engines by design, as in q26)."""
    prepare_session(spark)
    e = load_table(spark, sf_dir, "events")

    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", _LG_K).alias("sk"),
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )

    def gate(est: Column) -> Column:
        return (F.abs(est - F.col("n_users")) <= F.lit(_GATE) * F.col("n_users")).alias(
            "approx_ok"
        )

    typed = per_type.select(
        "event_type", "n_events", "n_users", gate(F.hll_sketch_estimate("sk"))
    )
    # Global grain: union the per-type sketches (no second scan of the
    # fact table); the exact global distinct for the gate does need one
    # scan — that is the cost the sketch path REMOVES in production, kept
    # here only because the correctness contract wants the exact value.
    merged = per_type.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("n_events").alias("n_events")
    )
    exact_all = e.agg(F.count_distinct("user_id").alias("n_users"))
    all_row = merged.crossJoin(exact_all).select(
        F.lit("ALL").alias("event_type"),
        "n_events",
        "n_users",
        gate(F.hll_sketch_estimate("sk")),
    )
    return typed.unionByName(all_row).orderBy("event_type")


def _sql_rate(src_expr: str) -> str:
    return f"100 + ({sql_md5_long(src_expr)}) % 200"


@query(
    "q135_stratified_hash_sample",
    oracle=f"""
    WITH d AS (
      SELECT source,
             {_sql_rate('source')} AS rate_permille,
             ({sql_md5_long('CAST(doc_id AS VARCHAR)', salt=_SAMPLE_SALT)}) % 1000 AS bucket,
             doc_id, n_chars
      FROM documents
    )
    SELECT source,
           rate_permille,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN bucket < rate_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bucket < rate_permille THEN doc_id END) AS BIGINT) AS kept_id_sum,
           CAST(sum(CASE WHEN bucket < rate_permille THEN n_chars END) AS BIGINT) AS kept_chars,
           min(CASE WHEN bucket < rate_permille THEN doc_id END) AS kept_min_id
    FROM d
    GROUP BY source, rate_permille
    ORDER BY source
    """,
)
def q135_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified Bernoulli sample of the document corpus:
    each source stratum gets a rate derived from its own hash (100–299
    per-mille), and a row is kept iff ``md5(doc_id) % 1000 < rate`` —
    a pure, narrow, retry-stable integer predicate (no RNG, no shuffle,
    no driver state; raising a rate only adds rows). Output is the
    per-stratum audit summary (kept counts + exact id/char sums), which
    is what a curation pipeline logs; the kept ROWS are the same
    predicate applied as a filter. Hash-exact in both engines via the
    shared md5→int60 construction (operators/dedup.py)."""
    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumns(
        {
            "rate_permille": (F.lit(100) + md5_long(F.col("source")) % 200),
            "bucket": salted_md5_long(F.col("doc_id").cast("string"), _SAMPLE_SALT) % 1000,
        }
    )
    kept = F.col("bucket") < F.col("rate_permille")
    return (
        d.groupBy("source", "rate_permille")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id"))).alias("kept_id_sum"),
            F.sum(F.when(kept, F.col("n_chars"))).alias("kept_chars"),
            F.min(F.when(kept, F.col("doc_id"))).alias("kept_min_id"),
        )
        .orderBy("source")
    )
