"""CDC-domain queries: batch-checkable analogs of the reference's
streaming semantics (SURVEY.md §2A A3/A6/A7/A11), expressed over the
`events` table so the DuckDB oracle can verify them. The true streaming
twins (Structured Streaming with watermarks/state) live in
``flink_mingo_tail_spark/streaming`` and are exercised by tests.

Reference seeds:
* pushed-down conjunctive filter — MongoOplogTailMapper.java:90-98
* quorum dedup (emit on Nth replica arrival) — MongoDBOplogSource.java:116-128
* per-host checkpoint high-water mark — MongoDBOplogSource.java:130-139
* `{"data": doc}` envelope projection — ElasticsearchEmbeddedNodeSink.java:60-63
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
    "q60_cdc_filter_pushdown",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM events
    WHERE event_type <> 'error'
      AND ts > TIMESTAMP '2024-01-15 00:00:00'
      AND props IS NOT NULL
    ORDER BY event_id
    LIMIT 2000
    """,
)
def q60_cdc_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's oplog filter re-expressed: exclude no-ops
    (event_type <> 'error' stands in for op <> 'n'), resume after a
    checkpoint timestamp (ts > X), require a payload. All three
    predicates reach the Parquet scan as PushedFilters — the Spark
    equivalent of the reference evaluating its $match server-side."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("event_type") != "error")
            & (F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
            & F.col("props").isNotNull()
        )
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
        .limit(2000)
    )


@query(
    "q61_cdc_envelope",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type,
                               user_id := user_id)) AS data
    FROM events
    ORDER BY event_id
    LIMIT 1000
    """,
)
def q61_cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `{"data": <doc>}` sink envelope (ref A11) as a computed JSON
    column — integer/string fields only so both engines serialize
    byte-identically."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.to_json(F.struct("event_id", "event_type", "user_id")).alias("data"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


# Replica simulation shared by the quorum queries: every event is "seen"
# by replicas 0 and 1; replica 2 misses events of users divisible by 10
# (a lagging/dead member). Majority quorum (>=2) must still emit those.
_REPLICAS_SQL = """
    SELECT event_id, user_id, r.replica
    FROM events, (SELECT unnest([0, 1, 2]) AS replica) r
    WHERE NOT (r.replica = 2 AND user_id % 10 = 0)
"""


@query(
    "q62_cdc_quorum_dedup",
    oracle=f"""
    WITH replicas AS ({_REPLICAS_SQL})
    SELECT event_id, count(*) AS n_seen
    FROM replicas
    GROUP BY event_id
    HAVING count(*) >= 2
    ORDER BY event_id
    """,
)
def q62_cdc_quorum_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quorum dedup, batch analog of ref A6: each op arrives once per
    replica member; emit exactly once when a MAJORITY has delivered it
    (the reference requires ALL members — SURVEY §4.3.1 explains why
    that deadlocks on a dead member; majority is the fix). The streaming
    version keyed by op id with state TTL is streaming/quorum.py."""
    e = _t(spark, sf_dir, "events")
    replicas = (
        e.select("event_id", "user_id")
        .crossJoin(F.broadcast(spark.range(3).withColumnRenamed("id", "replica")))
        .filter(~((F.col("replica") == 2) & (F.col("user_id") % 10 == 0)))
    )
    return (
        replicas.groupBy("event_id")
        .agg(F.count("*").alias("n_seen"))
        .filter(F.col("n_seen") >= 2)
        .orderBy("event_id")
    )


@query(
    "q63_cdc_checkpoint_highwater",
    oracle="""
    SELECT user_id AS _id, max(ts) AS last_ts, count(*) AS n_ops
    FROM events
    GROUP BY user_id
    ORDER BY _id
    """,
)
def q63_cdc_checkpoint_highwater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition checkpoint high-water mark: the `time_d.repl_time`
    table (ref A7) computed as a batch aggregate — one row per source
    partition (user stands in for replica host) with its last-seen ts."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("user_id").alias("_id"))
        .agg(F.max("ts").alias("last_ts"), F.count("*").alias("n_ops"))
        .orderBy("_id")
    )


@query(
    "q64_cdc_resume_after_checkpoint",
    oracle="""
    WITH checkpoint AS (
        SELECT user_id, max(ts) AS ck_ts
        FROM events
        WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY user_id
    )
    SELECT e.user_id, count(*) AS n_new
    FROM events e JOIN checkpoint c
      ON e.user_id = c.user_id AND e.ts > c.ck_ts
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def q64_cdc_resume_after_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume-from-checkpoint (ref A3's `ts > last_ts` bound, per member):
    compute each partition's checkpoint, then count strictly-newer ops.
    The join is an equi-join on the partition key plus a range predicate —
    exactly how incremental re-ingest is planned at scale."""
    e = _t(spark, sf_dir, "events")
    ck = (
        e.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.max("ts").alias("ck_ts"))
    )
    newer = e.join(ck, "user_id").filter(F.col("ts") > F.col("ck_ts"))
    return newer.groupBy("user_id").agg(F.count("*").alias("n_new")).orderBy("user_id")


@query(
    "q65_cdc_apply_latest_state",
    oracle="""
    WITH changelog AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
               ts, event_id, value
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM changelog
    )
    SELECT user_id, event_id AS last_event, value AS last_value
    FROM ranked
    WHERE rn = 1 AND op <> 'd'
    ORDER BY user_id
    """,
)
def q65_cdc_apply_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (changelog → current state): events re-read as a
    changelog (errors = deletes, everything else = upserts keyed by
    user); one window pass keeps each key's latest op, deleted keys
    vanish (streaming/apply.py:latest_state_batch — the compact-the-
    changelog job; incremental twin tested in test_cdc_apply.py)."""
    from flink_mingo_tail_spark.streaming.apply import latest_state_batch

    e = _t(spark, sf_dir, "events")
    changelog = e.select(
        "user_id",
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
        "ts",
        "event_id",
        "value",
    )
    state = latest_state_batch(changelog, key="user_id", order_by=["ts", "event_id"])
    return state.select(
        "user_id", F.col("event_id").alias("last_event"), F.col("value").alias("last_value")
    ).orderBy("user_id")


@query(
    "q65b_scd2_history",
    oracle="""
    WITH changelog AS (
        SELECT user_id, ts, event_id, value
        FROM events WHERE event_type <> 'error'
    )
    SELECT user_id, event_id, value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM changelog
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
)
def q65b_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD-type-2 history table: every upsert becomes a
    validity interval [valid_from, valid_to) closed by the key's next
    change (open-ended + is_current for the latest). The other half of
    CDC materialization next to q65's latest-state compaction — what a
    warehouse keeps when consumers need as-of queries over the change
    history. One window pass per key (single shuffle on user_id), no
    self-join."""
    e = _t(spark, sf_dir, "events")
    changelog = e.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_id", "value"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changelog.select(
            "user_id",
            "event_id",
            "value",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


@query(
    "q66_event_funnel",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS first_view
        FROM events
    ), stages AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS did_view,
               max(CASE WHEN event_type = 'click' AND ts > first_view THEN 1 ELSE 0 END)
                   AS did_click_after_view,
               max(CASE WHEN event_type = 'purchase' AND ts > first_view THEN 1 ELSE 0 END)
                   AS did_purchase_after_view
        FROM seq
        GROUP BY user_id
    )
    SELECT CAST(sum(did_view) AS BIGINT) AS n_viewed,
           CAST(sum(CASE WHEN did_view = 1 AND did_click_after_view = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicked,
           CAST(sum(CASE WHEN did_view = 1 AND did_click_after_view = 1
                     AND did_purchase_after_view = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
    FROM stages
    """,
)
def q66_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel analysis (view → click-after-view →
    purchase-after-view per user): the event-analytics staple over the
    CDC-shaped stream — one keyed window + one aggregation, no self-join
    explosion (the naive 3-way self-join is quadratic per user)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    seq = e.withColumn(
        "first_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    stages = seq.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("did_view"),
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")), 1).otherwise(0)
        ).alias("did_click_after_view"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("first_view")), 1).otherwise(0)
        ).alias("did_purchase_after_view"),
    )
    return stages.agg(
        F.sum("did_view").alias("n_viewed"),
        F.sum(
            F.when((F.col("did_view") == 1) & (F.col("did_click_after_view") == 1), 1).otherwise(0)
        ).alias("n_clicked"),
        F.sum(
            F.when(
                (F.col("did_view") == 1)
                & (F.col("did_click_after_view") == 1)
                & (F.col("did_purchase_after_view") == 1),
                1,
            ).otherwise(0)
        ).alias("n_purchased"),
    )


@query(
    "q124_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), new AS (
      -- simulated next snapshot: ~1% deleted, ~1% price-bumped, ~1% cloned
      SELECT k, st, CASE WHEN k % 89 = 0 THEN cents + 100 ELSE cents END AS cents
      FROM old WHERE k % 97 <> 0
      UNION ALL
      SELECT k + 100000000000000, st, cents FROM old WHERE k % 101 = 0
    )
    SELECT CASE WHEN n.k IS NULL THEN 'delete'
                WHEN o.k IS NULL THEN 'insert'
                ELSE 'update' END AS change_type,
           coalesce(o.k, n.k) AS o_orderkey,
           o.cents AS old_cents,
           n.cents AS new_cents
    FROM old o FULL OUTER JOIN new n ON o.k = n.k
    WHERE o.k IS NULL OR n.k IS NULL OR o.cents <> n.cents OR o.st <> n.st
    ORDER BY change_type, o_orderkey
    """,
)
def q124_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing — derive a changelog from two full table
    snapshots (the batch complement of the oplog tail: when a source
    system exports nightly dumps instead of a change stream, the diff
    IS the CDC feed). The next snapshot is simulated deterministically
    from orders (~1% deletes via k%97, ~1% updates via k%89 price
    bumps, ~1% inserts via k%101 clones at a shifted key), so both
    engines build bit-identical inputs.

    Plan shape: ONE full-outer sort-merge join on the primary key plus
    an in-expression row comparison — no window, no driver state. At
    100 TB both snapshots are bucketed/partitioned by key, so the join
    is co-located and the diff streams; output is only the changed
    rows (~3%), which is what ships downstream as the change feed."""
    o = _t(spark, sf_dir, "orders")
    old = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    kept = old.filter(F.col("k") % 97 != 0).select(
        "k",
        "st",
        F.when(F.col("k") % 89 == 0, F.col("cents") + 100).otherwise(F.col("cents")).alias("cents"),
    )
    cloned = old.filter(F.col("k") % 101 == 0).select(
        (F.col("k") + F.lit(100_000_000_000_000)).alias("k"), "st", "cents"
    )
    new = kept.unionAll(cloned)
    oo, nn = old.alias("o"), new.alias("n")
    joined = oo.join(nn, F.col("o.k") == F.col("n.k"), "full_outer")
    change_type = (
        F.when(F.col("n.k").isNull(), "delete")
        .when(F.col("o.k").isNull(), "insert")
        .otherwise("update")
    )
    changed = (
        F.col("o.k").isNull()
        | F.col("n.k").isNull()
        | (F.col("o.cents") != F.col("n.cents"))
        | (F.col("o.st") != F.col("n.st"))
    )
    return (
        joined.filter(changed)
        .select(
            change_type.alias("change_type"),
            F.coalesce(F.col("o.k"), F.col("n.k")).alias("o_orderkey"),
            F.col("o.cents").alias("old_cents"),
            F.col("n.cents").alias("new_cents"),
        )
        .orderBy("change_type", "o_orderkey")
    )


@query(
    "q168_incremental_agg_maintenance",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), new AS (
      SELECT k, st, CASE WHEN k % 89 = 0 THEN cents + 100 ELSE cents END AS cents
      FROM old WHERE k % 97 <> 0
      UNION ALL
      SELECT k + 100000000000000, st, cents FROM old WHERE k % 101 = 0
    ), chg AS (
      SELECT o.k AS ok, o.st AS ost, o.cents AS oc,
             n.k AS nk, n.st AS nst, n.cents AS nc
      FROM old o FULL OUTER JOIN new n ON o.k = n.k
      WHERE o.k IS NULL OR n.k IS NULL OR o.cents <> n.cents OR o.st <> n.st
    ), contrib AS (
      SELECT ost AS st, -1 AS dn, -oc AS dc FROM chg WHERE ok IS NOT NULL
      UNION ALL
      SELECT nst AS st, 1 AS dn, nc AS dc FROM chg WHERE nk IS NOT NULL
    ), base AS (
      SELECT st, count(*) AS n0, CAST(sum(cents) AS BIGINT) AS s0
      FROM old GROUP BY st
    ), delta AS (
      SELECT st, CAST(sum(dn) AS BIGINT) AS dn, CAST(sum(dc) AS BIGINT) AS dc
      FROM contrib GROUP BY st
    ), maintained AS (
      SELECT coalesce(b.st, d.st) AS st,
             coalesce(b.n0, 0) + coalesce(d.dn, 0) AS n_m,
             coalesce(b.s0, 0) + coalesce(d.dc, 0) AS s_m
      FROM base b FULL OUTER JOIN delta d ON b.st = d.st
    ), recomputed AS (
      SELECT st, count(*) AS n_r, CAST(sum(cents) AS BIGINT) AS s_r
      FROM new GROUP BY st
    )
    SELECT m.st AS o_orderstatus, m.n_m AS n_maintained, m.s_m AS sum_maintained,
           r.n_r AS n_recomputed, r.s_r AS sum_recomputed,
           (m.n_m = r.n_r AND m.s_m = r.s_r) AS consistent
    FROM maintained m JOIN recomputed r ON m.st = r.st
    ORDER BY o_orderstatus
    """,
)
def q168_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a grouped aggregate (count + sum per
    order status) from a snapshot-diff changelog — materialized-view
    maintenance: instead of re-aggregating the whole new snapshot, the
    standing per-group totals absorb per-change contributions (delete
    -> (-1, -cents) under the old group, insert -> (+1, +cents) under
    the new group, update -> both rows, which also covers group-key
    migrations). The recomputed aggregate is produced alongside and the
    `consistent` column proves maintained == recomputed per group.

    Scale shape: the contribution aggregate touches only the CHANGED
    rows (~3% here, arbitrarily small in steady state) and the standing
    totals are |groups| rows — the O(delta) nightly update versus the
    O(corpus) re-aggregation, the same asymmetry the standing dedup
    index (q117) buys for dedup. Snapshots reuse q124's deterministic
    simulation so both engines build bit-identical inputs.
    """
    o = _t(spark, sf_dir, "orders")
    old = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    kept = old.filter(F.col("k") % 97 != 0).select(
        "k", "st",
        F.when(F.col("k") % 89 == 0, F.col("cents") + 100).otherwise(F.col("cents")).alias("cents"),
    )
    cloned = old.filter(F.col("k") % 101 == 0).select(
        (F.col("k") + F.lit(100_000_000_000_000)).alias("k"), "st", "cents"
    )
    new = kept.unionAll(cloned)
    oo, nn = old.alias("o"), new.alias("n")
    chg = (
        oo.join(nn, F.col("o.k") == F.col("n.k"), "full_outer")
        .filter(
            F.col("o.k").isNull() | F.col("n.k").isNull()
            | (F.col("o.cents") != F.col("n.cents")) | (F.col("o.st") != F.col("n.st"))
        )
        .select(
            F.col("o.k").alias("ok"), F.col("o.st").alias("ost"), F.col("o.cents").alias("oc"),
            F.col("n.k").alias("nk"), F.col("n.st").alias("nst"), F.col("n.cents").alias("nc"),
        )
    )
    contrib = chg.filter(F.col("ok").isNotNull()).select(
        F.col("ost").alias("st"), F.lit(-1).alias("dn"), (-F.col("oc")).alias("dc")
    ).unionAll(
        chg.filter(F.col("nk").isNotNull()).select(
            F.col("nst").alias("st"), F.lit(1).alias("dn"), F.col("nc").alias("dc")
        )
    )
    base = old.groupBy("st").agg(F.count("*").alias("n0"), F.sum("cents").alias("s0"))
    delta = contrib.groupBy("st").agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    maintained = (
        base.alias("b")
        .join(delta.alias("d"), F.col("b.st") == F.col("d.st"), "full_outer")
        .select(
            F.coalesce(F.col("b.st"), F.col("d.st")).alias("st"),
            (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias("n_m"),
            (F.coalesce(F.col("s0"), F.lit(0)) + F.coalesce(F.col("dc"), F.lit(0))).alias("s_m"),
        )
    )
    recomputed = new.groupBy("st").agg(F.count("*").alias("n_r"), F.sum("cents").alias("s_r"))
    return (
        maintained.join(recomputed, "st")
        .select(
            F.col("st").alias("o_orderstatus"),
            F.col("n_m").alias("n_maintained"),
            F.col("s_m").alias("sum_maintained"),
            F.col("n_r").alias("n_recomputed"),
            F.col("s_r").alias("sum_recomputed"),
            ((F.col("n_m") == F.col("n_r")) & (F.col("s_m") == F.col("s_r"))).alias("consistent"),
        )
        .orderBy("o_orderstatus")
    )
