"""End-to-end CDC pipeline topology — Spark twin of the reference job
(MongoDBOplogTail.java:36-42):

    source (per-member partitions, filter pushed down)
      → quorum dedup (stateful, majority)
        → envelope {"data": doc}
          → N sinks (console / parquet / external-index stand-in)

Differences by design (SURVEY.md §4.3): offsets commit AFTER sink commit
(Structured Streaming checkpoint), sinks flush per micro-batch instead of
per record, dedup state has TTL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from flink_mingo_tail_spark.streaming.quorum import quorum_dedup_stream

CHECKPOINT_NS = "time_d.repl_time"


def oplog_filter(ops: DataFrame, resume_after: tuple[int, int] | None = None) -> DataFrame:
    """The reference's pushed-down conjunction
    (MongoOplogTailMapper.java:90-98): drop the checkpoint namespace,
    drop no-ops, drop chunk-migration copies, resume after a timestamp.
    Expressed as a plain filter so Catalyst pushes it into the source
    scan (PushedFilters) — the Spark equivalent of server-side $match."""
    cond = (F.col("ns") != CHECKPOINT_NS) & (F.col("op") != "n") & F.col("fromMigrate").isNull()
    if resume_after is not None:
        t, i = resume_after
        cond = cond & (
            (F.col("ts_t") > t) | ((F.col("ts_t") == t) & (F.col("ts_i") > i))
        )
    return ops.filter(cond)


def envelope(df: DataFrame) -> DataFrame:
    """`{"data": <doc>}` projection (ElasticsearchEmbeddedNodeSink.java:60-63)."""
    return df.select(F.col("h"), F.to_json(F.struct(*df.columns)).alias("data"))


def build_cdc_stream(ops: DataFrame, replica_depth: int, state_ttl_ms: int = 60_000) -> DataFrame:
    """Filter → quorum dedup → stream of unique committed ops."""
    return quorum_dedup_stream(oplog_filter(ops), replica_depth, state_ttl_ms=state_ttl_ms)


def start_two_sink_topology(
    deduped: DataFrame, out_dir: str, checkpoint_dir: str
) -> list[StreamingQuery]:
    """The reference's dual-sink fan-out (print + Elasticsearch,
    MongoDBOplogTail.java:39-40) as one foreachBatch that double-writes
    per micro-batch: a parquet "index" (ES stand-in, bulk per batch —
    fixing the per-record flush defect) and an append-only console-like
    text log of envelopes. One source scan, one checkpoint, atomic batch
    id tracking."""

    def write_both(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(f"{out_dir}/index")
            envelope(batch_df).write.mode("append").json(f"{out_dir}/console")
        finally:
            batch_df.unpersist()

    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_both)
        .start()
    )
    return [q]
