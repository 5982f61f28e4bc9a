"""Custom `oplog_sim` DataSource: partition-per-member batch scan,
filter pushdown, offset-tracked tailing stream, and the full
source→filter→quorum→sink topology (the reference's entire job,
MongoDBOplogTail.java:36-42, end to end)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.sources.oplog import (
    OPLOG_SOURCE_SCHEMA,
    register,
    write_member_logs,
)
from flink_mingo_tail_spark.streaming.pipeline import build_cdc_stream, oplog_filter
from flink_mingo_tail_spark.streaming.replay import MEMBERS, OplogCase, op_rows


@pytest.fixture()
def log_dir(tmp_path):
    return str(tmp_path / "oplogs")


def test_batch_read_partition_per_member(spark, log_dir):
    case = OplogCase(n_ops=10)
    write_member_logs(op_rows(case), log_dir)
    register(spark)
    df = spark.read.format("oplog_sim").option("path", log_dir).load()
    # one input partition per replica member (ref: one cursor per member)
    assert df.rdd.getNumPartitions() == len(MEMBERS)
    # 10 ops x 3 members + 3 noise rows
    assert df.count() == 33
    per_member = {r.member_host: r.n for r in df.groupBy("member_host").agg(F.count("*").alias("n")).collect()}
    assert per_member["m1:27017"] == 11  # 10 deliveries + fromMigrate noise


def test_batch_read_filter_pushdown(spark, log_dir):
    case = OplogCase(n_ops=10)
    write_member_logs(op_rows(case), log_dir)
    register(spark)
    df = spark.read.format("oplog_sim").option("path", log_dir).load()
    filtered = oplog_filter(df, resume_after=(1_700_000_004, 99))
    rows = filtered.collect()
    # ops 5..9 from 3 members each; all noise rows dropped
    assert len(rows) == 15
    assert all(r.ts_t > 1_700_000_004 for r in rows)
    assert all(r.op != "n" and r.ns == "test.grades" and r.fromMigrate is None for r in rows)


def test_stream_tails_new_appends(spark, log_dir, tmp_path):
    case1 = OplogCase(n_ops=4, include_noise=False)
    write_member_logs(op_rows(case1), log_dir)
    register(spark)
    stream = spark.readStream.format("oplog_sim").option("path", log_dir).load()
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("tail_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) n FROM tail_out").collect()[0].n
        assert n1 == 12  # 4 ops x 3 members
        # tail: append a second wave to the same member logs
        case2 = OplogCase(n_ops=4, h_base=2000, ts_base=1_700_000_100, include_noise=False)
        write_member_logs(op_rows(case2), log_dir)
        q.processAllAvailable()
        n2 = spark.sql("SELECT count(*) n FROM tail_out").collect()[0].n
        assert n2 == 24, "stream did not pick up appended oplog entries"
    finally:
        q.stop()


def test_full_cdc_topology_from_custom_source(spark, log_dir, tmp_path):
    """The reference's whole job on Spark: oplog_sim source (per-member
    partitions) → pushed-down filter → majority-quorum dedup → sink;
    every committed op appears exactly once despite 3x delivery."""
    case = OplogCase(n_ops=15, deliveries={7: (MEMBERS[0],)})  # op 7: sub-majority
    write_member_logs(op_rows(case), log_dir)
    register(spark)
    stream = spark.readStream.format("oplog_sim").option("path", log_dir).load()
    deduped = build_cdc_stream(stream, replica_depth=3)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("cdc_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    hs = sorted(r.h for r in spark.sql("SELECT h FROM cdc_out").collect())
    assert hs == [1000 + i for i in range(15) if i != 7]


def test_member_name_roundtrip_hyphenated_host(spark, log_dir):
    """Hostnames containing '-' must survive the log-file round-trip
    (the old replace(':','-') scheme reported 'my:host:27017')."""
    import pandas as pd

    from flink_mingo_tail_spark.sources.oplog import _discover_members

    member = "my-host.example-domain.com:27017"
    pdf = pd.DataFrame(
        [
            {
                "ts_t": 100, "ts_i": 1, "h": 7, "op": "i", "ns": "db.c",
                "fromMigrate": None, "o": "{}", "o2": None,
                "shard": "s0", "member_host": member,
            }
        ]
    )
    write_member_logs(pdf, log_dir)
    assert _discover_members(log_dir) == [member]
    register(spark)
    df = (
        spark.read.format("oplog_sim").schema(OPLOG_SOURCE_SCHEMA)
        .option("path", log_dir).load()
    )
    assert [r.member_host for r in df.collect()] == [member]
