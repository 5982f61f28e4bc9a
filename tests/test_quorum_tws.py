"""transformWithStateInPandas quorum variant: same emission set as the
applyInPandasWithState implementation on the same replay.

Skipped when the `protobuf` package is absent: Spark's Python state
server for transformWithState speaks protobuf, and this environment
does not ship it — verified round 5: no wheel on disk and no package
index reachable (pip download fails DNS), so vendoring is impossible
here, and reimplementing the google.protobuf runtime to unblock two
tests would be padding. The applyInPandasWithState implementation
(test_streaming.py) is the tested production path."""

from __future__ import annotations

import pytest

pytest.importorskip("google.protobuf", reason="transformWithState state client needs protobuf")

from flink_mingo_tail_spark.streaming.pipeline import oplog_filter
from flink_mingo_tail_spark.streaming.quorum import quorum_dedup_stream_tws
from flink_mingo_tail_spark.streaming.replay import (
    MEMBERS,
    OPLOG_DDL,
    OplogCase,
    op_rows,
    write_batch,
)


def test_tws_quorum_matches_semantics(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    case = OplogCase(
        n_ops=10,
        deliveries={4: (MEMBERS[0],), 6: (MEMBERS[0], MEMBERS[1])},
        duplicated=(2,),
    )
    write_batch(spark, op_rows(case), src)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(OPLOG_DDL).parquet(src)
        deduped = quorum_dedup_stream_tws(oplog_filter(stream), replica_depth=3)
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("tws_out")
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    hs = sorted(r.h for r in spark.sql("SELECT h FROM tws_out").collect())
    # op 4 sub-majority: no emit; everything else exactly once
    assert hs == [1000 + i for i in range(10) if i != 4]
