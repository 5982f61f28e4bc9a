"""Recorded change-stream fixtures through the live-connector seam.

The MongoDB Spark Connector path (`streaming/connectors.py
mongo_change_stream_source`) cannot open a socket in this sandbox, but
everything BETWEEN the socket and the engine is plain DataFrame code:
`normalize_change_events` → `oplog_filter` → quorum dedup. These tests
drive that chain end-to-end with recorded change-event rows shaped
exactly like the connector's change-stream frame (v10 connector,
`change.stream.publish.full.document.only=false`: operationType,
clusterTime, ns struct, documentKey struct, fullDocument) so the only
code untested against a real cluster is the connector's own transport
(VERDICT r4 "Next round" #8).
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from flink_mingo_tail_spark.sources.oplog import OPLOG_SOURCE_SCHEMA
from flink_mingo_tail_spark.streaming.connectors import normalize_change_events
from flink_mingo_tail_spark.streaming.pipeline import envelope, oplog_filter
from flink_mingo_tail_spark.streaming.quorum import quorum_dedup_stream

#: the connector's change-stream frame (fields the projection consumes;
#: the real frame also carries _id resume tokens, wallTime, etc. —
#: extras are irrelevant to a projection and omitted from the fixture)
CHANGE_EVENT_DDL = (
    "operationType string, clusterTime timestamp, "
    "ns struct<db:string, coll:string>, "
    "documentKey struct<_id:long>, "
    "fullDocument struct<_id:long, name:string, qty:int>"
)


def _ts(sec: int) -> datetime:
    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


def _recorded_events():
    """A recorded session: inserts, an update, a replace, a delete, an
    unmapped administrative event, plus a server-side duplicate redelivery
    (same documentKey, same clusterTime — what a resume-token replay
    produces)."""
    return [
        ("insert", _ts(1000), ("shop", "orders"), (1,), (1, "alpha", 5)),
        ("insert", _ts(1001), ("shop", "orders"), (2,), (2, "beta", 7)),
        ("update", _ts(1002), ("shop", "orders"), (1,), (1, "alpha", 6)),
        ("replace", _ts(1003), ("shop", "orders"), (2,), (2, "beta2", 7)),
        ("delete", _ts(1004), ("shop", "orders"), (1,), None),
        # administrative events a change stream can deliver: must map to
        # 'n' and be dropped by oplog_filter, like oplog no-ops
        ("invalidate", _ts(1005), ("shop", "orders"), (3,), None),
        # resume-token replay redelivers the last committed event
        ("replace", _ts(1003), ("shop", "orders"), (2,), (2, "beta2", 7)),
    ]


def _expected_h(
    document_key_json: str, ts_t: int, operation_type: str, ts_i: int = 0
) -> int:
    """The projection's stable 60-bit op id, recomputed independently."""
    ident = f"{document_key_json}|{ts_t}|{ts_i}|{operation_type}"
    return int(hashlib.md5(ident.encode()).hexdigest()[:15], 16)


def test_normalize_matches_oplog_schema_and_values(spark):
    raw = spark.createDataFrame(_recorded_events(), schema=CHANGE_EVENT_DDL)
    out = normalize_change_events(raw)
    want = spark.createDataFrame([], schema=OPLOG_SOURCE_SCHEMA)
    # name+type contract (nullability differs by construction: literal
    # columns are non-nullable, which is fine for a source schema)
    got_sig = [(f.name, f.dataType.simpleString()) for f in out.schema.fields]
    want_sig = [(f.name, f.dataType.simpleString()) for f in want.schema.fields]
    assert got_sig == want_sig, (
        f"normalize_change_events drifted off OPLOG_SOURCE_SCHEMA:\n"
        f"got  {got_sig}\nwant {want_sig}"
    )
    rows = out.orderBy("ts_t").collect()
    assert [r.op for r in rows] == ["i", "i", "u", "u", "u", "d", "n"]
    assert [r.ts_t for r in rows] == [1000, 1001, 1002, 1003, 1003, 1004, 1005]
    # ns flattened the struct; member identity is honestly NULL
    assert {r.ns for r in rows} == {"shop.orders"}
    assert all(r.shard is None and r.member_host is None for r in rows)
    # op id: deterministic function of documentKey, replicable off-engine
    first = rows[0]
    assert first.o2 == json.dumps({"_id": 1}, separators=(",", ":"))
    assert first.h == _expected_h(first.o2, 1000, "insert")
    # full document rides as JSON in `o` for the downstream envelope
    assert json.loads(first.o) == {"_id": 1, "name": "alpha", "qty": 5}
    # delete carries no fullDocument
    assert rows[5].op == "d" and rows[5].o is None


def test_resume_token_is_the_op_identity_when_present(spark):
    """ADVICE r5 (medium): with only second-granularity clusterTime in
    the hash, two rapid same-type ops on one document inside one second
    collided and the quorum stage silently dropped the second. The
    connector's resume token (`_id._data`) is unique per event — when the
    frame carries it, it IS the op id, so same-second ops stay distinct
    while a resume-token replay (same token) still collapses."""
    ddl = "_id struct<_data:string>, " + CHANGE_EVENT_DDL
    rows = [
        # two updates to doc 1 inside second 1000 — distinct tokens
        (("tok-A",), "update", _ts(1000), ("shop", "orders"), (1,), (1, "a", 1)),
        (("tok-B",), "update", _ts(1000), ("shop", "orders"), (1,), (1, "a", 2)),
        # replay of tok-B: same token, must collapse to the same id
        (("tok-B",), "update", _ts(1000), ("shop", "orders"), (1,), (1, "a", 2)),
        # a row whose token is NULL falls back to the composite identity
        ((None,), "update", _ts(1000), ("shop", "orders"), (1,), (1, "a", 3)),
    ]
    out = normalize_change_events(spark.createDataFrame(rows, schema=ddl)).collect()
    h = [r.h for r in out]
    assert h[0] != h[1], "distinct resume tokens must yield distinct op ids"
    assert h[1] == h[2], "a resume-token replay must keep the same op id"
    assert h[3] == _expected_h(out[3].o2, 1000, "update"), "NULL token -> composite fallback"
    assert hashlib.md5(b"tok-A").hexdigest()[:15] == format(h[0], "x").zfill(15)


def test_struct_clustertime_surfaces_subsecond_ordinal(spark):
    """When the upstream surfaces BSON Timestamp as a struct<t,i>, the
    ordinal lands in ts_i and distinguishes same-second ops even without
    a resume token (the fallback identity includes it)."""
    ddl = (
        "operationType string, clusterTime struct<t:int, i:int>, "
        "ns struct<db:string, coll:string>, "
        "documentKey struct<_id:long>, "
        "fullDocument struct<_id:long, name:string, qty:int>"
    )
    rows = [
        ("update", (1000, 1), ("shop", "orders"), (1,), (1, "a", 1)),
        ("update", (1000, 2), ("shop", "orders"), (1,), (1, "a", 2)),
    ]
    out = normalize_change_events(spark.createDataFrame(rows, schema=ddl)).collect()
    assert [(r.ts_t, r.ts_i) for r in out] == [(1000, 1), (1000, 2)]
    assert out[0].h != out[1].h, "same-second ops must not collide when i differs"
    assert out[0].h == _expected_h(out[0].o2, 1000, "update", ts_i=1)


def test_change_stream_to_quorum_end_to_end(spark, tmp_path):
    """Recorded events → normalize → oplog_filter → quorum(depth=1) →
    envelope, as a real structured stream with checkpointing — the exact
    topology `mongo_change_stream_source` feeds, minus the socket."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(_recorded_events(), schema=CHANGE_EVENT_DDL).write.parquet(src)

    raw = spark.readStream.schema(CHANGE_EVENT_DDL).parquet(src)
    # change streams are server-deduplicated & majority-committed:
    # quorum relaxes to depth 1 (connectors.py module docstring) but the
    # operator stays in the topology as the safety net
    deduped = quorum_dedup_stream(oplog_filter(normalize_change_events(raw)), replica_depth=1)
    q = (
        envelope(deduped)
        .writeStream.format("memory")
        .queryName("cs_contract")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM cs_contract").collect()
    # 7 recorded events -> 5 unique committed ops: the 'invalidate'
    # no-op is filtered, the redelivered replace collapses by op id
    assert len(got) == 5
    payloads = [json.loads(r.data) for r in got]
    assert {p["op"] for p in payloads} == {"i", "u", "d"}
    # every envelope is the {h, data} projection with the op id echoed
    assert all(set(p) >= {"ts_t", "h", "op", "ns"} for p in payloads)
    assert {r.h for r in got} == {p["h"] for p in payloads}


def test_change_stream_resume_from_checkpoint(spark, tmp_path):
    """Stop after the recorded session, append a later batch of events,
    restart the SAME topology from the SAME checkpoint: only the new
    events are emitted (offsets resume past the processed files), and a
    redelivery of an already-committed op id in the new batch is
    deduplicated across the restart via the quorum operator's
    persisted state. Parquet sink — the memory sink does not support
    checkpoint recovery."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(_recorded_events(), schema=CHANGE_EVENT_DDL).write.parquet(src)

    def run_once():
        raw = spark.readStream.schema(CHANGE_EVENT_DDL).parquet(src)
        deduped = quorum_dedup_stream(
            oplog_filter(normalize_change_events(raw)), replica_depth=1
        )
        q = (
            envelope(deduped)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.parquet(out).collect()

    first = run_once()
    assert len(first) == 5

    later = [
        ("insert", _ts(2000), ("shop", "orders"), (9,), (9, "late", 1)),
        # same event identity as the already-committed 1003 replace:
        # must NOT re-emit (state survived the restart)
        ("replace", _ts(1003), ("shop", "orders"), (2,), (2, "beta2", 7)),
    ]
    spark.createDataFrame(later, schema=CHANGE_EVENT_DDL).write.mode("append").parquet(src)

    second = run_once()
    # exactly one genuinely-new op across the restart; the redelivered
    # 1003 replace stays deduplicated by the recovered quorum state
    assert len(second) == 6
    new_rows = [r for r in second if r.h not in {x.h for x in first}]
    assert len(new_rows) == 1
    payload = json.loads(new_rows[0].data)
    assert payload["op"] == "i" and payload["ts_t"] == 2000
