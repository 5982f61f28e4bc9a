"""Live-adapter seams (streaming/connectors.py), tested hermetically:
the change-event normalization is a pure projection, and the ES bulk
sink streams real micro-batches through an injected transport."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_mingo_tail_spark.sources.oplog import OPLOG_SOURCE_SCHEMA
from flink_mingo_tail_spark.streaming.connectors import (
    es_bulk_payload,
    make_es_bulk_writer,
    normalize_change_events,
)
from flink_mingo_tail_spark.streaming.pipeline import oplog_filter


def test_normalize_change_events_matches_oplog_schema(spark):
    """A connector-shaped change event lands exactly on the engine's
    oplog schema, so oplog_filter/quorum/sinks run unchanged."""
    raw = spark.createDataFrame(
        [
            (
                "insert",
                "2024-01-01 00:00:05",
                {"db": "test", "coll": "grades"},
                '{"_id": 1}',
                '{"_id": 1, "score": 10}',
            ),
            (
                "drop",  # non-CRUD event -> op 'n', dropped by oplog_filter
                "2024-01-01 00:00:06",
                {"db": "test", "coll": "grades"},
                '{"_id": 2}',
                None,
            ),
        ],
        schema="operationType string, clusterTime string, "
        "ns struct<db:string,coll:string>, documentKey string, fullDocument string",
    ).select(
        "operationType",
        F.col("clusterTime").cast("timestamp").alias("clusterTime"),
        "ns",
        F.from_json("documentKey", "_id int").alias("documentKey"),
        F.from_json("fullDocument", "_id int, score int").alias("fullDocument"),
    )
    normalized = normalize_change_events(raw)
    expected = spark.createDataFrame([], OPLOG_SOURCE_SCHEMA).schema
    got = [(f.name, f.dataType) for f in normalized.schema.fields]
    assert got == [(f.name, f.dataType) for f in expected.fields]  # nullability is per-source
    rows = oplog_filter(normalized).collect()
    assert [r.op for r in rows] == ["i"]
    assert rows[0].ns == "test.grades"
    assert rows[0].h is not None and rows[0].h > 0


def _file_transport(dirpath: str):
    """Request recorder that works EXECUTOR-side: the sink now POSTs from
    foreachPartition tasks (separate worker processes), so a driver-list
    transport would observe nothing — each request lands as one file
    instead, counted by the driver after the job."""

    def transport(url: str, body: bytes, content_type: str) -> int:
        import os
        import uuid

        fn = os.path.join(dirpath, f"req-{uuid.uuid4().hex}.ndjson")
        with open(fn, "wb") as f:
            f.write((url + "\n" + content_type + "\n").encode() + body)
        return 200

    return transport


def test_es_bulk_writer_batches_through_transport(spark, tmp_path):
    """foreachBatch sink: executor-side POSTs, one transport call per
    max_docs chunk within a partition, NDJSON action/source pairs,
    {'data': doc} envelope."""
    outdir = str(tmp_path / "reqs")
    import os

    os.makedirs(outdir)
    writer = make_es_bulk_writer(
        "http://es:9200", "oplog-index", transport=_file_transport(outdir), max_docs_per_request=2
    )
    batch = spark.createDataFrame(
        [(1, "i", "test.grades"), (2, "i", "test.grades"), (3, "d", "test.grades")],
        schema="h long, op string, ns string",
    ).coalesce(1)
    writer(batch, batch_id=7)

    reqs = sorted(os.listdir(outdir))
    assert len(reqs) == 2  # one partition, 3 docs, 2 per request
    payload = open(os.path.join(outdir, reqs[0]), "rb").read().decode()
    url, ctype, *lines = payload.strip().split("\n")
    assert url == "http://es:9200/_bulk" and ctype == "application/x-ndjson"
    all_lines = [
        ln
        for fn in reqs
        for ln in open(os.path.join(outdir, fn), "rb").read().decode().strip().split("\n")[2:]
    ]
    assert len(all_lines) == 6  # 3 docs x (action + source)
    action, source = json.loads(all_lines[0]), json.loads(all_lines[1])
    assert action["index"]["_index"] == "oplog-index"
    assert set(source) == {"data"} and source["data"]["ns"] == "test.grades"


def test_es_bulk_writer_parallel_partitions(spark, tmp_path):
    """Each partition issues its own requests — the no-driver-collect
    contract: request count == partition count when chunks fit."""
    outdir = str(tmp_path / "reqs")
    import os

    os.makedirs(outdir)
    writer = make_es_bulk_writer(
        "http://es:9200", "idx", transport=_file_transport(outdir), max_docs_per_request=100
    )
    batch = spark.createDataFrame(
        [(i, "i", "test.grades") for i in range(8)], schema="h long, op string, ns string"
    ).repartition(4)
    writer(batch, batch_id=1)
    reqs = os.listdir(outdir)
    # one request per NON-EMPTY partition (an empty partition sends
    # nothing); all 8 docs must arrive across >1 parallel request
    assert 1 < len(reqs) <= 4
    n_actions = sum(
        1
        for fn in reqs
        for ln in open(os.path.join(outdir, fn), "rb").read().decode().strip().split("\n")[2:]
        if '"index"' in ln
    )
    assert n_actions == 8


def _always_503(url: str, body: bytes, content_type: str) -> int:
    return 503


def _no_sleep(_delay: float) -> None:  # executor-picklable sleeper stub
    return None


def test_es_bulk_writer_raises_after_retries_exhausted(spark):
    """A persistent 503 is retried max_attempts times, then fails the
    batch (handing off to Spark task retry)."""
    writer = make_es_bulk_writer(
        "http://es:9200",
        "idx",
        transport=_always_503,
        max_docs_per_request=10,
        max_attempts=3,
        sleeper=_no_sleep,
    )
    batch = spark.createDataFrame([(1, "i", "x")], schema="h long, op string, ns string")
    try:
        writer(batch, batch_id=0)
    except Exception as e:  # executor RuntimeError surfaces wrapped by Py4J
        assert "503" in str(e) and "3 attempts" in str(e)
    else:
        raise AssertionError("expected failure on HTTP 503")


def _always_400(url: str, body: bytes, content_type: str) -> int:
    return 400


def test_es_bulk_writer_does_not_retry_client_errors(spark):
    """4xx (mapping/payload bug) fails immediately — retrying can't fix
    a malformed request and would just hammer the cluster."""
    writer = make_es_bulk_writer(
        "http://es:9200", "idx", transport=_always_400, max_docs_per_request=10, sleeper=_no_sleep
    )
    batch = spark.createDataFrame([(1, "i", "x")], schema="h long, op string, ns string")
    try:
        writer(batch, batch_id=0)
    except Exception as e:
        assert "non-retryable" in str(e) and "400" in str(e)
    else:
        raise AssertionError("expected immediate failure on HTTP 400")


def _flaky_transport(dirpath: str, fail_times: int):
    """Executor-side transport that throttles (429) the first N calls,
    then delivers. Attempt count survives across retries via a file (the
    retries happen inside one task, but a file also survives task
    retry, which a closure counter would not)."""

    def transport(url: str, body: bytes, content_type: str) -> int:
        import os

        marker = os.path.join(dirpath, "attempts")
        # one byte appended per attempt (O_APPEND, atomic) — a
        # read-truncate-write counter here can tear if the box is under
        # enough load to delay the task mid-update
        with open(marker, "ab") as f:
            f.write(b".")
        n = os.path.getsize(marker)
        if n <= fail_times:
            return 429
        with open(os.path.join(dirpath, f"req-{n}.ndjson"), "wb") as f:
            f.write(body)
        return 200

    return transport


def test_es_bulk_writer_survives_transient_throttle(spark, tmp_path):
    """Two 429s then success: the stream-killing scenario from the
    round-3 verdict. The chunk must be delivered exactly once, on the
    third attempt, with the same idempotent-by-_id payload."""
    outdir = str(tmp_path / "reqs")
    import os

    os.makedirs(outdir)
    writer = make_es_bulk_writer(
        "http://es:9200",
        "idx",
        transport=_flaky_transport(outdir, fail_times=2),
        max_docs_per_request=10,
        max_attempts=5,
        backoff_base_sec=0.0,  # keep the test fast; jitter math still runs
    )
    batch = spark.createDataFrame(
        [(1, "i", "test.grades"), (2, "u", "test.grades")], schema="h long, op string, ns string"
    ).coalesce(1)
    writer(batch, batch_id=3)

    assert open(os.path.join(outdir, "attempts")).read() == "..."  # exactly 3 attempts
    delivered = [fn for fn in os.listdir(outdir) if fn.startswith("req-")]
    assert len(delivered) == 1  # delivered once, after exactly 2 retries
    lines = open(os.path.join(outdir, delivered[0]), "rb").read().decode().strip().split("\n")
    actions = [json.loads(ln) for ln in lines[::2]]
    assert [a["index"]["_id"] for a in actions] == ["1", "2"]  # idempotency keys intact


# --- property-based sweep of the change-event projection (the one live
# seam whose semantics are provable hermetically; round-3 verdict #8)

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_OPS = ["insert", "update", "replace", "delete", "drop", "rename", "invalidate"]
_EXPECT_OP = {"insert": "i", "update": "u", "replace": "u", "delete": "d"}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(_OPS),
            st.integers(min_value=-(10**9), max_value=10**9),  # document key
            st.integers(min_value=0, max_value=2_000_000_000),  # clusterTime epoch s
            st.booleans(),  # connector surfaced fullDocument?
        ),
        min_size=1,
        max_size=25,
    )
)
def test_normalize_change_events_properties(spark, events):
    """For ANY generated change-stream event mix: op-type initials map
    correctly (CRUD only; DDL -> 'n' for oplog_filter to drop), ts_t is
    the clusterTime second, h is the documented 60-bit md5 of the full
    EVENT identity (documentKey JSON | ts_t | ts_i | operationType —
    per-op, not per-document, so an insert/update/delete sequence on
    one document never collapses in the quorum stage; recomputed here
    in pure Python), and o is null exactly when the connector surfaced no
    fullDocument (deletes)."""
    import hashlib

    rows = [
        (
            op,
            ct,
            {"db": f"db{abs(key) % 3}", "coll": f"c{abs(key) % 2}"},
            key,
            None if (op == "delete" or not has_doc) else key,
        )
        for op, key, ct, has_doc in events
    ]
    raw = spark.createDataFrame(
        rows,
        schema="operationType string, clusterTime long, "
        "ns struct<db:string,coll:string>, k long, fd long",
    ).select(
        "operationType",
        F.timestamp_seconds(F.col("clusterTime")).alias("clusterTime"),
        "ns",
        F.struct(F.col("k").alias("_id")).alias("documentKey"),
        F.when(F.col("fd").isNotNull(), F.struct(F.col("fd").alias("_id"))).alias(
            "fullDocument"
        ),
    )
    out = normalize_change_events(raw).collect()
    assert len(out) == len(events)
    for (op, key, ct, has_doc), r in zip(events, out):
        assert r.op == _EXPECT_OP.get(op, "n")
        assert r.ts_t == ct
        assert r.ns == f"db{abs(key) % 3}.c{abs(key) % 2}"
        doc_key_json = '{"_id":%d}' % key
        assert r.o2 == doc_key_json
        ident = f"{doc_key_json}|{ct}|0|{op}"
        assert r.h == int(hashlib.md5(ident.encode()).hexdigest()[:15], 16)
        if op == "delete" or not has_doc:
            assert r.o is None, (op, has_doc, r.o)
        else:
            assert r.o == doc_key_json
