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


def test_es_bulk_writer_batches_through_transport(spark):
    """foreachBatch sink: one transport call per max_docs chunk, NDJSON
    action/source pairs, {'data': doc} envelope."""
    calls: list[tuple[str, bytes, str]] = []

    def fake_transport(url: str, body: bytes, content_type: str) -> int:
        calls.append((url, body, content_type))
        return 200

    writer = make_es_bulk_writer(
        "http://es:9200", "oplog-index", transport=fake_transport, max_docs_per_request=2
    )
    batch = spark.createDataFrame(
        [(1, "i", "test.grades"), (2, "i", "test.grades"), (3, "d", "test.grades")],
        schema="h long, op string, ns string",
    )
    writer(batch, batch_id=7)

    assert len(calls) == 2  # 3 docs, 2 per request
    url, body, ctype = calls[0]
    assert url == "http://es:9200/_bulk" and ctype == "application/x-ndjson"
    lines = body.decode().strip().split("\n")
    assert len(lines) == 4  # 2 docs x (action + source)
    action, source = json.loads(lines[0]), json.loads(lines[1])
    assert action["index"]["_index"] == "oplog-index"
    assert set(source) == {"data"} and source["data"]["ns"] == "test.grades"


def test_es_bulk_writer_raises_on_http_error(spark):
    writer = make_es_bulk_writer(
        "http://es:9200", "idx", transport=lambda *a: 503, max_docs_per_request=10
    )
    batch = spark.createDataFrame([(1, "i", "x")], schema="h long, op string, ns string")
    try:
        writer(batch, batch_id=0)
    except RuntimeError as e:
        assert "503" in str(e)
    else:
        raise AssertionError("expected RuntimeError on HTTP 503")
