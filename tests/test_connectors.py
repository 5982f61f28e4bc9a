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


def test_es_bulk_writer_raises_on_http_error(spark):
    writer = make_es_bulk_writer(
        "http://es:9200", "idx", transport=_always_503, max_docs_per_request=10
    )
    batch = spark.createDataFrame([(1, "i", "x")], schema="h long, op string, ns string")
    try:
        writer(batch, batch_id=0)
    except Exception as e:  # executor RuntimeError surfaces wrapped by Py4J
        assert "503" in str(e)
    else:
        raise AssertionError("expected failure on HTTP 503")
