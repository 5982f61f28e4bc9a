"""The reference's full production scenario, end to end on Spark:

    sharded `test.grades` writes → per-member oplog tails (oplog_sim
    source) → pushed-down filter → majority-quorum dedup → JSON payload
    parse → CDC apply → queryable current-state `grades` table.

The reference stops at an ES index of raw ops (SURVEY.md §0); this test
closes the last mile to the materialized collection state, including
update and delete ops — i.e. what a user of the reference would actually
need to reproduce their `test.grades` collection downstream.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from flink_mingo_tail_spark.sources.oplog import register, write_member_logs
from flink_mingo_tail_spark.streaming.apply import apply_cdc_stream
from flink_mingo_tail_spark.streaming.pipeline import build_cdc_stream

MEMBERS = ("m0:27017", "m1:27017", "m2:27017")


def _deliver(ops: list[dict]) -> pd.DataFrame:
    """Fan each logical op out to every replica member (the 3x delivery
    the quorum gate must collapse)."""
    rows = []
    for seq, op in enumerate(ops):
        for m_i, member in enumerate(MEMBERS):
            rows.append(
                {
                    "ts_t": 1_700_000_000 + seq,
                    "ts_i": m_i + 1,
                    "h": 5000 + seq,
                    "op": op["op"],
                    "ns": "test.grades",
                    "fromMigrate": None,
                    "o": json.dumps(op["doc"]),
                    "o2": None,
                    "shard": f"s{op['doc'].get('student_id', 0) % 3}",
                    "member_host": member,
                }
            )
    return pd.DataFrame(rows)


def test_grades_collection_materializes(spark, tmp_path):
    logs = str(tmp_path / "logs")
    state = str(tmp_path / "grades_state")
    ck = str(tmp_path / "ck")

    wave1 = [
        {"op": "i", "doc": {"student_id": 1, "class_id": 10, "type": "exam", "score": 88.0}},
        {"op": "i", "doc": {"student_id": 2, "class_id": 10, "type": "exam", "score": 71.0}},
        {"op": "i", "doc": {"student_id": 3, "class_id": 11, "type": "quiz", "score": 95.0}},
    ]
    write_member_logs(_deliver(wave1), logs)
    register(spark)

    def start():
        stream = spark.readStream.format("oplog_sim").option("path", logs).load()
        deduped = build_cdc_stream(stream, replica_depth=3)
        parsed = deduped.select(
            "op",
            "ts_t",
            "ts_i",
            F.get_json_object("o", "$.student_id").cast("long").alias("student_id"),
            F.get_json_object("o", "$.class_id").cast("int").alias("class_id"),
            F.get_json_object("o", "$.type").alias("type"),
            F.get_json_object("o", "$.score").cast("double").alias("score"),
        )
        return apply_cdc_stream(
            parsed, state, ck, key="student_id", order_by=["ts_t", "ts_i"]
        )

    q = start()
    try:
        q.processAllAvailable()
        grades = {
            r.student_id: (r.class_id, r.type, r.score)
            for r in spark.read.parquet(state).collect()
        }
        assert grades == {
            1: (10, "exam", 88.0),
            2: (10, "exam", 71.0),
            3: (11, "quiz", 95.0),
        }

        # wave 2, appended to the same member logs mid-flight: update
        # student 1's score, delete student 2
        wave2 = [
            {"op": "u", "doc": {"student_id": 1, "class_id": 10, "type": "exam", "score": 93.0}},
            {"op": "d", "doc": {"student_id": 2}},
        ]
        pdf = _deliver(wave2)
        pdf["ts_t"] += 100
        pdf["h"] += 100
        write_member_logs(pdf, logs)
        q.processAllAvailable()
    finally:
        q.stop()

    grades = {
        r.student_id: (r.class_id, r.type, r.score) for r in spark.read.parquet(state).collect()
    }
    assert grades == {
        1: (10, "exam", 93.0),  # updated exactly once despite 3x delivery
        3: (11, "quiz", 95.0),  # untouched
    }  # student 2 deleted
