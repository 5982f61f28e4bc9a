"""Bloom membership sketch + persisted incremental index
(operators/dedup.py round 13): determinism, no-false-negatives,
OR-merge idempotency, fixed-size state, manifest discipline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import (
    BLOOM_K,
    bloom_bits,
    bloom_m_bits,
    bloom_probe,
    build_bloom_index,
    probe_bloom_index,
)
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE


def _keys(spark, pred):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .filter(pred)
        .select("doc_id", F.md5("text").alias("ch"))
    )


def test_bloom_never_misses_a_member(spark):
    members = _keys(spark, F.col("doc_id") % 10 != 7)
    m = bloom_m_bits(members.count())
    bloom = bloom_bits(members.select("ch"), "ch", m)
    got = bloom_probe(members, bloom, id_col="doc_id", key_col="ch", m_bits=m)
    assert got.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_m_bits_rule(spark):
    assert bloom_m_bits(1) == 4
    assert bloom_m_bits(100) == 512       # 4*100=400 -> 512
    assert bloom_m_bits(128) == 512       # 4*128=512 exactly -> 512
    assert bloom_m_bits(129) == 1024
    with pytest.raises(ValueError):
        bloom_m_bits(0)


def test_bloom_state_is_fixed_size_and_append_idempotent(spark, tmp_path):
    path = f"{tmp_path}/bloom"
    b0 = _keys(spark, F.col("doc_id") % 3 == 0)
    b1 = _keys(spark, F.col("doc_id") % 3 == 1)
    probes = _keys(spark, F.col("doc_id") % 3 == 2)
    build_bloom_index(b0.select("ch").distinct(), path, key_col="ch")
    size0 = spark.read.parquet(f"{path}/bits").count()
    before = {
        r.doc_id: r.bloom_hit
        for r in probe_bloom_index(probes, path, id_col="doc_id", key_col="ch").collect()
    }
    build_bloom_index(b1.select("ch"), path, key_col="ch", mode="append")
    build_bloom_index(b1.select("ch"), path, key_col="ch", mode="append")  # replay
    after = {
        r.doc_id: r.bloom_hit
        for r in probe_bloom_index(probes, path, id_col="doc_id", key_col="ch").collect()
    }
    # hits only grow (OR is monotone) and the table never does
    assert all(after[i] or not before[i] for i in before)
    m = spark.read.parquet(f"{path}/manifest").head().m_bits
    assert spark.read.parquet(f"{path}/bits").count() <= m // 32
    assert size0 <= m // 32
    # every b1 member now hits (no false negatives after merge)
    b1_hits = probe_bloom_index(b1, path, id_col="doc_id", key_col="ch")
    assert b1_hits.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_manifest_discipline(spark, tmp_path):
    path = f"{tmp_path}/bloom"
    b0 = _keys(spark, F.col("doc_id") < 100)
    with pytest.raises(ValueError, match="no manifest found"):
        build_bloom_index(b0.select("ch"), path, key_col="ch", mode="append")
    build_bloom_index(b0.select("ch"), path, key_col="ch", m_bits=1024)
    with pytest.raises(ValueError, match="refusing to append"):
        build_bloom_index(b0.select("ch"), path, key_col="ch", m_bits=2048, mode="append")
    with pytest.raises(ValueError, match="refusing to append"):
        build_bloom_index(b0.select("ch"), path, key_col="ch", k=BLOOM_K + 1, mode="append")
    with pytest.raises(ValueError, match="no bloom index manifest"):
        probe_bloom_index(b0, f"{tmp_path}/nope", id_col="doc_id", key_col="ch")


def test_bloom_cross_family_manifest_rejected(spark, tmp_path):
    from flink_mingo_tail_spark.operators.dedup import build_dedup_index

    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 60)
    ded = f"{tmp_path}/ded"
    build_dedup_index(d, ded)
    with pytest.raises(ValueError, match="wrong index family"):
        probe_bloom_index(
            _keys(spark, F.col("doc_id") < 10), ded, id_col="doc_id", key_col="ch"
        )
