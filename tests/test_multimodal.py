"""Multimodal plumbing: schema, Arrow batch shape, determinism, and the
stubbed-codec gate (operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    extract_features_arrow,
    frame_sample,
    synthesize_media,
)
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF_SMOKE, "documents"))


def test_media_schema_and_payloads(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.orderBy("media_id").first()
    assert len(row.payload) == 64  # sha256 hex bytes
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio"}


def test_feature_extraction_deterministic(spark, media):
    f1 = extract_features(media).orderBy("media_id").collect()
    f2 = extract_features(media).orderBy("media_id").collect()
    assert f1 == f2  # deterministic across runs (task-retry safe)
    for r in f1[:10]:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-4  # normalized histogram


def test_arrow_featurizer_bit_identical_to_pandas(spark, media):
    """extract_features_arrow (mapInArrow, buffer-level histogram) must
    produce exactly the rows of extract_features (mapInPandas) — same
    bins, same normalization, same rounding — so the two are drop-in
    interchangeable and q145 can share q95's oracle."""
    via_pandas = extract_features(media).orderBy("media_id").collect()
    via_arrow = extract_features_arrow(media).orderBy("media_id").collect()
    assert via_arrow == via_pandas


def test_arrow_featurizer_handles_sliced_and_empty_batches(spark):
    """Buffer math must respect the Arrow array's slice offset (a
    filtered/sliced batch has offset > 0) and tolerate empty batches."""
    from flink_mingo_tail_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", b"\x00\x10\x20\x30", None),
        (2, "audio", b"", None),
        (3, "image", b"\xff" * 8, None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r.media_id: r.feature for r in extract_features_arrow(df).collect()}
    assert got[1] == [0.25, 0.25, 0.25, 0.25] + [0.0] * 12  # bins 0-3, one byte each
    assert got[2] == [0.0] * FEATURE_DIM  # empty payload -> zero vector
    assert got[3] == [0.0] * 15 + [1.0]  # all 0xff -> last bin


def test_arrow_featurizer_large_binary_offsets(spark):
    """With spark.sql.execution.arrow.useLargeVarTypes=true the worker
    receives large_binary (int64 offsets); reading those as int32 would
    misparse lengths. The featurizer must branch on the Arrow type and
    still produce the standard-binary results."""
    from flink_mingo_tail_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", b"\x00\x10\x20\x30", None),
        (2, "audio", b"", None),
        (3, "image", b"\xff" * 8, None),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    key = "spark.sql.execution.arrow.useLargeVarTypes"
    old = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        got = {r.media_id: r.feature for r in extract_features_arrow(df).collect()}
    finally:
        spark.conf.set(key, old)
    assert got[1] == [0.25, 0.25, 0.25, 0.25] + [0.0] * 12
    assert got[2] == [0.0] * FEATURE_DIM
    assert got[3] == [0.0] * 15 + [1.0]


def test_arrow_featurizer_rejects_null_payload(spark):
    """The pandas twin raises on NULL payloads; the Arrow path must fail
    loudly too (not emit a silent all-zero vector) so the twins never
    diverge on a nullable source."""
    from pyspark.errors.exceptions.base import PySparkException

    from flink_mingo_tail_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame([(1, "image", None, None)], schema=MEDIA_SCHEMA)
    with pytest.raises(PySparkException, match="NULL payloads"):
        extract_features_arrow(df).collect()


def test_decode_image_fake_codec_and_gate(media):
    decoded = decode_image(media, codec="fake").collect()
    assert all(r.n_pixel_bytes == r.width * r.height * 3 for r in decoded)
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(media, codec="pillow")


def test_frame_sample_counts(media):
    frames = frame_sample(media, every_ms=1000)
    per_media = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    durations = {
        r.media_id: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "audio").select("media_id", "meta").collect()
    }
    for r in per_media:
        expected = (durations[r.media_id] - 1) // 1000 + 1
        assert r.n == expected, f"media {r.media_id}: {r.n} != {expected}"
    # checksums unique per (media, frame)
    assert frames.count() == frames.select("media_id", "frame_checksum").distinct().count()
