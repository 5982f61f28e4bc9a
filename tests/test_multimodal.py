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


def test_dhash_arrow_matches_python_reference(spark):
    """dhash_arrow's buffer-level bit construction must equal the
    obvious per-row Python reference on the planted-variant corpus:
    bit j = payload[j] > payload[j+1] over the first 33 bytes."""
    from flink_mingo_tail_spark.operators.multimodal import (
        DHASH_BITS,
        dhash_arrow,
        synthesize_media_variants,
    )

    media = synthesize_media_variants(load_table(spark, SF_SMOKE, "documents"))
    got = {r.media_id: r.ph for r in dhash_arrow(media).collect()}
    for r in media.select("media_id", "payload").collect():
        b = bytes(r.payload)
        ref = sum(
            (1 << j) for j in range(DHASH_BITS) if b[j] > b[j + 1]
        )
        assert got[r.media_id] == ref, r.media_id
    assert len(got) == media.count()


def test_dhash_arrow_rejects_short_and_null_payloads(spark):
    """The loud-contract checks: a payload shorter than n_bits+1 bytes
    and a NULL payload must both raise, not hash garbage."""
    import pytest

    from flink_mingo_tail_spark.operators.multimodal import dhash_arrow

    short = spark.createDataFrame(
        [(1, bytearray(b"tiny"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="shorter|PythonException"):
        dhash_arrow(short).collect()
    null = spark.createDataFrame(
        [(1, None)], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="NULL|PythonException"):
        dhash_arrow(null).collect()


def test_perceptual_near_dup_planted_pairs_guaranteed(spark):
    """q225 structural pins: (a) every output pair is within the Hamming
    threshold; (b) pigeonhole completeness — EVERY pair whose true dHash
    distance is <= 3 appears in the output (blocking may only add
    candidates, the popcount filter makes the answer exact); (c) every
    (canonical, variant) within-group pair sits at distance <= 2 and is
    therefore always caught."""
    from flink_mingo_tail_spark.operators.multimodal import (
        DHASH_BITS,
        synthesize_media_variants,
    )
    from flink_mingo_tail_spark.queries import load_registry

    REG = load_registry()
    out = {
        (r.media_a, r.media_b): r.hamming
        for r in REG["q225_perceptual_hash_near_dup"].fn(spark, SF_SMOKE).collect()
    }
    media = synthesize_media_variants(load_table(spark, SF_SMOKE, "documents"))
    ph = {}
    grp = {}
    for r in media.select("media_id", "payload", "grp", "member").collect():
        b = bytes(r.payload)
        ph[r.media_id] = sum((1 << j) for j in range(DHASH_BITS) if b[j] > b[j + 1])
        grp[r.media_id] = (r.grp, r.member)
    ids = sorted(ph)
    truth = {}
    for i, a in enumerate(ids):
        for bb in ids[i + 1:]:
            d = bin(ph[a] ^ ph[bb]).count("1")
            if d <= 3:
                truth[(a, bb)] = d
    assert out == truth  # exact: no misses (pigeonhole), no extras (filter)
    for (a, bb), d in truth.items():
        ga, ma = grp[a]
        gb, mb = grp[bb]
        if ga == gb and (ma == 0 or mb == 0):
            assert d <= 2, (a, bb, d)  # canonical-vs-variant bound


def test_perceptual_dup_components_closure(spark):
    """q228 invariants vs q225's pairs: both endpoints of every pair
    share a component; every non-singleton component's representative
    is its min member; is_dup marks exactly the non-representative
    members; isolated media are singletons."""
    from flink_mingo_tail_spark.queries import load_registry

    REG = load_registry()
    pairs = REG["q225_perceptual_hash_near_dup"].fn(spark, SF_SMOKE).collect()
    comp = {
        r.media_id: (r.component, r.is_dup)
        for r in REG["q228_perceptual_dup_components"].fn(spark, SF_SMOKE).collect()
    }
    for r in pairs:
        assert comp[r.media_a][0] == comp[r.media_b][0], (r.media_a, r.media_b)
    members: dict = {}
    for mid, (c, _dup) in comp.items():
        members.setdefault(c, []).append(mid)
    paired = {r.media_a for r in pairs} | {r.media_b for r in pairs}
    for c, ms in members.items():
        assert c == min(ms), (c, ms)
        for mid in ms:
            assert comp[mid][1] == (mid != c), (mid, c)
        if len(ms) == 1 and ms[0] not in paired:
            assert comp[ms[0]] == (ms[0], False)
