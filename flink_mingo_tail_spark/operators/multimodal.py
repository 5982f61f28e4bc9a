"""Multimodal column handling (north-star extension, SURVEY.md §2B
"multimodal columns"): image/audio/video as opaque `binary` columns with
typed metadata, processed by Arrow-batched pandas functions.

The Spark-side plumbing here is REAL and load-bearing at scale:

* a typed envelope schema (binary payload + metadata struct) that
  partitions and prunes like any other column;
* `mapInPandas` operators that stream Arrow batches through Python
  without ever materializing a partition;
* deterministic, per-row pure transforms => safe under task retry.

The codecs are NOT real: this container has no image/audio libraries, so
decode/resize/frame-sample use a clearly-marked deterministic fake
(`_FAKE_CODEC`) and raise ``NotImplementedError`` when a real codec is
requested. Swapping in PIL/ffmpeg later changes only the inside of the
batch functions — schema, batching, and plan shape stay identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, format:string>"
)

FEATURE_DIM = 16

_FAKE_CODEC = True  # no PIL/ffmpeg in this environment — see module docstring


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media corpus derived from the documents table:
    payload bytes = sha256 stream of the text (stable across runs/engines),
    alternating image/audio kinds with plausible metadata."""
    payload = F.sha2(F.col("text"), 256).cast("binary")  # hex string bytes, 64 B
    kind = F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio")
    meta = F.struct(
        F.when(F.col("doc_id") % 2 == 0, (F.col("doc_id") % 8 + 1) * 64).otherwise(None).cast("int").alias("width"),
        F.when(F.col("doc_id") % 2 == 0, (F.col("doc_id") % 4 + 1) * 64).otherwise(None).cast("int").alias("height"),
        F.when(F.col("doc_id") % 2 == 1, 16000).otherwise(None).cast("int").alias("sample_rate"),
        F.when(F.col("doc_id") % 2 == 1, (F.col("doc_id") % 30 + 1) * 1000).otherwise(None).cast("int").alias("duration_ms"),
        F.when(F.col("doc_id") % 2 == 0, "png").otherwise("wav").alias("format"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def _feature_vector(payload: bytes) -> list[float]:
    """Deterministic fake featurizer: normalized 16-bin byte histogram.
    Stands in for a CNN/audio embedding; same signature, same batch shape."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    total = float(hist.sum()) or 1.0
    return [round(float(h) / total, 6) for h in hist]


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, kind, feature array<float>) via mapInPandas:
    Arrow batches in, Arrow batches out; nothing row-at-a-time, nothing
    collected. This is the decode/featurize plan shape for binary columns
    at 100 TB (pair with spark.sql.files.maxPartitionBytes tuning so a
    batch of payloads fits executor memory)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": pdf["payload"].map(_feature_vector),
                }
            )
            yield out

    # Project BEFORE the map: mapInPandas hands the Python function the
    # full child schema, so Catalyst cannot prune through it — without
    # this select the meta struct (and at scale, any unused blob column)
    # would be serialized into every Arrow batch just to be dropped.
    return media.select("media_id", "kind", "payload").mapInPandas(
        featurize, schema="media_id long, kind string, feature array<double>"
    )


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: RecordBatches in
    and out, histogram computed straight off the Arrow binary array's
    value buffer with vectorized numpy — no pandas materialization, no
    per-row Python objects.

    Why this exists alongside the mapInPandas path: for BINARY columns
    the Arrow→pandas conversion materializes one Python ``bytes`` object
    per row (an object-dtype copy of the whole payload column) before the
    featurizer sees a byte. At 100 TB of media payloads that copy — and
    the GC pressure of millions of short-lived bytes objects per batch —
    is the dominant Python-side cost. ``mapInArrow`` hands the worker the
    same Arrow buffers the JVM serialized, so the histogram below reads
    ONE contiguous uint8 view of the batch's payload bytes (offsets +
    values buffers) and bins all rows in two vectorized ops.

    Output is bit-identical to ``extract_features`` (asserted in
    tests/test_multimodal.py): same bins (byte >> 4 == numpy's 16-bin
    histogram over range(0, 256)), same round-to-6 normalization.
    """
    import pyarrow as pa

    def featurize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payload = batch.column(batch.schema.get_field_index("payload"))
            n = len(payload)
            # The pandas twin raises on a NULL payload (_feature_vector(None));
            # reading the value buffers below would instead emit an all-zero
            # vector for a null slot. Fail loudly so a future nullable payload
            # source can't silently diverge between the two paths.
            if payload.null_count:
                raise ValueError(
                    f"extract_features_arrow: {payload.null_count} NULL payloads in "
                    "batch; the featurizer contract requires non-null payload "
                    "(filter or fill before featurizing)"
                )
            # Binary array layout: buffers = [validity, offsets, data]. The
            # offsets are int32 for pa.binary but int64 for pa.large_binary
            # (Spark ships the latter when arrow.useLargeVarTypes=true);
            # reading large offsets as int32 would misparse lengths.
            if pa.types.is_large_binary(payload.type):
                offset_dtype = np.int64
            elif pa.types.is_binary(payload.type):
                offset_dtype = np.int32
            else:
                raise TypeError(f"payload must be binary/large_binary, got {payload.type}")
            # Respect the array's slice offset; rows are contiguous in the
            # value buffer, so one np.repeat aligns bytes to row indices.
            offsets = np.frombuffer(payload.buffers()[1], dtype=offset_dtype)[
                payload.offset : payload.offset + n + 1
            ]
            data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
            lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            chunk = data[offsets[0] : offsets[-1]]
            hist = np.bincount(
                row_idx * FEATURE_DIM + (chunk >> 4), minlength=n * FEATURE_DIM
            ).reshape(n, FEATURE_DIM)
            totals = hist.sum(axis=1, keepdims=True).astype(np.float64)
            totals[totals == 0.0] = 1.0
            feat = np.round(hist / totals, 6)
            feature = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * FEATURE_DIM, type=pa.int32()),
                pa.array(feat.ravel(), type=pa.float64()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    batch.column(batch.schema.get_field_index("kind")),
                    feature,
                ],
                names=["media_id", "kind", "feature"],
            )

    # Same pre-map projection as extract_features: pruning cannot cross
    # the MapInArrow barrier, so unused envelope columns must be dropped
    # here or they ride every serialized batch.
    return media.select("media_id", "kind", "payload").mapInArrow(
        featurize, schema="media_id long, kind string, feature array<double>"
    )


def decode_image(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode image payloads to (width, height, n_pixel_bytes).

    ``codec='fake'`` derives dimensions deterministically from metadata
    (real plumbing, fake pixels). Any real codec raises until an imaging
    library is available."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: no imaging library in this environment; "
            "only the deterministic 'fake' codec is wired (see module docstring)"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"]
            width = meta.map(lambda m: m["width"] if m is not None else None)
            height = meta.map(lambda m: m["height"] if m is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "n_pixel_bytes": (width.fillna(0) * height.fillna(0) * 3).astype("int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        decode, schema="media_id long, width int, height int, n_pixel_bytes long"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000, codec: str = "fake") -> DataFrame:
    """Audio/video frame sampling: one output row per sampled frame
    offset — the explode-shaped multimodal operator. Fake codec emits
    deterministic frame checksums from (payload sha, offset)."""
    if codec != "fake":
        raise NotImplementedError("only the deterministic 'fake' codec is wired")
    audio = media.filter(F.col("kind") == "audio")
    offsets = F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
    frame = audio.select(
        "media_id",
        F.explode(offsets).alias("frame_ms"),
        F.sha2(F.concat(F.hex(F.col("payload")), F.lit(":"), F.col("meta.duration_ms").cast("string")), 256).alias("_base"),
    )
    return frame.select(
        "media_id",
        "frame_ms",
        F.substring(F.sha2(F.concat(F.col("_base"), F.lit("@"), F.col("frame_ms").cast("string")), 256), 1, 16).alias(
            "frame_checksum"
        ),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup support (q225, round 11)
# ---------------------------------------------------------------------------

DHASH_BITS = 32  # bit j = payload[j] > payload[j+1]; needs DHASH_BITS+1 bytes


def synthesize_media_variants(documents: DataFrame, group_size: int = 5) -> DataFrame:
    """Deterministic fake media corpus WITH planted near-duplicates —
    the q120-injection pattern applied to the binary modality: every
    ``group_size`` consecutive doc_ids share one base payload (the
    sha256 hex stream of the group id), and each non-canonical member
    perturbs ONE byte at a member-specific position. Under dHash a
    one-byte change flips at most the two adjacent comparison bits, so
    within-group pairs sit at Hamming distance <= 4 (<= 2 vs the
    canonical member) — real near-dup structure for the banding to
    find, while cross-group payloads stay sha256-independent. Both
    engines build the identical bytes (sha2/sha256 hex + substr
    concat), so the oracle replays the hash bit-exactly."""
    # 1-based perturbation position: member m>0 edits char 3m+11
    # (14/17/20/23 for group_size=5) — spaced >=3 apart so no two
    # members' edits touch the same dHash comparison, all inside the
    # first DHASH_BITS+1 bytes. Spelled as ONE SQL expression so the
    # DuckDB oracle can replay it token-for-token.
    g = group_size
    payload = F.expr(
        f"CAST(CASE WHEN doc_id % {g} = 0 THEN sha2(CAST(doc_id DIV {g} AS STRING), 256) "
        f"ELSE concat(substr(sha2(CAST(doc_id DIV {g} AS STRING), 256), 1, (doc_id % {g}) * 3 + 10), "
        f"'z', substr(sha2(CAST(doc_id DIV {g} AS STRING), 256), (doc_id % {g}) * 3 + 12)) "
        f"END AS BINARY)"
    )
    kind = F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.expr(f"doc_id DIV {g}").cast("long").alias("grp"),
        (F.col("doc_id") % g).cast("long").alias("member"),
    )


def dhash_arrow(media: DataFrame, n_bits: int = DHASH_BITS) -> DataFrame:
    """Difference hash (dHash) of the binary payload via ``mapInArrow``
    — the perceptual fingerprint behind image near-dup at 100 TB,
    computed buffer-level like :func:`extract_features_arrow`: one
    contiguous uint8 view of the batch's payload bytes, one vectorized
    adjacent-byte comparison, one matmul against the bit weights. No
    per-row Python objects, no pandas copy of the blob column.

    On real images the payload would first be decoded + resampled to a
    (rows, cols+1) grayscale grid (the classic 8x9 dHash); this
    container has no codecs (module docstring), so the hash runs on the
    leading ``n_bits + 1`` raw payload bytes — the bit construction,
    banding contract and plan shape are identical, and swapping in a
    real decoder changes only the matrix fed to the comparison.

    Contract: every payload must carry at least ``n_bits + 1`` bytes
    (raises loudly, like the null-payload check — a short blob would
    silently hash garbage offsets otherwise)."""
    import pyarrow as pa

    def hash_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))
        for batch in batches:
            payload = batch.column(batch.schema.get_field_index("payload"))
            n = len(payload)
            if payload.null_count:
                raise ValueError(
                    f"dhash_arrow: {payload.null_count} NULL payloads in batch"
                )
            if pa.types.is_large_binary(payload.type):
                offset_dtype = np.int64
            elif pa.types.is_binary(payload.type):
                offset_dtype = np.int32
            else:
                raise TypeError(f"payload must be binary/large_binary, got {payload.type}")
            offsets = np.frombuffer(payload.buffers()[1], dtype=offset_dtype)[
                payload.offset : payload.offset + n + 1
            ]
            data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
            lengths = offsets[1:] - offsets[:-1]
            if n and int(lengths.min()) < n_bits + 1:
                raise ValueError(
                    f"dhash_arrow: payload shorter than {n_bits + 1} bytes "
                    f"(min {int(lengths.min())}) — cannot hash"
                )
            starts = offsets[:-1].astype(np.int64)
            idx = starts[:, None] + np.arange(n_bits + 1, dtype=np.int64)[None, :]
            mat = data[idx]
            bits = (mat[:, :-1] > mat[:, 1:]).astype(np.int64)
            ph = bits @ weights
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    pa.array(ph, type=pa.int64()),
                ],
                names=["media_id", "ph"],
            )

    # pre-map projection: pruning cannot cross the MapInArrow barrier
    return media.select("media_id", "payload").mapInArrow(
        hash_batches, schema="media_id long, ph long"
    )
