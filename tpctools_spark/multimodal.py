"""Multimodal binary-column processing (image/audio/video pattern).

Media lives in DataFrames as opaque ``binary`` columns plus typed
metadata; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row. This container ships no media codecs, so ``decode_media`` is a
deterministic stub behind an import-guard — the Spark-side plumbing
(schemas, batch shape, UDF signature, partitioning) is the real,
tested artifact.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_digest", StringType()),
        StructField("feat_mean_byte", DoubleType()),
        StructField("decoder", StringType()),
    ]
)


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode one media payload into features.

    STUB: real decoders (PIL/librosa/av) are not installed in this
    container. For non-text media this raises; for text payloads it
    computes deterministic fake features so the distributed plumbing is
    exercised end-to-end. Swap the body for a real codec in production.
    """
    if media_type.startswith(("image/", "audio/", "video/")):
        try:
            import PIL  # noqa: F401  (not installed here)
        except ImportError as exc:
            raise NotImplementedError(
                f"no codec available for {media_type}; install media libs"
            ) from exc
    # deterministic fake decode for text payloads
    return {
        "n_bytes": len(payload),
        "content_digest": hashlib.sha256(payload).hexdigest()[:16],
        "feat_mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
        "decoder": "stub-v1",
    }


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_type).

    ``mapInPandas`` streams Arrow record batches into Python — the bytes
    cross the JVM↔Python boundary once per batch, not per row. The
    output schema is fixed (FEATURE_SCHEMA) so downstream plans are
    stable regardless of the decoder.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(
                    bytes(payload) if payload is not None else b"", media_type
                )
                for payload, media_type in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return df.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("byte_offset", LongType()),
        StructField("frame_digest", StringType()),
    ]
)

FRAMES_PER_DOC = 3


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: one media row fans out to N frame rows.

    The video pattern at 100 TB — ``mapInPandas`` output cardinality is
    independent of input cardinality, so a decoder can emit a row per
    sampled frame without exploding anything JVM-side first. The stub
    "decoder" samples FRAMES_PER_DOC evenly-spaced byte offsets and
    fingerprints a 64-byte window at each; a real build swaps the body
    for av/ffmpeg keyframe extraction with the same schema and shape.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if not data:
                    continue
                for i in range(FRAMES_PER_DOC):
                    off = (len(data) * i) // FRAMES_PER_DOC
                    window = data[off : off + 64]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_index": i,
                            "byte_offset": off,
                            "frame_digest": hashlib.sha256(window).hexdigest()[:16],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload_out", StringType()),  # digest stand-in for bytes
    ]
)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: 1:1 payload transform with decoder-owned output.

    Real builds decode → resample → re-encode inside the batch loop
    (PIL/av); this container has no codecs, so the stub emits the target
    geometry plus a digest of the bytes a real resize would transform.
    The Spark-side contract — Arrow batches in, fixed schema out, one
    row per input row — is the tested artifact.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": width,
                    "height": height,
                    "payload_out": [
                        hashlib.sha256(
                            (bytes(p) if p is not None else b"")
                            + f"{width}x{height}".encode()
                        ).hexdigest()[:16]
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out[[f.name for f in RESIZE_SCHEMA.fields]]

    return df.mapInPandas(run, RESIZE_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)

PHASH_SLICES = 8


def perceptual_hash(df: DataFrame) -> DataFrame:
    """aHash-style perceptual fingerprint over the payload bytes.

    The image near-dup pattern: downsample to a tiny grid, threshold
    each cell against the global mean, pack bits. The stub "grid" is
    PHASH_SLICES equal byte slices of the payload (a real build
    decodes pixels first — same shape, same schema). Pure-int sums /
    exact float division keep the bits reproducible in SQL.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = len(data)
                if n == 0:
                    out.append({"doc_id": doc_id, "phash": 0})
                    continue
                total_mean = sum(data) / n
                h = 0
                for j in range(PHASH_SLICES):
                    s = data[j * n // PHASH_SLICES : (j + 1) * n // PHASH_SLICES]
                    if s and sum(s) / len(s) > total_mean:
                        h |= 1 << j
                out.append({"doc_id": doc_id, "phash": h})
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return df.mapInPandas(run, PHASH_SCHEMA)


AUDIO_SEGMENT_SAMPLES = 100  # stub "sample rate": 100 bytes = one segment
AUDIO_SEGMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("segment_index", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
    ]
)


def segment_audio(df: DataFrame) -> DataFrame:
    """Audio-segmentation plumbing: one waveform row fans out to one
    row per fixed-length segment, each carrying integer signal stats.

    The audio pattern at 100 TB: a decoder (ffmpeg/soundfile in a real
    build) emits per-window features — here the stub treats the payload
    bytes as unsigned 8-bit PCM at AUDIO_SEGMENT_SAMPLES samples per
    segment and computes exact integer energy Σ(b−64)² and peak
    amplitude per segment (ASCII payloads keep byte == code point, so
    SQL reproduces both). Output cardinality is decoder-controlled —
    ceil(n_bytes / segment) rows per doc — the same fan-out contract as
    ``sample_frames``.
    """

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized over the Arrow batch: per-sample arithmetic happens
        # in numpy (a real decoder works on sample arrays the same way);
        # the Python-level loop is per document, never per byte.
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                for i in range(0, (len(data) + AUDIO_SEGMENT_SAMPLES - 1)
                               // AUDIO_SEGMENT_SAMPLES):
                    seg = a[i * AUDIO_SEGMENT_SAMPLES:
                            (i + 1) * AUDIO_SEGMENT_SAMPLES]
                    d = seg - 64
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "segment_index": i,
                            "n_samples": int(seg.size),
                            "energy": int(np.dot(d, d)),
                            "peak": int(seg.max()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SEGMENT_SCHEMA.fields]
            )

    return df.mapInPandas(run, AUDIO_SEGMENT_SCHEMA)
