"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel through the engine as ``binary`` columns with a
struct of typed metadata, processed by Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing (schemas, batching, partition sizing) is real and
tested; the actual codec calls are STUBBED — image/audio libraries are not
available in this container. Each stub either raises ``NotImplementedError``
(``strict=True``) or produces a deterministic fake derived from the payload
bytes, so pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "AUDIO_FEATURE_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "attach_binary_metadata",
    "decode_and_featurize_images",
    "decode_audio_features",
    "parse_png_header",
    "sample_video_frames",
]

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_binary_metadata(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image/png"
) -> DataFrame:
    """Add the typed metadata struct every multimodal payload carries."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(payload_col).cast("string")).alias("checksum"),
        ),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def parse_png_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, channels) from a PNG IHDR chunk — pure struct parsing.

    The PNG container format is public and trivially parseable without a codec
    library: an 8-byte signature, then chunks of (length BE32, type, data,
    crc); IHDR is required to be first and carries width/height (BE32 each),
    bit depth and color type. Returns None for anything that is not a valid
    PNG header (callers fall back or raise per their ``strict`` setting).
    """
    if payload is None or len(payload) < 26 or not payload.startswith(_PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    channels = _PNG_CHANNELS.get(payload[25])
    if channels is None or width == 0 or height == 0:
        return None
    return width, height, channels


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions/features derived from the bytes.

    Stands in for a real codec (PIL/libvips/ffmpeg are unavailable here). The
    mapping is stable: identical payloads -> identical features.
    """
    digest = hashlib.md5(payload if payload is not None else b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 3
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, channels, feature


def decode_and_featurize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode image payloads and emit (dims, feature vector) per document.

    Arrow-batched ``mapInPandas`` with a declared output schema. PNG payloads
    get REAL metadata extraction — a pure-Python IHDR parse
    (:func:`parse_png_header`), no codec library needed. Non-PNG payloads fall
    back to the deterministic fake (``strict=True`` raises
    ``NotImplementedError`` instead — that is the plug-in point for a pixel
    codec like PIL/libvips). The feature vector remains a payload-derived
    stub in both paths (a real featurizer needs pixel decoding).

    Scale note: payload columns dominate partition size — upstream should set
    ``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits in
    executor memory, and this stage should run *after* any metadata-only
    filtering so undecodable/filtered payloads are never shipped.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "channels": [], "feature": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                hdr = parse_png_header(payload)
                if hdr is not None:
                    w, h, c = hdr
                    digest = hashlib.md5(payload).digest()
                    feat = [b / 255.0 for b in digest[:8]]
                elif strict:
                    raise NotImplementedError(
                        "payload is not a PNG; decoding other formats requires "
                        "a codec library (PIL/libvips), unavailable here"
                    )
                else:
                    w, h, c, feat = _fake_decode(payload)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms_energy", FloatType()),
    ]
)


def decode_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Audio decode + feature stage (sample rate, length, RMS) — codec stubbed.

    Same plumbing contract as :func:`decode_and_featurize_images`; a real
    implementation plugs soundfile/ffmpeg into the marked spot.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("real audio decode requires soundfile/ffmpeg")
            out = {"doc_id": [], "sample_rate": [], "n_samples": [], "rms_energy": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(payload if payload is not None else b"").digest()
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(16000)
                out["n_samples"].append(1000 + digest[2] * 100)
                out["rms_energy"].append(digest[3] / 255.0)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("codec", StringType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    n_frames: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame.

    Demonstrates the 1->N multimodal fan-out shape (``mapInPandas`` yielding
    more rows than it consumes). Frame extraction is stubbed: deterministic
    byte slices stand in for decoded frames.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("real frame extraction requires ffmpeg")
            rows = {"doc_id": [], "frame_idx": [], "frame": [], "codec": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = payload if payload is not None else b""
                for i in range(n_frames):
                    start = (i * every_n) % max(len(data), 1)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i * every_n)
                    rows["frame"].append(bytes(data[start : start + 16]))
                    rows["codec"].append("fake/raw")
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_sample, schema=VIDEO_FRAME_SCHEMA)
