#!/usr/bin/env python
"""Multimodal curation: images, audio and video through REAL decoders.

The media half of a training-data pipeline, end to end, with no codec
library — every decode below is the suite's own pure-Python
implementation:

    images (BMP + lossless-WebP/VP8L containers, duplicates planted
    cross-format)
      -> image_hash_table / image_near_dup_pairs (perceptual dhash +
         pigeonhole-banded pair join) -> drop the re-encoded copies
    audio clips (WAV + FLAC, with silent and clipped plants)
      -> audio_quality_features (real-PCM RMS/clip/silence/spectral gate)
    an MJPEG AVI video
      -> sample_video_frames -> decode_and_featurize_images (frames are
         real JPEGs; the image stage computes real pixel stats)

Fixture media is synthesized on the fly, so the example runs anywhere.

Run: python examples/multimodal_curation.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
from pyspark.sql import functions as F

from sat_bucket_spark import get_spark
from sat_bucket_spark.operators.audio import audio_quality_features
from sat_bucket_spark.operators.imagehash import (
    image_hash_table,
    image_near_dup_pairs,
)
from sat_bucket_spark.operators.jpeg import encode_jpeg_baseline
from sat_bucket_spark.operators.multimodal import (
    decode_and_featurize_images,
    sample_video_frames,
)


# ----- fixture builders (the same shapes the test suites use) -----------


def bmp_bytes(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_bytes, stride = w * 3, (w * 3 + 3) & ~3
    data = b"".join(
        px[y][:, ::-1].tobytes() + b"\x00" * (stride - row_bytes)
        for y in range(h - 1, -1, -1)
    )
    return (
        b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + b"\x00" * 16 + data
    )


def webp_bytes(px: np.ndarray) -> bytes:
    from test_vp8l import encode_vp8l, wrap_webp  # the test-side encoder

    h, w, _ = px.shape
    argb = [
        (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b in px.reshape(-1, 3)
    ]
    return wrap_webp(encode_vp8l(argb, w, h))


def wav_bytes(samples: np.ndarray, rate: int = 16000) -> bytes:
    pcm = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )


def flac_bytes(samples: np.ndarray, rate: int = 16000) -> bytes:
    from test_flac import encode_flac

    return encode_flac([[int(v) for v in samples]], sample_rate=rate)


def avi_bytes(frames: list[bytes], w=16, h=16) -> bytes:
    def chunk(cc, body):
        return cc + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) % 2 else b""
        )

    avih = (
        (33333).to_bytes(4, "little") + b"\x00" * 12
        + len(frames).to_bytes(4, "little") + b"\x00" * 12
        + w.to_bytes(4, "little") + h.to_bytes(4, "little") + b"\x00" * 16
    )
    body = b"AVI " + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)) + chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def main() -> None:
    spark = get_spark(app_name="multimodal-curation-example")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)

    # 1. IMAGES: ten distinct pictures; picture 0 also ships as a WebP
    #    re-encode (identical pixels) and a slightly-noised BMP copy
    pics = [rng.integers(0, 256, (24, 24, 3), dtype=np.uint8) for _ in range(10)]
    noised = pics[0].copy()
    noised[3, 3] = 255 - noised[3, 3]
    images = [(i, bmp_bytes(p)) for i, p in enumerate(pics)]
    images += [(100, webp_bytes(pics[0])), (101, bmp_bytes(noised))]
    img_df = spark.createDataFrame(images, "doc_id long, payload binary")

    pairs = image_near_dup_pairs(img_df, max_hamming=6).collect()
    print(f"image near-dup pairs (hamming <= 6): "
          f"{sorted((r['id_a'], r['id_b'], r['hamming']) for r in pairs)}")
    drop = {max(r["id_a"], r["id_b"]) for r in pairs}  # keep-first
    kept = img_df.where(~F.col("doc_id").isin(*drop) if drop else F.lit(True))
    print(f"images: {img_df.count()} in, {kept.count()} after perceptual dedup")
    hashes = image_hash_table(img_df).where(F.col("doc_id").isin(0, 100, 101))
    print("cross-format hashes (0=BMP, 100=WebP re-encode, 101=noised):")
    hashes.orderBy("doc_id").show()

    # 2. AUDIO: a clean tone (as WAV and as FLAC), a silent clip, a
    #    clipped recording — the quality gate separates them
    t = np.arange(8000) / 16000.0
    tone = np.round(0.4 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int64)
    clipped = np.clip(tone * 4, -32767, 32767).astype(np.int64)
    silent = np.zeros(8000, dtype=np.int64)
    audio = spark.createDataFrame(
        [
            (1, wav_bytes(tone)), (2, flac_bytes(tone)),
            (3, wav_bytes(silent)), (4, wav_bytes(clipped)),
        ],
        "doc_id long, payload binary",
    )
    feats = audio_quality_features(audio)
    print("audio quality gate (keep: rms > -40 dBFS, clip < 1%, "
          "silence < 50%):")
    feats.select(
        "doc_id", "rms_db", "clip_frac", "silence_frac",
        "spectral_centroid_hz",
        ((F.col("rms_db") > -40) & (F.col("clip_frac") < 0.01)
         & (F.col("silence_frac") < 0.5)).alias("keep"),
    ).orderBy("doc_id").show()

    # 3. VIDEO: an MJPEG AVI; sampled frames feed the image stage
    frames = [
        encode_jpeg_baseline(
            (np.arange(256).reshape(16, 16) % 200 + 3 * i).astype(np.uint8),
            np.ones((8, 8)), np.ones((8, 8)),
        )
        for i in range(6)
    ]
    video = spark.createDataFrame(
        [(1, avi_bytes(frames))], "doc_id long, payload binary"
    )
    sampled = sample_video_frames(video, every_n=2, n_frames=3, strict=True)
    frame_feats = decode_and_featurize_images(
        sampled.select(
            F.col("frame_idx").alias("doc_id"), F.col("frame").alias("payload")
        ),
        strict=True,
    )
    print("video -> sampled MJPEG frames -> real pixel stats:")
    frame_feats.select("doc_id", "width", "height",
                       F.round(F.element_at("feature", 1), 4).alias("mean"),
                       ).orderBy("doc_id").show()


if __name__ == "__main__":
    main()
