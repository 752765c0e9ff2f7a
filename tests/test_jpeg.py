"""Tests: pure-Python baseline JPEG decode (operators/jpeg.py) and its
integration into the multimodal pixel-decode dispatch.

Decoder validity is checked two independent ways: round-trips through the
in-repo fixture encoder (whose forward DCT / canonical-code paths are
separate code), and decode of REAL JPEGs produced by third-party encoders
(shipped with CPython / IPython test data, skipped if absent) — so an
encoder/decoder bug pair cannot cancel out.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from sat_bucket_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_baseline,
)
from sat_bucket_spark.operators.multimodal import (
    decode_image_pixels,
    parse_jpeg_header,
    _pixel_features,
)

_REAL_COLOR = [
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.jpg",
    "/usr/lib/python3/dist-packages/../test/test_email/data/python.jpg",
]
_REAL_GRAY = [
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/site-packages/IPython/core/tests/2x2.jpg",
]
_REAL_PROGRESSIVE = [
    "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/rust/html/embedded-book/assets/f3.jpg",
]


def _first_existing(paths):
    for p in paths:
        if os.path.exists(p):
            return p
    return None


class TestRoundTrip:
    def test_gray_near_lossless(self):
        gray = np.linspace(0, 255, 24 * 16).reshape(24, 16).astype(np.uint8)
        enc = encode_jpeg_baseline(gray, quant_luma=np.ones((8, 8)))
        dec = decode_jpeg_pixels(enc)
        assert dec.shape == (24, 16, 1)
        assert int(np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max()) <= 2

    def test_rgb_near_lossless_odd_dims(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, (17, 19, 3)).astype(np.uint8)
        enc = encode_jpeg_baseline(
            rgb, quant_luma=np.ones((8, 8)), quant_chroma=np.ones((8, 8))
        )
        dec = decode_jpeg_pixels(enc)
        assert dec.shape == (17, 19, 3)
        # random noise is the worst case for 4:4:4 unit-quant: error is DCT
        # rounding + color-transform rounding only
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 4

    def test_standard_tables_smooth_image(self):
        smooth = np.clip(
            np.add.outer(np.arange(32) * 3, np.arange(40) * 2), 0, 255
        ).astype(np.uint8)
        enc = encode_jpeg_baseline(smooth)
        dec = decode_jpeg_pixels(enc)
        assert dec.shape == (32, 40, 1)
        err = np.abs(dec[:, :, 0].astype(int) - smooth.astype(int))
        assert float(err.mean()) < 3.0

    def test_header_matches_decode(self):
        gray = np.full((9, 13), 77, dtype=np.uint8)
        enc = encode_jpeg_baseline(gray)
        assert parse_jpeg_header(enc) == (13, 9, 1)
        dec = decode_jpeg_pixels(enc)
        assert dec.shape == (9, 13, 1)

    def test_flat_image_exact(self):
        flat = np.full((8, 8), 200, dtype=np.uint8)
        enc = encode_jpeg_baseline(flat, quant_luma=np.ones((8, 8)))
        dec = decode_jpeg_pixels(enc)
        assert int(np.abs(dec[:, :, 0].astype(int) - 200).max()) <= 1


class TestRealWorldJpegs:
    """Decode JPEGs produced by independent encoders (skip when the host
    files are absent — they are environment samples, not repo fixtures)."""

    def test_baseline_420_color(self):
        p = _first_existing(_REAL_COLOR)
        if p is None:
            pytest.skip("no third-party baseline color JPEG on this host")
        px = decode_jpeg_pixels(open(p, "rb").read())
        assert px is not None and px.shape == (16, 16, 3) and px.dtype == np.uint8
        # the Python-logo thumbnail is non-constant and mid-toned
        assert 40 < float(px.mean()) < 220
        assert float(px.std()) > 10

    def test_baseline_gray(self):
        p = _first_existing(_REAL_GRAY)
        if p is None:
            pytest.skip("no third-party grayscale JPEG on this host")
        px = decode_jpeg_pixels(open(p, "rb").read())
        assert px is not None and px.shape == (2, 2, 1)
        # 2x2.jpg is a uniform mid-gray swatch
        assert int(px.min()) == int(px.max()) == 128

    def test_progressive_decodes(self):
        p = _first_existing(_REAL_PROGRESSIVE)
        if p is None:
            pytest.skip("no progressive JPEG on this host")
        px = decode_jpeg_pixels(open(p, "rb").read())
        assert px is not None and px.shape == (477, 720, 3)
        assert float(px.std()) > 20  # real photographic content


def _imageio_reference(spark, path):
    """Decode via the JVM's javax.imageio (an INDEPENDENT decoder), routed
    through a PNG temp file so pixels cross py4j as one blob; the PNG leg
    uses decode_png_pixels, which is itself validated separately."""
    import os
    import tempfile

    from sat_bucket_spark.operators.multimodal import decode_png_pixels

    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    if img is None:
        return None
    w, h = img.getWidth(), img.getHeight()
    out = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    )
    g = out.getGraphics()
    g.drawImage(img, 0, 0, None)
    g.dispose()
    tmp = tempfile.mktemp(suffix=".png")
    jvm.javax.imageio.ImageIO.write(out, "png", jvm.java.io.File(tmp))
    px = decode_png_pixels(open(tmp, "rb").read())
    os.unlink(tmp)
    return px


class TestImageIOReference:
    """Full-image agreement with an independent reference decoder. The
    bound is IDCT + rounding noise (~3/255); a single misdecoded Huffman
    bit desynchronizes the entire remaining scan, so these are strong
    whole-pipeline checks."""

    def test_progressive_real_file(self, spark):
        p = _first_existing(_REAL_PROGRESSIVE)
        if p is None:
            pytest.skip("no progressive JPEG on this host")
        mine = decode_jpeg_pixels(open(p, "rb").read())
        ref = _imageio_reference(spark, p)
        if ref is None:
            pytest.skip("imageio could not decode the sample")
        d = np.abs(mine.astype(int) - ref.astype(int))
        assert float(d.mean()) < 1.0
        assert int(d.max()) <= 8

    def test_baseline_420_real_file(self, spark):
        p = _first_existing(_REAL_COLOR)
        if p is None:
            pytest.skip("no baseline color JPEG on this host")
        mine = decode_jpeg_pixels(open(p, "rb").read())
        ref = _imageio_reference(spark, p)
        if ref is None:
            pytest.skip("imageio could not decode the sample")
        d = np.abs(mine.astype(int) - ref.astype(int))
        assert float(d.mean()) < 2.0

    def test_own_encoder_against_imageio(self, spark, tmp_path):
        """Our encoder's output decoded by the REFERENCE decoder matches
        the source pixels — proving the encoder alone, independent of our
        decoder."""
        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        enc = encode_jpeg_baseline(
            rgb, quant_luma=np.ones((8, 8)), quant_chroma=np.ones((8, 8))
        )
        p = str(tmp_path / "own.jpg")
        with open(p, "wb") as fh:
            fh.write(enc)
        ref = _imageio_reference(spark, p)
        if ref is None:
            pytest.skip("imageio could not decode our stream")
        d = np.abs(ref.astype(int) - rgb.astype(int))
        assert int(d.max()) <= 4


class TestRobustness:
    def test_garbage_and_truncation(self):
        assert decode_jpeg_pixels(None) is None
        assert decode_jpeg_pixels(b"") is None
        assert decode_jpeg_pixels(b"\xff\xd8\xff") is None
        gray = np.full((8, 8), 100, dtype=np.uint8)
        enc = encode_jpeg_baseline(gray)
        assert decode_jpeg_pixels(enc[: len(enc) // 2]) is None

    def test_non_jpeg_magic(self):
        assert decode_jpeg_pixels(b"\x89PNG\r\n\x1a\nrest") is None


class TestSparkIntegration:
    def test_dispatch_and_featurize(self, spark):
        """JPEG payloads flow through the multimodal decode stage and get
        REAL pixel statistics (not the md5 stub)."""
        from sat_bucket_spark.operators.multimodal import decode_and_featurize_images

        gray = np.linspace(10, 240, 16 * 16).reshape(16, 16).astype(np.uint8)
        enc = encode_jpeg_baseline(gray, quant_luma=np.ones((8, 8)))
        expected_px = decode_image_pixels(enc)
        assert expected_px is not None  # dispatch recognizes JPEG
        expected_feat = _pixel_features(expected_px)

        df = spark.createDataFrame([(1, bytearray(enc))], ["doc_id", "payload"])
        out = decode_and_featurize_images(df, strict=True).collect()
        assert len(out) == 1
        row = out[0]
        assert (row["width"], row["height"], row["channels"]) == (16, 16, 1)
        assert row["feature"] == pytest.approx(expected_feat, abs=1e-12)


class TestJvmWrittenFiles:
    """The JVM's ImageIO WRITES files from known pixels; our pure-Python
    decoders must reproduce those pixels exactly (PNG/BMP/GIF are
    lossless) — real-world-encoder coverage for every decode path, not
    just our own fixture writers."""

    @staticmethod
    def _write_known(spark, tmp_path, fmt):
        jvm = spark._jvm
        w, h = 13, 9
        rng = np.random.default_rng(17)
        # few distinct colors so GIF's palette quantizer stays lossless
        colors = [(0, 0, 0), (255, 255, 255), (200, 30, 40), (10, 120, 220)]
        px = np.zeros((h, w, 3), dtype=np.uint8)
        img = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        )
        for y in range(h):
            for x in range(w):
                r, g, b = colors[int(rng.integers(0, len(colors)))]
                px[y, x] = (r, g, b)
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
        p = str(tmp_path / f"known.{fmt}")
        ok = jvm.javax.imageio.ImageIO.write(img, fmt, jvm.java.io.File(p))
        return (p, px) if ok else (None, px)

    @pytest.mark.parametrize("fmt", ["png", "bmp", "gif"])
    def test_decode_matches_known_pixels(self, spark, tmp_path, fmt):
        from sat_bucket_spark.operators.multimodal import decode_image_pixels

        p, want = self._write_known(spark, tmp_path, fmt)
        if p is None:
            pytest.skip(f"JVM ImageIO has no {fmt} writer")
        got = decode_image_pixels(open(p, "rb").read())
        assert got is not None, f"decoder refused JVM-written {fmt}"
        if got.shape[2] == 1:
            got = np.repeat(got, 3, axis=2)
        assert got.shape == want.shape
        assert np.array_equal(got, want), (
            f"{fmt}: decoded pixels differ from the known source"
        )
