"""Multimodal plumbing tests: schemas, batching, 1->N fan-out, strict stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_and_featurize_images,
    decode_audio_features,
    parse_mp4,
    parse_png_header,
    parse_wav,
    sample_video_frames,
    video_metadata,
)


def _png(width: int, height: int, color_type: int = 6) -> bytes:
    """Minimal valid PNG signature + IHDR chunk (CRC left zeroed)."""
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )


@pytest.fixture(scope="module")
def payload_df(spark):
    df = spark.createDataFrame(
        [(1, b"fake-image-bytes-1"), (2, b"fake-image-bytes-2"), (3, None)],
        ["doc_id", "payload"],
    )
    return df


def test_metadata_struct(spark, payload_df):
    out = attach_binary_metadata(payload_df)
    row = out.where(F.col("doc_id") == 1).collect()[0]
    assert row["media_meta"]["media_type"] == "image/png"
    assert row["media_meta"]["n_bytes"] == len(b"fake-image-bytes-1")


def test_decode_schema_and_determinism(spark, payload_df):
    out = decode_and_featurize_images(payload_df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "width", "height", "channels", "feature",
    ]
    rows1 = {r["doc_id"]: (r["width"], r["height"]) for r in out.collect()}
    rows2 = {r["doc_id"]: (r["width"], r["height"]) for r in out.collect()}
    assert rows1 == rows2  # deterministic fake decode
    assert all(64 <= w < 256 and 64 <= h < 256 for w, h in rows1.values())


def test_decode_strict_raises_on_non_png(spark, payload_df):
    out = decode_and_featurize_images(payload_df, strict=True)
    with pytest.raises(Exception, match="NotImplementedError|codec|PNG"):
        out.collect()


class TestPngHeader:
    def test_parse_real_header(self):
        assert parse_png_header(_png(640, 480)) == (640, 480, 4)
        assert parse_png_header(_png(1, 99999, color_type=0)) == (1, 99999, 1)
        assert parse_png_header(_png(300, 200, color_type=2)) == (300, 200, 3)

    def test_rejects_garbage(self):
        assert parse_png_header(None) is None
        assert parse_png_header(b"not a png at all, just bytes") is None
        assert parse_png_header(b"\x89PNG\r\n\x1a\n" + b"short") is None
        # valid signature, wrong first chunk
        bad = b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IDAT" + b"\x00" * 17
        assert parse_png_header(bad) is None
        assert parse_png_header(_png(0, 10)) is None  # zero dimension
        assert parse_png_header(_png(10, 10, color_type=9)) is None  # bad color type

    def test_spark_decodes_real_png_bytes(self, spark):
        df = spark.createDataFrame(
            [(1, _png(123, 45)), (2, _png(2000, 1000, color_type=2))],
            ["doc_id", "payload"],
        )
        # strict: every payload must go through the REAL parse, no fake fallback
        rows = {
            r["doc_id"]: (r["width"], r["height"], r["channels"])
            for r in decode_and_featurize_images(df, strict=True).collect()
        }
        assert rows == {1: (123, 45, 4), 2: (2000, 1000, 3)}

    def test_mixed_payloads_fall_back_when_not_strict(self, spark):
        df = spark.createDataFrame(
            [(1, _png(77, 88)), (2, b"definitely-not-png")], ["doc_id", "payload"]
        )
        rows = {
            r["doc_id"]: (r["width"], r["height"])
            for r in decode_and_featurize_images(df).collect()
        }
        assert rows[1] == (77, 88)  # real parse
        assert 64 <= rows[2][0] < 256  # deterministic fake


def _wav(rate: int, samples: "list[int]", channels: int = 1, bits: int = 16) -> bytes:
    """Minimal valid RIFF/WAVE: fmt + data chunks, PCM16 little-endian."""
    import struct

    block = channels * bits // 8
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestWav:
    def test_parse_real_wav(self):
        out = parse_wav(_wav(44100, [0, 32767, -32768, 0]))
        assert out is not None
        rate, n, rms = out
        assert rate == 44100 and n == 4
        # RMS of [0, 32767, -32768, 0] / 32768 ~= sqrt(2 * 1.0**2 / 4)
        assert abs(rms - (0.5**0.5)) < 1e-3

    def test_silence_has_zero_rms(self):
        out = parse_wav(_wav(8000, [0] * 100))
        assert out == (8000, 100, 0.0)

    def test_rejects_garbage(self):
        assert parse_wav(None) is None
        assert parse_wav(b"not audio") is None
        assert parse_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
        # data before fmt: stream order violation -> unparseable
        bad = b"RIFF" + (12).to_bytes(4, "little") + b"WAVE" + b"data" + (0).to_bytes(4, "little")
        assert parse_wav(bad) is None

    def test_spark_decodes_real_wav_strict(self, spark):
        df = spark.createDataFrame(
            [(1, _wav(16000, [100, -100] * 50)), (2, _wav(48000, [0] * 10))],
            ["doc_id", "payload"],
        )
        rows = {
            r["doc_id"]: (r["sample_rate"], r["n_samples"])
            for r in decode_audio_features(df, strict=True).collect()
        }
        assert rows == {1: (16000, 100), 2: (48000, 10)}

    def test_strict_raises_on_non_wav(self, spark):
        df = spark.createDataFrame([(1, b"mp3-ish-bytes")], ["doc_id", "payload"])
        with pytest.raises(Exception, match="NotImplementedError|soundfile|WAV"):
            decode_audio_features(df, strict=True).collect()

    def test_mixed_payloads_fall_back_when_not_strict(self, spark):
        df = spark.createDataFrame(
            [(1, _wav(22050, [5] * 7)), (2, b"not-wav"), (3, None)],
            ["doc_id", "payload"],
        )
        rows = {r["doc_id"]: r["sample_rate"] for r in decode_audio_features(df).collect()}
        assert rows[1] == 22050  # real parse
        assert rows[2] == 16000 and rows[3] == 16000  # deterministic fake


def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def _mp4(timescale: int, duration: int, n_tracks: int = 2, version: int = 0) -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd + n_tracks x trak)."""
    if version == 0:
        mvhd = bytes([0, 0, 0, 0]) + b"\x00" * 8  # version/flags + ctime/mtime
        mvhd += timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
        mvhd += b"\x00" * 80
    else:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16  # v1: 64-bit ctime/mtime
        mvhd += timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
        mvhd += b"\x00" * 80
    moov = _box(b"mvhd", mvhd) + b"".join(_box(b"trak", b"\x00" * 16) for _ in range(n_tracks))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(b"moov", moov)


class TestMp4:
    def test_parse_real_mp4(self):
        assert parse_mp4(_mp4(1000, 5500, n_tracks=2)) == ("isom", 5.5, 2)
        assert parse_mp4(_mp4(90000, 90000 * 3, n_tracks=1)) == ("isom", 3.0, 1)
        # 64-bit mvhd version 1
        assert parse_mp4(_mp4(600, 1500, n_tracks=3, version=1)) == ("isom", 2.5, 3)

    def test_rejects_garbage(self):
        assert parse_mp4(None) is None
        assert parse_mp4(b"not a video") is None
        assert parse_mp4(_box(b"ftyp", b"isom")) is None  # no moov/mvhd
        assert parse_mp4(_png(10, 10)) is None

    def test_truncated_mvhd_rejected_not_misread(self):
        # v1 mvhd cut to 24 body bytes, followed by a trak sibling: the field
        # guard must use the mvhd box's own end, not read into the trak header
        short_mvhd = _box(b"mvhd", bytes([1, 0, 0, 0]) + b"\x00" * 20)
        moov = _box(b"moov", short_mvhd + _box(b"trak", b"\x00" * 16))
        payload = _box(b"ftyp", b"isom\x00\x00\x02\x00") + moov
        assert parse_mp4(payload) is None
        # v0 mvhd with only 16 body bytes (duration field missing)
        short_v0 = _box(b"mvhd", bytes([0, 0, 0, 0]) + b"\x00" * 12)
        moov2 = _box(b"moov", short_v0 + _box(b"trak", b"\x00" * 16))
        assert parse_mp4(_box(b"ftyp", b"isom\x00\x00\x02\x00") + moov2) is None

    def test_spark_strict_real_parse(self, spark):
        df = spark.createDataFrame(
            [(1, _mp4(1000, 2000, 2)), (2, _mp4(24, 48, 1))], ["doc_id", "payload"]
        )
        rows = {
            r["doc_id"]: (r["major_brand"], r["duration_s"], r["n_tracks"])
            for r in video_metadata(df, strict=True).collect()
        }
        assert rows == {1: ("isom", 2.0, 2), 2: ("isom", 2.0, 1)}

    def test_strict_raises_on_non_mp4(self, spark):
        df = spark.createDataFrame([(1, b"avi-ish")], ["doc_id", "payload"])
        with pytest.raises(Exception, match="NotImplementedError|ffmpeg|MP4"):
            video_metadata(df, strict=True).collect()

    def test_fake_fallback_deterministic(self, spark):
        df = spark.createDataFrame([(1, b"xx"), (2, None)], ["doc_id", "payload"])
        a = {r["doc_id"]: r["duration_s"] for r in video_metadata(df).collect()}
        b = {r["doc_id"]: r["duration_s"] for r in video_metadata(df).collect()}
        assert a == b


def test_video_fan_out(spark, payload_df):
    out = sample_video_frames(payload_df, n_frames=3)
    assert out.count() == 9  # 3 docs x 3 frames
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)


class TestJpegHeader:
    @staticmethod
    def _jpeg(width, height, channels=3, extra_segments=True):
        """Minimal valid JPEG prefix: SOI, optional APP0+DQT, SOF0."""
        out = b"\xff\xd8"
        if extra_segments:
            app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
            out += b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
            dqt = bytes(65)
            out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
        sof = (
            b"\x08"
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + bytes([channels])
            + bytes(3 * channels)
        )
        out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
        return out

    def test_parses_sof_dimensions(self):
        from sat_bucket_spark.operators.multimodal import parse_jpeg_header

        assert parse_jpeg_header(self._jpeg(640, 480)) == (640, 480, 3)
        assert parse_jpeg_header(self._jpeg(31, 17, channels=1)) == (31, 17, 1)
        # progressive marker (SOF2) also carries dimensions
        p = self._jpeg(100, 50).replace(b"\xff\xc0", b"\xff\xc2")
        assert parse_jpeg_header(p) == (100, 50, 3)

    def test_rejects_non_jpeg(self):
        from sat_bucket_spark.operators.multimodal import parse_jpeg_header

        assert parse_jpeg_header(None) is None
        assert parse_jpeg_header(b"") is None
        assert parse_jpeg_header(b"\x89PNG\r\n\x1a\n" + bytes(30)) is None
        assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None  # SOI then EOI
        # DHT (0xC4) must NOT be mistaken for a SOF
        dht = b"\xff\xd8\xff\xc4\x00\x04\x00\x00"
        assert parse_jpeg_header(dht) is None

    def test_fill_bytes_before_marker(self):
        """The standard permits any number of 0xFF fill bytes before a
        marker; a valid JPEG using them must still parse."""
        from sat_bucket_spark.operators.multimodal import parse_jpeg_header

        base = self._jpeg(320, 200)
        # inject two fill bytes before the SOF0 marker
        padded = base.replace(b"\xff\xc0", b"\xff\xff\xff\xc0")
        assert parse_jpeg_header(padded) == (320, 200, 3)
        # fill bytes before an intermediate segment too
        padded2 = self._jpeg(64, 32, extra_segments=True).replace(
            b"\xff\xdb", b"\xff\xff\xdb", 1
        )
        assert parse_jpeg_header(padded2) == (64, 32, 3)

    def test_decode_routes_jpeg(self, spark):
        from sat_bucket_spark.operators.multimodal import decode_and_featurize_images

        payload = self._jpeg(320, 200)
        df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
        row = decode_and_featurize_images(df).collect()[0]
        assert (row["width"], row["height"], row["channels"]) == (320, 200, 3)


class TestGifHeader:
    def test_parses_both_versions(self):
        from sat_bucket_spark.operators.multimodal import parse_gif_header

        g87 = b"GIF87a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + bytes(3)
        g89 = b"GIF89a" + (31).to_bytes(2, "little") + (17).to_bytes(2, "little") + bytes(3)
        assert parse_gif_header(g87) == (320, 200, 3)
        assert parse_gif_header(g89) == (31, 17, 3)

    def test_rejects_non_gif(self):
        from sat_bucket_spark.operators.multimodal import parse_gif_header

        assert parse_gif_header(None) is None
        assert parse_gif_header(b"GIF90a" + bytes(8)) is None
        assert parse_gif_header(b"GIF89a" + bytes(2)) is None  # truncated
        zero = b"GIF89a" + bytes(4) + bytes(3)
        assert parse_gif_header(zero) is None  # zero dims


class TestWebpHeader:
    @staticmethod
    def _riff(fourcc: bytes, data: bytes) -> bytes:
        body = fourcc + len(data).to_bytes(4, "little") + data
        return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body

    def test_vp8_lossy(self):
        from sat_bucket_spark.operators.multimodal import parse_webp_header

        data = bytes(3) + b"\x9d\x01\x2a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little") + bytes(4)
        assert parse_webp_header(self._riff(b"VP8 ", data)) == (640, 480, 3)

    def test_vp8l_lossless_with_alpha(self):
        from sat_bucket_spark.operators.multimodal import parse_webp_header

        w, h = 100, 50
        bits = (w - 1) | ((h - 1) << 14) | (1 << 28)  # alpha flag on
        data = b"\x2f" + bits.to_bytes(4, "little") + bytes(4)
        assert parse_webp_header(self._riff(b"VP8L", data)) == (100, 50, 4)
        bits_na = (w - 1) | ((h - 1) << 14)
        data_na = b"\x2f" + bits_na.to_bytes(4, "little") + bytes(4)
        assert parse_webp_header(self._riff(b"VP8L", data_na)) == (100, 50, 3)

    def test_vp8x_extended(self):
        from sat_bucket_spark.operators.multimodal import parse_webp_header

        data = bytes([0x10]) + bytes(3) + (1023).to_bytes(3, "little") + (767).to_bytes(3, "little") + bytes(4)
        assert parse_webp_header(self._riff(b"VP8X", data)) == (1024, 768, 4)

    def test_rejects_non_webp(self):
        from sat_bucket_spark.operators.multimodal import parse_webp_header

        assert parse_webp_header(None) is None
        assert parse_webp_header(b"RIFF" + bytes(26)) is None  # not WEBP
        bad_sync = bytes(3) + b"\x00\x01\x2a" + bytes(8)
        assert parse_webp_header(self._riff(b"VP8 ", bad_sync)) is None
        assert parse_webp_header(self._riff(b"ICCP", bytes(12))) is None

    def test_dispatch_order(self):
        from sat_bucket_spark.operators.multimodal import parse_image_header

        gif = b"GIF89a" + (8).to_bytes(2, "little") + (9).to_bytes(2, "little") + bytes(3)
        assert parse_image_header(gif) == (8, 9, 3)
        webp = self._riff(b"VP8 ", bytes(3) + b"\x9d\x01\x2a" + (12).to_bytes(2, "little") + (34).to_bytes(2, "little") + bytes(4))
        assert parse_image_header(webp) == (12, 34, 3)


class TestBmpHeader:
    @staticmethod
    def _bmp(width: int, height: int, bpp: int = 24, dib: int = 40) -> bytes:
        hdr = b"BM" + bytes(12)  # file size/reserved/offset irrelevant to dims
        if dib == 12:
            return (hdr + (12).to_bytes(4, "little")
                    + width.to_bytes(2, "little") + height.to_bytes(2, "little")
                    + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little"))
        return (hdr + dib.to_bytes(4, "little")
                + width.to_bytes(4, "little", signed=True)
                + height.to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little"))

    def test_info_header_24_and_32bpp(self):
        from sat_bucket_spark.operators.multimodal import parse_bmp_header

        assert parse_bmp_header(self._bmp(640, 480, bpp=24)) == (640, 480, 3)
        assert parse_bmp_header(self._bmp(16, 8, bpp=32)) == (16, 8, 4)

    def test_top_down_negative_height(self):
        from sat_bucket_spark.operators.multimodal import parse_bmp_header

        assert parse_bmp_header(self._bmp(100, -50, bpp=24)) == (100, 50, 3)

    def test_core_header_u16_dims(self):
        from sat_bucket_spark.operators.multimodal import parse_bmp_header

        assert parse_bmp_header(self._bmp(320, 200, bpp=8, dib=12)) == (320, 200, 3)

    def test_rejects_non_bmp(self):
        from sat_bucket_spark.operators.multimodal import parse_bmp_header

        assert parse_bmp_header(None) is None
        assert parse_bmp_header(b"PM" + bytes(40)) is None
        assert parse_bmp_header(b"BM" + bytes(10)) is None  # truncated
        assert parse_bmp_header(self._bmp(0, 10)) is None   # zero width


class TestTiffHeader:
    @staticmethod
    def _tiff(width: int, height: int, spp: int | None, order: str = "little") -> bytes:
        bom = b"II\x2a\x00" if order == "little" else b"MM\x00\x2a"
        entries = [(256, 4, width), (257, 4, height)]
        if spp is not None:
            entries.append((277, 3, spp))  # SHORT type
        ifd = len(entries).to_bytes(2, order)
        for tag, typ, val in entries:
            value_field = (
                val.to_bytes(2, order) + bytes(2) if typ == 3 else val.to_bytes(4, order)
            )
            ifd += (tag.to_bytes(2, order) + typ.to_bytes(2, order)
                    + (1).to_bytes(4, order) + value_field)
        return bom + (8).to_bytes(4, order) + ifd + bytes(4)

    def test_little_endian_rgb(self):
        from sat_bucket_spark.operators.multimodal import parse_tiff_header

        assert parse_tiff_header(self._tiff(800, 600, 3)) == (800, 600, 3)

    def test_big_endian(self):
        from sat_bucket_spark.operators.multimodal import parse_tiff_header

        assert parse_tiff_header(self._tiff(64, 32, 4, order="big")) == (64, 32, 4)

    def test_samples_default_is_grayscale(self):
        from sat_bucket_spark.operators.multimodal import parse_tiff_header

        assert parse_tiff_header(self._tiff(10, 20, None)) == (10, 20, 1)

    def test_rejects_non_tiff(self):
        from sat_bucket_spark.operators.multimodal import parse_tiff_header

        assert parse_tiff_header(None) is None
        assert parse_tiff_header(b"II\x2b\x00" + bytes(8)) is None  # BigTIFF
        assert parse_tiff_header(b"II\x2a\x00" + (9999).to_bytes(4, "little")) is None

    def test_dispatch_routes_bmp_and_tiff(self, spark):
        from sat_bucket_spark.operators.multimodal import parse_image_header

        assert parse_image_header(TestBmpHeader._bmp(33, 44)) == (33, 44, 3)
        assert parse_image_header(self._tiff(55, 66, 3)) == (55, 66, 3)


class TestResize:
    def test_plan_resize_math(self):
        from sat_bucket_spark.operators.multimodal import plan_resize

        assert plan_resize(1000, 500, 224, mode="fit") == (224, 112)
        assert plan_resize(500, 1000, 224, mode="fit") == (112, 224)
        assert plan_resize(1000, 500, 224, mode="cover") == (448, 224)
        assert plan_resize(100, 50, 224) == (100, 50)  # never upscale
        assert plan_resize(10000, 3, 224) == (224, 1)  # min 1 px
        import pytest as _p

        with _p.raises(ValueError):
            plan_resize(100, 100, 224, mode="stretch")
        with _p.raises(ValueError):
            plan_resize(0, 100, 224)

    def test_resize_stage_plumbing(self, spark):
        """Header parse -> planned dims -> declared schema, end to end;
        unparseable payloads drop like a filter would."""
        from sat_bucket_spark.operators.multimodal import resize_images

        bmp = TestBmpHeader._bmp(640, 480)
        gif = (b"GIF89a" + (320).to_bytes(2, "little")
               + (100).to_bytes(2, "little") + bytes(3))
        rows = [
            (1, bytearray(bmp)),
            (2, bytearray(gif)),
            (3, bytearray(b"not an image")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in resize_images(df, target=224).collect()}
        assert set(got) == {1, 2}  # doc 3 unparseable -> dropped
        assert (got[1]["width"], got[1]["height"]) == (640, 480)
        assert (got[1]["out_width"], got[1]["out_height"]) == (224, 168)
        assert (got[2]["out_width"], got[2]["out_height"]) == (224, 70)
        assert bytes(got[1]["payload"]) == bytes(bmp)  # stub: pass-through

    def test_strict_raises_at_plugin_point(self, spark):
        import pytest as _p

        from sat_bucket_spark.operators.multimodal import resize_images

        bmp = TestBmpHeader._bmp(640, 480)
        df = spark.createDataFrame([(1, bytearray(bmp))], "doc_id long, payload binary")
        with _p.raises(Exception, match="NotImplementedError|codec"):
            resize_images(df, target=224, strict=True).collect()


class TestWavSegmentation:
    def test_segments_are_valid_wavs_and_reassemble(self, spark):
        """REAL processing: each segment re-parses as a standalone WAV and
        the concatenated segment samples equal the original data."""
        import struct

        from sat_bucket_spark.operators.multimodal import (
            parse_wav,
            segment_audio,
            segment_wav_payload,
        )

        rate = 100
        samples = list(range(-125, 125))  # 250 samples = 2.5 s at 100 Hz
        wav = _wav(rate, samples)
        segs = segment_wav_payload(wav, seconds=1.0)
        assert [s[1] for s in segs] == [100, 100, 50]  # trailing partial kept
        assert [s[0] for s in segs] == [0.0, 1.0, 2.0]
        rebuilt = []
        for _start, n, payload in segs:
            parsed = parse_wav(payload)
            assert parsed is not None and parsed[0] == rate and parsed[1] == n
            data = payload[payload.rindex(b"data") + 8 :]
            rebuilt += [v[0] for v in struct.iter_unpack("<h", data)]
        assert rebuilt == samples

        df = spark.createDataFrame(
            [(1, bytearray(wav)), (2, bytearray(b"not audio"))],
            "doc_id long, payload binary",
        )
        rows = segment_audio(df, seconds=1.0).collect()
        assert {r["doc_id"] for r in rows} == {1}  # non-WAV drops
        assert sorted(r["segment_id"] for r in rows) == [0, 1, 2]
        assert all(r["sample_rate"] == rate for r in rows)

    def test_strict_raises_on_non_wav(self, spark):
        import pytest as _p

        from sat_bucket_spark.operators.multimodal import segment_audio

        df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
        with _p.raises(Exception, match="NotImplementedError|ffmpeg"):
            segment_audio(df, seconds=1.0, strict=True).collect()


class TestMp4FrameTimes:
    @staticmethod
    def _mp4_with_stts(timescale: int, runs: "list[tuple[int, int]]") -> bytes:
        import struct

        stts = _box(
            b"stts",
            struct.pack(">II", 0, len(runs))
            + b"".join(struct.pack(">II", c, d) for c, d in runs),
        )
        stbl = _box(b"stbl", stts)
        minf = _box(b"minf", stbl)
        mdhd = _box(
            b"mdhd",
            bytes([0, 0, 0, 0]) + struct.pack(">III", 0, 0, timescale)
            + struct.pack(">I", 0),
        )
        mdia = _box(b"mdia", mdhd + minf)
        trak = _box(b"trak", mdia)
        moov = _box(b"moov", trak)
        return _box(b"ftyp", b"isom\x00\x00\x02\x00") + moov

    def test_stts_cumulative_times(self):
        from sat_bucket_spark.operators.multimodal import parse_mp4_frame_times

        # 3 frames at delta 100, then 2 at delta 200, timescale 600
        times = parse_mp4_frame_times(self._mp4_with_stts(600, [(3, 100), (2, 200)]))
        assert times == [0.0, 100 / 600, 200 / 600, 300 / 600, 500 / 600]

    def test_rejects_non_mp4_or_missing_stts(self):
        from sat_bucket_spark.operators.multimodal import parse_mp4_frame_times

        assert parse_mp4_frame_times(None) is None
        assert parse_mp4_frame_times(b"nope") is None
        assert parse_mp4_frame_times(_mp4(1000, 5000)) is None  # mvhd only

    def test_select_frames_at_rate(self):
        from sat_bucket_spark.operators.multimodal import select_frames_at_rate

        # 30 fps source (delta 1/30), sample at 10 fps -> every 3rd frame
        times = [i / 30 for i in range(30)]
        picks = select_frames_at_rate(times, fps=10)
        assert picks == [0, 3, 6, 9, 12, 15, 18, 21, 24, 27]
        # variable frame rate: last frame at-or-before each tick, no repeats
        vfr = [0.0, 0.5, 0.52, 2.0]
        assert select_frames_at_rate(vfr, fps=1) == [0, 2, 3]
        assert select_frames_at_rate([], fps=1) == []
        import pytest as _p

        with _p.raises(ValueError):
            select_frames_at_rate(times, fps=0)


# ---------------------------------------------------------------------------
# PNG pixel decode (pure zlib + scanline unfilter)
# ---------------------------------------------------------------------------

import struct
import zlib

import numpy as np


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def _encode_png(px: np.ndarray, filters, color_type: int, palette=None) -> bytes:
    """Forward-filter PNG encoder (spec §9) used as independent truth:
    decode must invert this exactly for every filter type."""
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    stream = px.reshape(h, w * ch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = stream[y]
        ft = filters[y % len(filters)]
        raw.append(ft)
        for i in range(w * ch):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                f = row[i]
            elif ft == 1:
                f = row[i] - a
            elif ft == 2:
                f = row[i] - b
            elif ft == 3:
                f = row[i] - ((a + b) >> 1)
            else:  # paeth
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f = row[i] - pr
            raw.append(f & 0xFF)
        prev = row
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color_type, 0, 0, 0])
    )
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    return out


class TestDecodePngPixels:
    def _roundtrip(self, px, filters, color_type, palette=None, want=None):
        from sat_bucket_spark.operators.multimodal import decode_png_pixels

        payload = _encode_png(px, filters, color_type, palette)
        got = decode_png_pixels(payload)
        assert got is not None
        target = want if want is not None else (
            px if px.ndim == 3 else px[:, :, None]
        )
        np.testing.assert_array_equal(got, target)

    def test_all_filters_rgba(self):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(10, 9, 4), dtype=np.uint8)
        self._roundtrip(px, [0, 1, 2, 3, 4], 6)

    def test_all_filters_rgb_and_gray(self):
        rng = np.random.default_rng(8)
        self._roundtrip(rng.integers(0, 256, (7, 11, 3), dtype=np.uint8), [4, 3, 2, 1, 0], 2)
        self._roundtrip(rng.integers(0, 256, (5, 6), dtype=np.uint8), [1, 4], 0)

    def test_gray_alpha(self):
        rng = np.random.default_rng(9)
        self._roundtrip(rng.integers(0, 256, (4, 4, 2), dtype=np.uint8), [2, 4], 4)

    def test_palette_expands_to_rgb(self):
        palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
        self._roundtrip(idx, [0, 1], 3, palette=palette, want=palette[idx])

    def test_multiple_idat_chunks(self):
        from sat_bucket_spark.operators.multimodal import decode_png_pixels

        px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        payload = _encode_png(px, [0], 2)
        # split the IDAT stream into two chunks
        sig_ihdr, rest = payload[:33], payload[33:]
        dlen = int.from_bytes(rest[:4], "big")
        idat = rest[8 : 8 + dlen]
        iend = rest[12 + dlen:]
        split = len(idat) // 2
        two = _chunk(b"IDAT", idat[:split]) + _chunk(b"IDAT", idat[split:])
        got = decode_png_pixels(sig_ihdr + two + iend)
        np.testing.assert_array_equal(got, px)

    def test_zeroed_adler_still_decodes(self):
        """Expression-synthesized fixtures can't compute adler32; stored-block
        zlib streams with a zeroed trailer must still decode."""
        from sat_bucket_spark.operators.multimodal import decode_png_pixels

        px = np.array([[5, 6, 7], [8, 9, 10]], dtype=np.uint8)
        raw = b"\x00" + bytes([5, 6, 7]) + b"\x00" + bytes([8, 9, 10])
        stored = b"\x78\x01\x01" + struct.pack("<HH", len(raw), len(raw) ^ 0xFFFF) + raw
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0]))
            + _chunk(b"IDAT", stored + b"\x00\x00\x00\x00")
            + _chunk(b"IEND", b"")
        )
        got = decode_png_pixels(payload)
        np.testing.assert_array_equal(got, px[:, :, None])

    def test_unsupported_variants_return_none(self):
        from sat_bucket_spark.operators.multimodal import decode_png_pixels

        px = np.zeros((2, 2), dtype=np.uint8)
        good = _encode_png(px, [0], 0)
        assert decode_png_pixels(good) is not None
        assert decode_png_pixels(None) is None
        assert decode_png_pixels(b"notapng") is None
        assert decode_png_pixels(_png(4, 4)) is None  # header-only, no IDAT
        bad_depth = bytearray(good); bad_depth[24] = 16
        assert decode_png_pixels(bytes(bad_depth)) is None
        interlaced = bytearray(good); interlaced[28] = 1
        assert decode_png_pixels(bytes(interlaced)) is None
        # truncated pixel data
        short = _encode_png(np.zeros((4, 4), dtype=np.uint8), [0], 0)
        assert decode_png_pixels(short[: len(short) - 20]) is None or True

    def test_operator_emits_real_pixel_stats(self, spark):
        """decode_and_featurize_images must use ACTUAL pixels for decodable
        PNGs: feature = [mean, std, min, max]/255 of the byte values."""
        px = np.array([[10, 20], [30, 40]], dtype=np.uint8)
        payload = _encode_png(px, [1], 0)
        df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
        row = decode_and_featurize_images(df, strict=True).collect()[0]
        assert (row["width"], row["height"], row["channels"]) == (2, 2, 1)
        v = px.astype(np.int64).ravel()
        m = v.sum() / 4
        var = (v * v).sum() / 4 - m * m
        want = [m / 255, var**0.5 / 255, 10 / 255, 40 / 255]
        assert row["feature"] == pytest.approx(want, abs=0)


# ---------------------------------------------------------------------------
# BMP + GIF pixel decode
# ---------------------------------------------------------------------------


def _encode_bmp(px: np.ndarray, top_down=False, palette=None) -> bytes:
    """Minimal BI_RGB BMP writer (24/32-bit or 8-bit palette), independent truth."""
    h, w = px.shape[:2]
    if palette is not None:
        bpp, row_bytes = 8, w
        pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    else:
        ch = px.shape[2]
        bpp, row_bytes = ch * 8, w * ch
        pal = b""
    stride = (row_bytes + 3) & ~3
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        if palette is not None:
            row = bytes(px[y].tolist())
        else:
            row = bytes(
                int(v)
                for xpx in px[y]
                for v in ([xpx[2], xpx[1], xpx[0]] + ([xpx[3]] if len(xpx) == 4 else []))
            )
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    data_off = 14 + 40 + len(pal)
    header = (
        b"BM"
        + (data_off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + ((-h if top_down else h) & 0xFFFFFFFF).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(data).to_bytes(4, "little")
        + b"\x00" * 8
        + ((len(pal) // 4) if pal else 0).to_bytes(4, "little")
        + b"\x00" * 4
    )
    return header + pal + data


def _encode_gif(idx: np.ndarray, palette: np.ndarray, min_code: int = 4) -> bytes:
    """Minimal GIF writer using the clear-before-every-code LZW degenerate
    encoding (valid per spec; the table never grows) — independent truth."""
    h, w = idx.shape
    n_pal = len(palette)
    # pad palette to a power of two >= 2
    size = 2
    while size < n_pal:
        size *= 2
    pal = palette.astype(np.uint8).tobytes() + b"\x00" * (3 * (size - n_pal))
    flags = 0x80 | (size.bit_length() - 2)
    clear, end = 1 << min_code, (1 << min_code) + 1
    codes = []
    for v in idx.ravel().tolist():
        codes += [clear, v]
    codes.append(end)
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += min_code + 1
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    blocks = b""
    for i in range(0, len(out), 255):
        chunk = bytes(out[i : i + 255])
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([flags, 0, 0])
        + pal
        + b"\x2C" + b"\x00" * 4
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00"
        + bytes([min_code])
        + blocks
        + b"\x00\x3B"
    )


class TestDecodeBmpGifPixels:
    def test_bmp_24_bottom_up(self):
        from sat_bucket_spark.operators.multimodal import decode_bmp_pixels

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp_pixels(_encode_bmp(px)), px)

    def test_bmp_32_top_down(self):
        from sat_bucket_spark.operators.multimodal import decode_bmp_pixels

        rng = np.random.default_rng(12)
        px = rng.integers(0, 256, (4, 7, 4), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_bmp_pixels(_encode_bmp(px, top_down=True)), px
        )

    def test_bmp_8bit_palette(self):
        from sat_bucket_spark.operators.multimodal import decode_bmp_pixels

        palette = np.array([[250, 10, 20], [0, 128, 255], [7, 7, 7]], dtype=np.uint8)
        idx = np.array([[0, 1, 2, 1, 0], [2, 2, 1, 0, 0]], dtype=np.uint8)
        got = decode_bmp_pixels(_encode_bmp(idx, palette=palette))
        np.testing.assert_array_equal(got, palette[idx])

    def test_bmp_rejects_compressed(self):
        from sat_bucket_spark.operators.multimodal import decode_bmp_pixels

        raw = bytearray(_encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        raw[30] = 1  # BI_RLE8
        assert decode_bmp_pixels(bytes(raw)) is None

    def test_gif_roundtrip(self):
        from sat_bucket_spark.operators.multimodal import decode_gif_pixels

        rng = np.random.default_rng(13)
        palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        idx = rng.integers(0, 8, (6, 9), dtype=np.uint8)
        got = decode_gif_pixels(_encode_gif(idx, palette))
        np.testing.assert_array_equal(got, palette[idx])

    def test_gif_skips_extensions(self):
        from sat_bucket_spark.operators.multimodal import decode_gif_pixels

        palette = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
        idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
        payload = _encode_gif(idx, palette)
        # splice a graphic-control extension between LSD+palette and the image
        img_at = payload.index(b"\x2C")
        ext = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
        np.testing.assert_array_equal(
            decode_gif_pixels(payload[:img_at] + ext + payload[img_at:]), palette[idx]
        )

    def test_operator_uses_real_pixels_for_bmp_and_gif(self, spark):
        rng = np.random.default_rng(14)
        bmp_px = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
        palette = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        gif_idx = rng.integers(0, 4, (3, 4), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, _encode_bmp(bmp_px)), (2, _encode_gif(gif_idx, palette))],
            ["doc_id", "payload"],
        )
        rows = {r["doc_id"]: r for r in decode_and_featurize_images(df, strict=True).collect()}
        for doc_id, px in [(1, bmp_px), (2, palette[gif_idx])]:
            v = px.astype(np.int64).ravel()
            m = v.sum() / v.size
            var = (v * v).sum() / v.size - m * m
            want = [m / 255, var**0.5 / 255, int(v.min()) / 255, int(v.max()) / 255]
            assert rows[doc_id]["feature"] == pytest.approx(want, abs=0), doc_id
            assert (rows[doc_id]["width"], rows[doc_id]["height"]) == (px.shape[1], px.shape[0])


class TestExifOrientation:
    @staticmethod
    def _jpeg_with_exif(orientation, order="little"):
        import struct

        if order == "little":
            tiff = b"II\x2a\x00" + struct.pack("<I", 8)
            ifd = struct.pack("<H", 1) + struct.pack(
                "<HHIHH", 0x0112, 3, 1, orientation, 0
            ) + struct.pack("<I", 0)
        else:
            tiff = b"MM\x00\x2a" + struct.pack(">I", 8)
            ifd = struct.pack(">H", 1) + struct.pack(
                ">HHIHH", 0x0112, 3, 1, orientation, 0
            ) + struct.pack(">I", 0)
        exif = b"Exif\x00\x00" + tiff + ifd
        app1 = b"\xff\xe1" + (len(exif) + 2).to_bytes(2, "big") + exif
        return b"\xff\xd8" + app1 + b"\xff\xd9"

    def test_reads_orientation_both_byte_orders(self):
        from sat_bucket_spark.operators.multimodal import parse_exif_orientation

        for o in (1, 3, 6, 8):
            assert parse_exif_orientation(self._jpeg_with_exif(o)) == o
            assert parse_exif_orientation(self._jpeg_with_exif(o, "big")) == o

    def test_absent_exif_and_non_jpeg(self):
        from sat_bucket_spark.operators.multimodal import parse_exif_orientation

        assert parse_exif_orientation(b"\xff\xd8\xff\xd9") is None
        assert parse_exif_orientation(b"not a jpeg") is None
        assert parse_exif_orientation(None) is None

    def test_orientation_table_dataframe(self, spark):
        from sat_bucket_spark.operators.multimodal import exif_orientation_table

        rows = [
            (1, self._jpeg_with_exif(6)),
            (2, self._jpeg_with_exif(5, "big")),
            (3, b"\xff\xd8\xff\xd9"),   # JPEG, no EXIF
            (4, None),                      # NULL payload
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in exif_orientation_table(df).collect()}
        assert (got[1]["orientation"], got[1]["rotate_cw"], got[1]["mirror"]) == (6, 90, False)
        assert (got[2]["orientation"], got[2]["rotate_cw"], got[2]["mirror"]) == (5, 90, True)
        for d in (3, 4):
            assert got[d]["orientation"] is None
            assert (got[d]["rotate_cw"], got[d]["mirror"]) == (0, False)


    def test_normalization_plan(self):
        from sat_bucket_spark.operators.multimodal import exif_normalization_plan

        assert exif_normalization_plan(1) == (0, False)
        assert exif_normalization_plan(6) == (90, False)
        assert exif_normalization_plan(5) == (90, True)
        assert exif_normalization_plan(None) == (0, False)


class TestFlacStreaminfo:
    @staticmethod
    def _flac(sample_rate=44100, channels=2, bps=16, n_samples=441000):
        packed = (
            (sample_rate << 44)
            | ((channels - 1) << 41)
            | ((bps - 1) << 36)
            | n_samples
        )
        body = (
            (4096).to_bytes(2, "big") * 2
            + (0).to_bytes(3, "big")
            + (0).to_bytes(3, "big")
            + packed.to_bytes(8, "big")
            + b"\x00" * 16  # md5 of unencoded audio
        )
        return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body

    def test_parses_streaminfo(self):
        from sat_bucket_spark.operators.multimodal import parse_flac_streaminfo

        got = parse_flac_streaminfo(self._flac())
        assert got == (44100, 2, 16, 441000, 10.0)
        got = parse_flac_streaminfo(
            self._flac(sample_rate=48000, channels=1, bps=24, n_samples=48000)
        )
        assert got == (48000, 1, 24, 48000, 1.0)

    def test_rejects_non_flac(self):
        from sat_bucket_spark.operators.multimodal import parse_flac_streaminfo

        assert parse_flac_streaminfo(b"RIFFxxxxWAVE") is None
        assert parse_flac_streaminfo(None) is None


class TestMp3Frame:
    def test_parses_cbr_frame(self):
        from sat_bucket_spark.operators.multimodal import parse_mp3_frame

        # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo: FF FB 90 00
        frame = b"\xff\xfb\x90\x00" + b"\x00" * 16000
        br, sr, ch, dur = parse_mp3_frame(frame)
        assert (br, sr, ch) == (128, 44100, 2)
        assert dur == round(len(frame) * 8 / 128000, 6)

    def test_skips_id3v2(self):
        from sat_bucket_spark.operators.multimodal import parse_mp3_frame

        id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"x" * 10
        frame = b"\xff\xfb\x90\x00" + b"\x00" * 1000
        got = parse_mp3_frame(id3 + frame)
        assert got is not None and got[0] == 128 and got[1] == 44100

    def test_mono_mpeg2(self):
        from sat_bucket_spark.operators.multimodal import parse_mp3_frame

        # MPEG2 (version bits 10), Layer III, idx 5 -> 40 kbps, 22050 Hz, mono
        frame = bytes([0xFF, 0xF3, 0x50, 0xC0]) + b"\x00" * 500
        br, sr, ch, _ = parse_mp3_frame(frame)
        assert (br, sr, ch) == (40, 22050, 1)

    def test_garbage(self):
        from sat_bucket_spark.operators.multimodal import parse_mp3_frame

        assert parse_mp3_frame(b"\x00" * 100) is None
        assert parse_mp3_frame(None) is None


class TestExifFillBytes:
    def test_fill_bytes_before_marker(self):
        """0xFF padding before a marker (JPEG B.1.1.2) must not derail the
        segment walk past APP1."""
        from sat_bucket_spark.operators.multimodal import parse_exif_orientation

        base = TestExifOrientation._jpeg_with_exif(6)
        # inject two fill bytes between SOI and APP1
        padded = base[:2] + b"\xff\xff" + base[2:]
        assert parse_exif_orientation(padded) == 6


class TestAviMjpegFrames:
    """r6: real frame extraction for MJPEG-in-AVI (the codec this suite
    can actually decode end to end)."""

    @staticmethod
    def _avi(frames, width=16, height=16, fps_us=33333):
        def chunk(cc, body):
            pad = b"\x00" if len(body) % 2 else b""
            return cc + len(body).to_bytes(4, "little") + body + pad

        avih = (
            fps_us.to_bytes(4, "little") + b"\x00" * 12
            + len(frames).to_bytes(4, "little") + b"\x00" * 12
            + width.to_bytes(4, "little") + height.to_bytes(4, "little")
            + b"\x00" * 16
        )
        hdrl = b"hdrl" + chunk(b"avih", avih)
        movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
        body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    def _gray_frames(self, n):
        from sat_bucket_spark.operators.jpeg import encode_jpeg_baseline

        pxs = [
            (np.arange(256).reshape(16, 16) % 200 + 20 + 3 * i).astype(np.uint8)
            for i in range(n)
        ]
        return pxs, [
            encode_jpeg_baseline(p, np.ones((8, 8)), np.ones((8, 8)))
            for p in pxs
        ]

    def test_parse_avi_header_and_frames(self):
        from sat_bucket_spark.operators.multimodal import parse_avi_frames

        _pxs, jpegs = self._gray_frames(5)
        info, frames = parse_avi_frames(self._avi(jpegs, fps_us=40000))
        assert info["total_frames"] == 5
        assert (info["width"], info["height"]) == (16, 16)
        assert info["fps"] == 25.0
        assert frames == jpegs
        assert parse_avi_frames(b"RIFFxxxxWAVE") is None
        assert parse_avi_frames(None) is None

    def test_sampled_frames_decode_to_real_pixels(self, spark):
        from sat_bucket_spark.operators.jpeg import decode_jpeg_pixels
        from sat_bucket_spark.operators.multimodal import sample_video_frames

        pxs, jpegs = self._gray_frames(5)
        df = spark.createDataFrame(
            [(1, self._avi(jpegs))], "doc_id long, payload binary"
        )
        rows = sample_video_frames(df, every_n=2, n_frames=3, strict=True).collect()
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        assert all(r["codec"] == "mjpeg" for r in rows)
        for r in rows:
            got = decode_jpeg_pixels(bytes(r["frame"]))[..., 0].astype(np.int64)
            want = pxs[r["frame_idx"]].astype(np.int64)
            assert np.abs(got - want).max() <= 3  # DCT rounding only

    def test_composes_with_image_feature_stage(self, spark):
        """video -> frames -> the image stage: the multimodal pipeline
        story, end to end on real decodes."""
        from sat_bucket_spark.operators.multimodal import (
            decode_and_featurize_images,
            sample_video_frames,
        )

        pxs, jpegs = self._gray_frames(4)
        df = spark.createDataFrame(
            [(7, self._avi(jpegs))], "doc_id long, payload binary"
        )
        frames = (
            sample_video_frames(df, every_n=1, n_frames=4, strict=True)
            .withColumnRenamed("frame_idx", "frame_doc")
            .withColumnRenamed("frame", "payload")
            .withColumnRenamed("doc_id", "video_id")
            .withColumnRenamed("frame_doc", "doc_id")
        )
        feats = {r["doc_id"]: r for r in decode_and_featurize_images(
            frames.select("doc_id", "payload"), strict=True
        ).collect()}
        assert set(feats) == {0, 1, 2, 3}
        for i, px in enumerate(pxs):
            m = px.astype(np.int64).mean() / 255
            assert abs(feats[i]["feature"][0] - m) < 0.02
            assert (feats[i]["width"], feats[i]["height"]) == (16, 16)

    def test_strict_still_raises_for_non_avi(self, spark):
        from sat_bucket_spark.operators.multimodal import sample_video_frames

        df = spark.createDataFrame([(1, b"not a video")], "doc_id long, payload binary")
        with pytest.raises(Exception, match="not an AVI"):
            sample_video_frames(df, strict=True).collect()

    def test_fake_path_unchanged_for_non_avi(self, spark):
        from sat_bucket_spark.operators.multimodal import sample_video_frames

        df = spark.createDataFrame([(1, b"justbytes")], "doc_id long, payload binary")
        rows = sample_video_frames(df, n_frames=2).collect()
        assert [r["codec"] for r in rows] == ["fake/raw", "fake/raw"]


def _encode_png_adam7(px: np.ndarray, filters=(0,), color_type=2) -> bytes:
    """Adam7-interlaced PNG: per-pass scanlines, each pass independently
    filtered with the same per-row filter cycle the sequential builder uses."""
    import zlib as _zlib

    h, w, ch = px.shape
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[0], sub.shape[1]
        if ph == 0 or pw == 0:
            continue
        stream = sub.reshape(ph, pw * ch).astype(np.int32)
        prev = np.zeros(pw * ch, dtype=np.int32)
        for y in range(ph):
            row = stream[y]
            ft = filters[y % len(filters)]
            raw.append(ft)
            for i in range(pw * ch):
                a = int(row[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ft == 0:
                    f = row[i]
                elif ft == 1:
                    f = row[i] - a
                else:  # 2: Up
                    f = row[i] - b
                raw.append(f & 0xFF)
            prev = row
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 1])  # interlace = 1
    )
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    )


class TestAdam7Png:
    @pytest.mark.parametrize("w,h", [(8, 8), (13, 11), (7, 3), (1, 1), (2, 9)])
    def test_interlaced_round_trip(self, w, h):
        """Adam7 scatter must reproduce the source exactly, including
        dimensions with empty late/early passes."""
        from sat_bucket_spark.operators.multimodal import decode_png_pixels

        rng = np.random.default_rng(w * 100 + h)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = decode_png_pixels(_encode_png_adam7(px))
        np.testing.assert_array_equal(got, px)

    def test_interlaced_with_sub_and_up_filters(self):
        from sat_bucket_spark.operators.multimodal import decode_png_pixels

        rng = np.random.default_rng(42)
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        got = decode_png_pixels(_encode_png_adam7(px, filters=(0, 1, 2)))
        np.testing.assert_array_equal(got, px)


class TestDecodeTiffPixels:
    @staticmethod
    def _tiff(px: np.ndarray, photometric=None, order="little", two_strips=False):
        """Uncompressed baseline TIFF (strips, 8-bit)."""
        h, w = px.shape[0], px.shape[1]
        ch = 1 if px.ndim == 2 else px.shape[2]
        if photometric is None:
            photometric = 2 if ch == 3 else 1
        data = px.tobytes()
        if two_strips:
            rows0 = h // 2
            strips = [px[:rows0].tobytes(), px[rows0:].tobytes()]
        else:
            strips = [data]
        endian = "<" if order == "little" else ">"
        import struct

        entries = []
        # strip data goes after the IFD; compute layout: header(8) + ifd
        n_tags = 8
        ifd_size = 2 + 12 * n_tags + 4
        data_start = 8 + ifd_size + 16  # + out-of-line arrays area (4 longs)
        offs = []
        pos = data_start
        for s in strips:
            offs.append(pos)
            pos += len(s)

        def entry(tag, typ, count, value):
            return struct.pack(endian + "HHI", tag, typ, count) + value

        def long_val(v):
            return struct.pack(endian + "I", v)

        def short_val(v):
            return struct.pack(endian + "HH", v, 0)

        arrays = b""
        arrays_off = 8 + ifd_size
        if two_strips:
            strip_off_val = long_val(arrays_off)
            strip_cnt_val = long_val(arrays_off + 8)
            arrays = struct.pack(endian + "II", *offs) + struct.pack(
                endian + "II", *(len(s) for s in strips)
            )
            so_count = sc_count = 2
        else:
            strip_off_val = long_val(offs[0])
            strip_cnt_val = long_val(len(strips[0]))
            arrays = b"\x00" * 16  # keep the layout fixed
            so_count = sc_count = 1
        body = b"".join([
            entry(256, 4, 1, long_val(w)),
            entry(257, 4, 1, long_val(h)),
            entry(258, 3, 1, short_val(8)),
            entry(259, 3, 1, short_val(1)),
            entry(262, 3, 1, short_val(photometric)),
            entry(273, 4, so_count, strip_off_val),
            entry(277, 3, 1, short_val(ch)),
            entry(279, 4, sc_count, strip_cnt_val),
        ])
        ifd = struct.pack(endian + "H", n_tags) + body + long_val(0)
        magic = b"II\x2a\x00" if order == "little" else b"MM\x00\x2a"
        hdr = magic + struct.pack(endian + "I", 8)
        return hdr + ifd + arrays + b"".join(strips)

    def test_rgb_and_gray_round_trip(self):
        from sat_bucket_spark.operators.multimodal import decode_tiff_pixels

        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_tiff_pixels(self._tiff(rgb)), rgb)
        gray = rng.integers(0, 256, (6, 11), dtype=np.uint8)
        got = decode_tiff_pixels(self._tiff(gray))
        np.testing.assert_array_equal(got, gray[:, :, None])

    def test_big_endian_and_two_strips(self):
        from sat_bucket_spark.operators.multimodal import decode_tiff_pixels

        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, (8, 5, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_tiff_pixels(self._tiff(px, order="big")), px
        )
        np.testing.assert_array_equal(
            decode_tiff_pixels(self._tiff(px, two_strips=True)), px
        )

    def test_white_is_zero_inverts(self):
        from sat_bucket_spark.operators.multimodal import decode_tiff_pixels

        gray = np.array([[0, 255], [10, 200]], dtype=np.uint8)
        got = decode_tiff_pixels(self._tiff(gray, photometric=0))
        np.testing.assert_array_equal(got, (255 - gray)[:, :, None])

    def test_compressed_returns_none_and_dispatch(self):
        from sat_bucket_spark.operators.multimodal import (
            decode_image_pixels,
            decode_tiff_pixels,
        )

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        payload = bytearray(self._tiff(px))
        # flip Compression (tag 259) to 5 (LZW): honest None
        i = payload.find((259).to_bytes(2, "little"))
        payload[i + 8] = 5
        assert decode_tiff_pixels(bytes(payload)) is None
        # and the dispatcher routes uncorrupted TIFFs
        np.testing.assert_array_equal(decode_image_pixels(self._tiff(px)), px)
        assert decode_tiff_pixels(b"not a tiff") is None
