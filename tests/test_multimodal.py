"""Multimodal plumbing tests: schemas, batching, 1->N fan-out, strict stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_and_featurize_images,
    parse_png_header,
    sample_video_frames,
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


def test_video_fan_out(spark, payload_df):
    out = sample_video_frames(payload_df, n_frames=3)
    assert out.count() == 9  # 3 docs x 3 frames
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)
