"""Multimodal plumbing tests: schemas, batching, 1->N fan-out, strict stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_and_featurize_images,
    sample_video_frames,
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


def test_decode_strict_raises(spark, payload_df):
    out = decode_and_featurize_images(payload_df, strict=True)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()


def test_video_fan_out(spark, payload_df):
    out = sample_video_frames(payload_df, n_frames=3)
    assert out.count() == 9  # 3 docs x 3 frames
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)
