"""Structured Streaming sessionization tests (file source -> memory sink)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.partitioning import LonLatPartitioning
from sat_bucket_spark.streaming.sessions import (
    streaming_overpass_counts,
    streaming_time_partition_counts,
)


@pytest.fixture(scope="module")
def stream_source_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    base = datetime.datetime(2021, 1, 1)
    rows = []
    # two sessions: 3 rows tight, gap 30 min, 2 rows tight
    for s in (0, 30, 60):
        rows.append((base + datetime.timedelta(seconds=s), 10.0, 10.0))
    for s in (0, 30):
        rows.append((base + datetime.timedelta(minutes=30, seconds=s), -10.0, -10.0))
    spark.createDataFrame(rows, ["time", "lon", "lat"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _run_stream(spark, out_df, name):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_overpass_counts(spark, stream_source_dir):
    schema = spark.read.parquet(stream_source_dir).schema
    stream = spark.readStream.schema(schema).parquet(stream_source_dir)
    out = streaming_overpass_counts(stream, gap="2 minutes", watermark="1 hour")
    result = _run_stream(spark, out, "overpass_counts").collect()
    counts = sorted(r["count_overpass_occurence"] for r in result)
    assert counts == [2, 3]


def test_streaming_partition_counts(spark, stream_source_dir):
    schema = spark.read.parquet(stream_source_dir).schema
    stream = spark.readStream.schema(schema).parquet(stream_source_dir)
    p = LonLatPartitioning(size=10)
    out = streaming_time_partition_counts(stream, p, window="1 hour", watermark="2 hours")
    result = _run_stream(spark, out, "part_counts").collect()
    got = {(r["lon_bin"], r["lat_bin"]): r["n"] for r in result}
    # right-closed bins: 10.0 -> (0,10] centroid 5.0; -10.0 -> (-20,-10] centroid -15.0
    assert got == {("5.0", "5.0"): 3, ("-15.0", "-15.0"): 2}
