"""Distributed sessionization must agree with the single-window reference
implementation on arbitrary inputs (property-based)."""

from __future__ import annotations

import datetime
import random

import pytest

from sat_bucket_spark.analysis import add_overpass_id, add_overpass_id_scalable


def _sessions(df, col="overpass_id"):
    rows = df.orderBy("time").collect()
    return [r[col] for r in rows]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_global_version_random(spark, seed):
    rng = random.Random(seed)
    base = datetime.datetime(2021, 1, 1)
    t = 0.0
    times = []
    for _ in range(200):
        # mix of sub-interval and super-interval gaps, some spanning chunks
        t += rng.choice([1, 30, 119, 121, 4000, 90_000])
        times.append(base + datetime.timedelta(seconds=t))
    df = spark.createDataFrame([(x,) for x in times], ["time"])
    a = _sessions(add_overpass_id(df, interval=120))
    b = _sessions(add_overpass_id_scalable(df, interval=120, chunk_seconds=3600))
    assert a == b


def test_chunk_boundary_continuation(spark):
    base = datetime.datetime(2021, 1, 1)
    # two rows 10s apart straddling a chunk boundary (chunk = 60s)
    times = [
        base + datetime.timedelta(seconds=55),
        base + datetime.timedelta(seconds=65),
        base + datetime.timedelta(seconds=500),
    ]
    df = spark.createDataFrame([(x,) for x in times], ["time"])
    got = _sessions(add_overpass_id_scalable(df, interval=120, chunk_seconds=60))
    assert got == [0, 0, 1]


def test_empty_chunk_gap_merge(spark):
    base = datetime.datetime(2021, 1, 1)
    # gap spans several empty chunks but is still <= interval
    times = [base, base + datetime.timedelta(seconds=170)]
    df = spark.createDataFrame([(x,) for x in times], ["time"])
    got = _sessions(add_overpass_id_scalable(df, interval=200, chunk_seconds=60))
    assert got == [0, 0]


def test_partitioned_keys(spark):
    base = datetime.datetime(2021, 1, 1)
    rows = []
    for sat in ("a", "b"):
        rows += [
            (sat, base),
            (sat, base + datetime.timedelta(seconds=30)),
            (sat, base + datetime.timedelta(hours=5)),
        ]
    df = spark.createDataFrame(rows, ["sat", "time"])
    out = add_overpass_id_scalable(
        df, interval=120, partition_by=["sat"], chunk_seconds=3600
    )
    got = {(r["sat"], r["time"]): r["overpass_id"] for r in out.collect()}
    for sat in ("a", "b"):
        assert got[(sat, base)] == 0
        assert got[(sat, base + datetime.timedelta(seconds=30))] == 0
        assert got[(sat, base + datetime.timedelta(hours=5))] == 1
