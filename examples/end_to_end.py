#!/usr/bin/env python
"""End-to-end bucket pipeline: ingest granules -> merge -> query -> grid.

Mirrors the reference's example workflow (examples/GMI/01_create_granule_bucket.py
-> 02_merge_bucket.py -> query) on synthetic granules. Run:

    python examples/end_to_end.py [workdir]
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from sat_bucket_spark import (
    LonLatPartitioning,
    add_overpass_count,
    get_spark,
    merge_granule_buckets,
    read,
    to_pandas_grid,
    write_granules_bucket,
)
from pyspark.sql import functions as F

GRANULE_SCHEMA = StructType(
    [
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("value", DoubleType()),
        StructField("granule_id", LongType()),
        StructField("time", TimestampType()),
    ]
)


def granule_to_df(path: str) -> pd.DataFrame:
    """The user-supplied granule reader: filepath -> flat DataFrame.

    Real pipelines open HDF5/netCDF here; this synthesizes a deterministic
    swath band per granule id encoded in the filename.
    """
    gid = int(os.path.basename(path).split("_")[1].split(".")[0])
    rng = np.random.default_rng(gid)
    n = 500
    frac = np.linspace(0, 1, n)
    lon = -60 + 120 * frac + rng.normal(0, 2, n)
    lat = -30 + 60 * frac + rng.normal(0, 2, n)
    t0 = datetime.datetime(2021, 1, 1) + datetime.timedelta(days=30 * gid)
    return pd.DataFrame(
        {
            "lon": lon,
            "lat": lat,
            "value": rng.random(n),
            "granule_id": np.full(n, gid),
            "time": [t0 + datetime.timedelta(seconds=int(s)) for s in range(n)],
        }
    )


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="bucket_demo_")
    stage, merged = f"{work}/stage", f"{work}/merged"
    spark = get_spark(app_name="bucket-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest: one task per granule, per-file error capture
    partitioning = LonLatPartitioning(size=(10, 10))
    paths = [f"/synthetic/granule_{i}.h5" for i in range(6)]
    errors = write_granules_bucket(
        spark, paths, stage, partitioning, granule_to_df, GRANULE_SCHEMA
    )
    print(f"ingested {len(paths)} granules, {len(errors)} failures")

    # 2. compaction: one shuffle -> (spatial x monthly) partitions
    merge_granule_buckets(spark, stage, merged, temporal_partitioning="month")

    # 3. queries: pruned extent read + point-radius + time window
    box = read(spark, merged, extent=[-20, 20, -10, 10])
    print("extent query rows:", box.count())
    near = read(spark, merged, point=(0, 0), distance=500_000, distance_type="haversine")
    print("within 500 km of (0,0):", near.count())
    window = read(spark, merged, start_time="2021-02-01", end_time="2021-04-01")
    print("Feb-Mar rows:", window.count())

    # 4. sessionize an area-of-interest result into overpasses
    sessions = add_overpass_count(box, interval=datetime.timedelta(minutes=30))
    sessions.groupBy("overpass_id").count().orderBy("overpass_id").show(5)

    # 5. grid: per-partition mean -> dense (lat x lon) pivot
    agg = (
        read(spark, merged)
        .groupBy("lon_bin", "lat_bin")
        .agg(F.avg("value").alias("value"))
    )
    grid = to_pandas_grid(agg, partitioning, "value")
    print("grid shape:", grid.shape, "- non-empty cells:", int(grid.notna().sum().sum()))

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
