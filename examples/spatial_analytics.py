#!/usr/bin/env python
"""Spatial analytics over a live archive: stream ingest -> polygon -> grids.

Round-4 capabilities in one pipeline:

1. STREAM INGEST: events flow into a hive bucket through the exactly-once
   streaming parquet sink (`stream_write_bucket`) — the archive is
   readable, with full pruning, while the stream runs.
2. POLYGON QUERY: a concave region of interest is answered with
   cell-exact partition pruning (only directories whose cell rectangle
   meets the polygon are opened) plus an unrolled ray-cast row filter.
3. RESAMPLING: the query result is gridded two ways — IDW (smooth field)
   and nearest-observation (aliasing-free categorical) — each a map-side
   3x3 fan-out and ONE shuffle.

Run: python examples/spatial_analytics.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bucket_spark import LonLatPartitioning, get_spark, read
from sat_bucket_spark.gridding import idw_to_grid, nearest_to_grid
from sat_bucket_spark.streaming.ingest import stream_write_bucket

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# Concave "dart" over the events table's southern latitude band
POLYGON = [(-120.0, -88.0), (0.0, -64.0), (120.0, -88.0), (0.0, -76.0)]


def main(workdir: str | None = None) -> None:
    work = workdir or tempfile.mkdtemp(prefix="spatial_analytics_")
    own = workdir is None
    spark = get_spark(app_name="spatial-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        import __spark_entry__ as entry

        # -- 1. stream the events feed into a bucket archive ---------------
        ev = entry._with_coords(entry._events(spark, SF_DIR)).withColumnRenamed(
            "ts", "time"
        )
        feed = f"{work}/feed"
        ev.write.mode("overwrite").parquet(feed)
        bucket = f"{work}/bucket"
        p = LonLatPartitioning(size=(10, 10))
        q = stream_write_bucket(
            spark.readStream.schema(spark.read.parquet(feed).schema).parquet(feed),
            bucket,
            p,
            checkpoint_dir=f"{work}/checkpoint",
            trigger={"availableNow": True},
        )
        q.awaitTermination(300)
        print(f"streamed {read(spark, bucket).count()} rows into {bucket}")

        # -- 2. polygon query with cell-exact pruning -----------------------
        roi = read(spark, bucket, polygon=POLYGON)
        n_cells = len(p.directories_by_polygon(POLYGON))
        n_bbox = len(p.directories_by_extent([-120, 120, -88, -64]))
        print(
            f"polygon query: {roi.count()} rows; pruned to {n_cells} cells "
            f"(bbox envelope would open {n_bbox})"
        )

        # -- 3. resample the region onto the grid ---------------------------
        idw = idw_to_grid(roi, p, value_col="value")
        nn = nearest_to_grid(roi, p, value_col="value")
        print("IDW grid (5 cells):")
        idw.orderBy("lon_c", "lat_c").show(5)
        print("nearest-observation grid (5 cells):")
        nn.orderBy("lon_c", "lat_c").show(5)
    finally:
        if own:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
