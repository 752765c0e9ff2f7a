"""Dense-grid materialization tests (reference to_xarray contract)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sat_bucket_spark.gridding import to_grid_arrays, to_pandas_grid
from sat_bucket_spark.partitioning import LonLatPartitioning


def test_dense_grid_with_nan_holes(spark):
    p = LonLatPartitioning(size=90)  # 4 x 2 grid
    df = spark.createDataFrame(
        [(10.0, 10.0, 1.0), (10.0, 20.0, 3.0), (-100.0, -50.0, 5.0)],
        ["lon", "lat", "v"],
    )
    agg = (
        p.add_labels(df, x="lon", y="lat")
        .groupBy("lon_bin", "lat_bin")
        .agg(F.avg("v").alias("v"))
    )
    arrays = to_grid_arrays(agg, p)
    assert arrays["v"].shape == (2, 4)
    # filled cells
    filled = ~np.isnan(arrays["v"])
    assert filled.sum() == 2
    # values land in the right cells: lon 10 -> x bin (0,90] idx 2; lat 10/20 -> y idx 1
    assert arrays["v"][1, 2] == 2.0  # avg(1,3)
    assert arrays["v"][0, 0] == 5.0  # lon -100 -> (-180,-90] idx 0; lat -50 -> (-90,0] idx 0


def test_pandas_grid_axes(spark):
    p = LonLatPartitioning(size=90)
    df = spark.createDataFrame([(10.0, 10.0, 1.0)], ["lon", "lat", "v"])
    agg = (
        p.add_labels(df, x="lon", y="lat").groupBy("lon_bin", "lat_bin").agg(F.avg("v").alias("v"))
    )
    grid = to_pandas_grid(agg, p, "v")
    assert list(grid.columns) == ["-135.0", "-45.0", "45.0", "135.0"]
    assert list(grid.index) == ["-45.0", "45.0"]
