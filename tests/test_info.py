"""Filename pattern parsing tests (reference: test_info.py:27-81, FIXTURES.md §4)."""

from __future__ import annotations

import datetime

import pytest

from sat_bucket_spark.info import (
    filename_time_exprs,
    get_start_end_time_from_filepaths,
    parse_filename,
)

GPM_PATTERN = (
    "{product_level:s}.{satellite:s}.{sensor:s}.{algorithm:s}."
    "{start_time:%Y%m%d-S%H%M%S}-E{end_time:%H%M%S}.{granule_id}.{version:s}.{data_format:s}"
)
GPM_FILE = "2A.GPM.DPR.V9-20211125.20210705-S013942-E031214.041760.V07A.HDF5"


class TestParseFilename:
    def test_gpm_filename(self):
        info = parse_filename(GPM_FILE, GPM_PATTERN)
        assert info["start_time"] == datetime.datetime(2021, 7, 5, 1, 39, 42)
        assert info["end_time"] == datetime.datetime(2021, 7, 5, 3, 12, 14)
        assert info["product_level"] == "2A"
        assert info["satellite"] == "GPM"

    def test_day_wrap(self):
        # end-time before start-time wraps to next day (reference info.py:58-64)
        f = "X.20240501-S230000-E003000.nc"
        pat = "{name:s}.{start_time:%Y%m%d-S%H%M%S}-E{end_time:%H%M%S}.nc"
        info = parse_filename(f, pat)
        assert info["start_time"] == datetime.datetime(2024, 5, 1, 23, 0, 0)
        assert info["end_time"] == datetime.datetime(2024, 5, 2, 0, 30, 0)

    def test_missing_end_defaults_2h(self):
        f = "X.20240501-S230000.nc"
        pat = "{name:s}.{start_time:%Y%m%d-S%H%M%S}.nc"
        info = parse_filename(f, pat)
        assert info["end_time"] == info["start_time"] + datetime.timedelta(hours=2)

    def test_doy_pattern(self):
        f = "A.2021187.h5"
        pat = "{name:s}.{start_time:%Y%j}.h5"
        info = parse_filename(f, pat)
        assert info["start_time"] == datetime.datetime(2021, 7, 6)

    def test_no_match_raises(self):
        with pytest.raises(ValueError, match="does not match"):
            parse_filename("garbage", GPM_PATTERN)

    def test_filepaths_helper(self):
        starts, ends = get_start_end_time_from_filepaths(
            ["/some/dir/" + GPM_FILE], GPM_PATTERN
        )
        assert starts[0] == datetime.datetime(2021, 7, 5, 1, 39, 42)


class TestFilenameExprs:
    """Column-expression compilation must agree with the driver-side parser."""

    def test_exprs_match_python(self, spark):
        files = [
            "/d/" + GPM_FILE,
            "/d/2A.GPM.DPR.V9-20211125.20210805-S013942-E031214.041760.V07B.HDF5",
            "/d/2A.GPM.DPR.V9-20211125.20240501-S230000-E003000.041760.V07A.HDF5",  # day wrap
        ]
        df = spark.createDataFrame([(p,) for p in files], ["path"])
        exprs = filename_time_exprs("path", GPM_PATTERN)
        got = (
            df.withColumn("s", exprs["start_time"])
            .withColumn("e", exprs["end_time"])
            .orderBy("path")
            .collect()
        )
        starts, ends = get_start_end_time_from_filepaths(sorted(files), GPM_PATTERN)
        for row, s, e in zip(got, starts, ends):
            assert row["s"] == s, row["path"]
            assert row["e"] == e, row["path"]

    def test_exprs_default_end(self, spark):
        pat = "{name:s}.{start_time:%Y%m%d-S%H%M%S}.nc"
        df = spark.createDataFrame([("X.20240501-S230000.nc",)], ["path"])
        exprs = filename_time_exprs("path", pat)
        row = df.select(exprs["start_time"].alias("s"), exprs["end_time"].alias("e")).collect()[0]
        assert row["e"] == row["s"] + datetime.timedelta(hours=2)
