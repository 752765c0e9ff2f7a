"""The reference's golden row counts, reproduced WITHOUT pyproj.

The reference pins exact row counts (reference satbucket/tests/
test_readers.py:96-257) on a bucket built from a geodesic band generated
with ``pyproj.Geod(ellps="sphere")`` (fake_datasets.py:17-38). On a sphere
the geodesic IS the great circle, so ``sat_bucket_spark.geodesy``
reproduces the fixture bit-comparable in pure numpy, and every reference
golden count is asserted here through OUR ``read()`` paths:

    full bucket            150   (3 identical granule files x 5 x 10)
    extent [5,8,0,20]       33
    extent [-10,1,-10,1]     6
    country Nigeria         42
    continent Africa       150
    point (3,3) r=200 km     9   (+ distance column)
    point (3,3) size=20     93
    point (-10,-10) size=25 15

The reference's ``glob_pattern="*V07B*"`` golden (50 rows) selects one
granule by its STAGE FILENAME; our ingest stages Spark part files (the
manifest carries source names instead — routines.py ingest notes), so that
golden is structurally file-layout-specific and is covered by the
file-listing filters in test_file_listing instead; the file_extension
golden (150) is asserted here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sat_bucket_spark import LonLatPartitioning, read
from sat_bucket_spark.geodesy import geodesic_fwd, geodesic_intermediate
from sat_bucket_spark.routines import write_granules_bucket

# reference test_readers.py:62-66
FILEPATHS = [
    "2A.GPM.DPR.V9-20211125.20210705-S013942-E031214.041760.V07A.HDF5",
    "2A.GPM.DPR.V9-20211125.20210805-S013942-E031214.041760.V07B.HDF5",
    "2A.GPM.DPR.V9-20211125.20230705-S013942-E031214.041760.V07A.HDF5",
]


def geodesic_band(
    start_lon=0.0, start_lat=0.0, end_lon=10.0, end_lat=20.0,
    width=1e6, n_along_track=10, n_cross_track=5,
):
    """reference fake_datasets.py:43-71 on the pure-numpy sphere geodesy."""
    offsets = np.linspace(-width / 2, width / 2, n_cross_track)
    lon_lines, lat_lines = [], []
    for off in offsets:
        lons, lats, azis = geodesic_intermediate(
            start_lon, start_lat, end_lon, end_lat, n_along_track
        )
        if off != 0:
            lons, lats, _ = geodesic_fwd(
                lons, lats, azis + 90, np.full(n_along_track, off)
            )
        lon_lines.append(lons)
        lat_lines.append(lats)
    return np.stack(lon_lines), np.stack(lat_lines)


def make_granule_df():
    """reference create_granule_dataframe (test_readers.py:41-56): the SAME
    band for every file — the toy func ignores the filepath.

    Built as a SELF-CONTAINED closure (imports inside, no references to this
    test module) so cloudpickle ships it by value to executor workers, which
    cannot import test modules.
    """

    def granule_df(filepath: str):
        import numpy as _np
        import pandas as _pd

        from sat_bucket_spark.geodesy import (
            geodesic_fwd as _fwd,
            geodesic_intermediate as _inter,
        )

        n_cross, n_along = 5, 10
        rng = _np.random.default_rng(seed=0)
        data = rng.random((n_cross, n_along))
        offsets = _np.linspace(-5e5, 5e5, n_cross)
        lon_lines, lat_lines = [], []
        for off in offsets:
            lons, lats, azis = _inter(0.0, 0.0, 10.0, 20.0, n_along)
            if off != 0:
                lons, lats, _ = _fwd(lons, lats, azis + 90, _np.full(n_along, off))
            lon_lines.append(lons)
            lat_lines.append(lats)
        lon, lat = _np.stack(lon_lines), _np.stack(lat_lines)
        rows = []
        for c in range(n_cross):
            for a in range(n_along):
                rows.append(
                    {
                        "lon": float(lon[c, a]),
                        "lat": float(lat[c, a]),
                        "dummy_var": float(data[c, a]),
                        "gpm_granule_id": 0,
                        "gpm_cross_track_id": c,
                        "gpm_along_track_id": a,
                        "gpm_id": f"0-{a}",
                        "time": _pd.Timestamp("2000-01-01") + _pd.Timedelta(seconds=a),
                    }
                )
        return _pd.DataFrame(rows)

    return granule_df


NUM_COLUMNS = 8  # reference NUM_COLUMNS: the granule frame's own columns


@pytest.fixture(scope="module")
def golden_bucket(spark, tmp_path_factory):
    bucket = str(tmp_path_factory.mktemp("golden") / "bucket")
    fn = make_granule_df()
    schema = spark.createDataFrame(fn(FILEPATHS[0])).schema
    errors = write_granules_bucket(
        spark,
        FILEPATHS,
        bucket,
        LonLatPartitioning(size=(10, 10)),
        fn,
        schema=schema,
    )
    assert not errors
    return bucket


def _data_cols(df):
    return [c for c in df.columns if not c.endswith("_bin")]


class TestGoldenCounts:
    def test_full_bucket(self, spark, golden_bucket):
        df = read(spark, golden_bucket)
        assert df.count() == 150
        assert len(_data_cols(df)) == NUM_COLUMNS

    def test_file_extension(self, spark, golden_bucket):
        assert read(spark, golden_bucket, file_extension=".parquet").count() == 150

    def test_row_column_subsets(self, spark, golden_bucket):
        assert read(spark, golden_bucket, n_rows=2).count() == 2
        df = read(spark, golden_bucket, n_rows=3, columns=["lon", "lat"])
        assert df.count() == 3 and set(_data_cols(df)) == {"lon", "lat"}

    def test_extents(self, spark, golden_bucket):
        assert read(spark, golden_bucket, extent=[-30, 30, -30, 30]).count() == 150
        assert read(spark, golden_bucket, extent=[5, 8, 0, 20]).count() == 33
        assert read(spark, golden_bucket, extent=[-10, 1, -10, 1]).count() == 6
        with pytest.raises(ValueError):
            read(
                spark, golden_bucket, extent=[-50, -30, -50, -30],
                raise_if_empty=True,
            )
        with pytest.raises(ValueError):
            read(
                spark, golden_bucket, extent=[-10, -5, -10, -5],
                raise_if_empty=True,
            )

    def test_country_nigeria(self, spark, golden_bucket):
        assert read(spark, golden_bucket, country="Nigeria").count() == 42
        with pytest.raises(ValueError):
            read(spark, golden_bucket, country="Switzerland", raise_if_empty=True)

    def test_continent_africa(self, spark, golden_bucket):
        assert read(spark, golden_bucket, continent="Africa").count() == 150
        with pytest.raises(ValueError):
            read(spark, golden_bucket, continent="Europe", raise_if_empty=True)

    def test_point_distance(self, spark, golden_bucket):
        df = read(spark, golden_bucket, point=(3, 3), distance=200_000)
        assert "distance" in df.columns
        assert df.count() == 9
        assert len(_data_cols(df)) == NUM_COLUMNS + 1

    def test_point_size(self, spark, golden_bucket):
        assert read(spark, golden_bucket, point=(3, 3), size=20).count() == 93
        assert read(spark, golden_bucket, point=(-10, -10), size=25).count() == 15


class TestReferenceMergeLayout:
    """The reference's merge file-naming golden (test_routines.py:313-315):
    each spatial partition holds ``{year}_{i}.parquet`` files."""

    def test_flattened_merge_matches_reference_naming(self, spark, tmp_path):
        from sat_bucket_spark import merge_granule_buckets, read
        from sat_bucket_spark.maintenance import flatten_time_partitions
        from sat_bucket_spark.routines import write_granules_bucket

        def make_fn():
            def granule_df(filepath: str):
                import numpy as _np
                import pandas as _pd

                from sat_bucket_spark.geodesy import (
                    geodesic_fwd as _fwd,
                    geodesic_intermediate as _inter,
                )

                # data year follows the granule filename's year, so the
                # data-time merge reproduces the reference's file-time groups
                year = filepath.split(".")[4][:4]
                n_cross, n_along = 5, 10
                rng = _np.random.default_rng(seed=0)
                data = rng.random((n_cross, n_along))
                offsets = _np.linspace(-5e5, 5e5, n_cross)
                lon_l, lat_l = [], []
                for off in offsets:
                    lons, lats, azis = _inter(0.0, 0.0, 10.0, 20.0, n_along)
                    if off != 0:
                        lons, lats, _ = _fwd(
                            lons, lats, azis + 90, _np.full(n_along, off)
                        )
                    lon_l.append(lons)
                    lat_l.append(lats)
                lon, lat = _np.stack(lon_l), _np.stack(lat_l)
                rows = []
                for c in range(n_cross):
                    for a in range(n_along):
                        rows.append(
                            {
                                "lon": float(lon[c, a]),
                                "lat": float(lat[c, a]),
                                "dummy_var": float(data[c, a]),
                                "time": _pd.Timestamp(f"{year}-07-05")
                                + _pd.Timedelta(seconds=a),
                            }
                        )
                return _pd.DataFrame(rows)

            return granule_df

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        fn = make_fn()
        schema = spark.createDataFrame(fn(FILEPATHS[0])).schema
        errors = write_granules_bucket(
            spark, FILEPATHS, src, LonLatPartitioning(size=(10, 10)), fn,
            schema=schema,
        )
        assert not errors
        merge_granule_buckets(spark, src, dst, temporal_partitioning="year")

        n_before = read(spark, dst).count()
        moved = flatten_time_partitions(dst)
        assert moved > 0

        # the reference golden: exactly these filenames in this partition
        import os

        pdir = os.path.join(dst, "lon_bin=-5.0", "lat_bin=5.0")
        assert sorted(os.listdir(pdir)) == ["2021_0.parquet", "2023_0.parquet"]

        # the flattened bucket reads back whole through the file-listing
        # path (filename layout, no time_part directories)
        df = read(spark, dst, file_extension=".parquet")
        assert df.count() == n_before
        assert "time_part" not in df.columns
