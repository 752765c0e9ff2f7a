"""Partitioning expression tests — the most pinned surface of the engine.

Oracles follow the reference suite's golden assertions
(reference: satbucket/tests/test_partitioning.py; SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.partitioning import (
    LonLatPartitioning,
    TilePartitioning,
    XYPartitioning,
    get_n_decimals,
    partitioning_from_dict,
)


class TestBinSemantics:
    """Right-closed (lo,hi] + include_lowest (reference test_partitioning.py:70-132)."""

    def test_xy_edge_cases(self, spark, xy_points_df):
        # size (0.5, 0.25), extent [0,2,0,2] — FIXTURES.md §2
        p = XYPartitioning(size=(0.5, 0.25), extent=[0, 2, 0, 2])
        out = p.add_labels(xy_points_df, x="x", y="y", remove_invalid_rows=True)
        rows = out.orderBy("x").collect()
        assert [r["xbin"] for r in rows] == ["0.25", "0.25", "0.25", "0.75", "1.25", "1.75"]
        assert [r["ybin"] for r in rows] == ["0.125", "0.125", "0.375", "0.875", "1.375", "1.875"]

    def test_invalid_rows_kept_as_null(self, spark, xy_points_df):
        p = XYPartitioning(size=(0.5, 0.25), extent=[0, 2, 0, 2])
        out = p.add_labels(xy_points_df, x="x", y="y", remove_invalid_rows=False)
        assert out.count() == 9
        assert out.where(F.col("xbin").isNull()).count() == 3  # -0.001, 2.1, NaN

    def test_boundary_membership(self, spark):
        # vmin -> first bin; interior boundary -> lower bin; vmax -> last bin
        p = XYPartitioning(size=1.0, extent=[0, 4, 0, 4])
        df = spark.createDataFrame([(0.0, 0.0), (1.0, 1.0), (4.0, 4.0)], ["x", "y"])
        got = [r["xbin"] for r in p.add_labels(df, "x", "y").orderBy("x").collect()]
        assert got == ["0.5", "0.5", "3.5"]

    def test_partial_last_bin(self, spark):
        # extent not a multiple of size: last bin is narrower (np.arange semantics)
        p = XYPartitioning(size=1.0, extent=[0, 2.5, 0, 2.5])
        assert p.n_x == 3
        assert p.x_bounds.tolist() == [0.0, 1.0, 2.0, 2.5]
        df = spark.createDataFrame([(2.2, 2.2)], ["x", "y"])
        row = p.add_labels(df, "x", "y").collect()[0]
        assert row["xbin"] == "2.25"  # centroid of partial bin (2.0+2.5)/2

    def test_label_matches_numpy_formatting(self, spark):
        # Spark label strings == driver-side numpy label strings
        p = LonLatPartitioning(size=10)
        df = spark.createDataFrame(
            [(float(lon), float(lat)) for lon in range(-175, 180, 35) for lat in range(-85, 90, 35)],
            ["lon", "lat"],
        )
        got = (
            p.add_labels(df, "lon", "lat")
            .select("lon_bin", "lat_bin")
            .distinct()
            .collect()
        )
        valid_x = set(p.x_labels.tolist())
        valid_y = set(p.y_labels.tolist())
        for r in got:
            assert r["lon_bin"] in valid_x
            assert r["lat_bin"] in valid_y


class TestLabels:
    def test_zero_decimals_int_labels(self, spark):
        p = XYPartitioning(size=2, extent=[0, 10, 0, 10], labels_decimals=0)
        df = spark.createDataFrame([(0.5, 9.5)], ["x", "y"])
        row = p.add_labels(df, "x", "y").collect()[0]
        assert row["xbin"] == "1"  # int cast at 0 decimals (reference partitioning.py:899-910)
        assert row["ybin"] == "9"

    def test_default_decimals(self):
        assert get_n_decimals(0.5) == 1
        assert get_n_decimals(10) == 0
        p = XYPartitioning(size=(0.5, 0.25), extent=[0, 2, 0, 2])
        assert p.labels_decimals == (2, 3)

    def test_negative_labels(self, spark):
        p = LonLatPartitioning(size=10)
        df = spark.createDataFrame([(-7.0, -3.0)], ["lon", "lat"])
        row = p.add_labels(df, "lon", "lat").collect()[0]
        assert row["lon_bin"] == "-5.0"
        assert row["lat_bin"] == "-5.0"


class TestLabelFastPath:
    def test_fast_and_slow_paths_agree(self, spark):
        from sat_bucket_spark.partitioning import format_label_expr

        p = LonLatPartitioning(size=10)
        assert p._fast_label == (True, True)
        df = spark.createDataFrame(
            [(float(v), 0.0) for v in range(-175, 180, 15)], ["lon", "lat"]
        )
        both = df.select(
            p.x_label_expr("lon").alias("fast"),
            format_label_expr(p.x_centroid_expr("lon"), p.labels_decimals[0]).alias("slow"),
        ).collect()
        for r in both:
            assert r["fast"] == r["slow"]

    def test_slow_path_for_tiny_labels(self):
        # labels below 1e-3 magnitude must use the exact formatting pipeline
        p = XYPartitioning(size=0.0005, extent=[0, 0.002, 0, 0.002])
        assert p._fast_label == (False, False)

    def test_py4j_validation_matches_expression_job(self, spark):
        # The job-free validation (direct BigDecimal/Double.toString calls)
        # must agree with evaluating the actual round().cast(string) Column —
        # they are supposed to be the same JVM code.
        import numpy as np

        from sat_bucket_spark.partitioning import (
            _jvm_format_labels,
            _jvm_format_labels_job,
        )

        grids = [
            (np.array([-175.0, -5.05, 0.25, 9.999, 123.456, 179.95]), 1),
            (np.array([-175.0, -5.05, 0.25, 9.999, 123.456, 179.95]), 2),
            (np.array([0.001, 0.5, 1048576.0, 9999999.0]), 3),
        ]
        for cents, dec in grids:
            assert _jvm_format_labels(spark, cents, dec) == _jvm_format_labels_job(
                spark, cents, dec
            ), (cents, dec)

    def test_jvm_validation_runs_no_job(self, spark):
        from sat_bucket_spark.partitioning import (
            _JVM_FAST_LABEL_CACHE,
            jvm_fast_label_ok,
        )

        p = LonLatPartitioning(size=(20, 20))
        tracker = spark.sparkContext.statusTracker()
        before = max(tracker.getJobIdsForGroup() or [-1])
        ok = jvm_fast_label_ok(p.x_labels, p.x_centroids, p.labels_decimals[0])
        after = max(tracker.getJobIdsForGroup() or [-1])
        assert ok is True
        assert after == before  # py4j path: zero Spark jobs


class TestCentroids:
    def test_add_centroids(self, spark):
        p = LonLatPartitioning(size=10)
        df = spark.createDataFrame([(12.0, 47.0), (float("nan"), 1.0)], ["lon", "lat"])
        out = p.add_centroids(df, x="lon", y="lat").orderBy("lat").collect()
        assert out[1]["lon_c"] == 15.0
        assert out[1]["lat_c"] == 45.0
        assert out[0]["lon_c"] is None or np.isnan(out[0]["lon_c"])


class TestTilePartitioning:
    def test_two_level_origin_bottom(self, spark):
        p = TilePartitioning(size=1.0, extent=[0, 4, 0, 4], n_levels=2)
        df = spark.createDataFrame([(0.5, 0.5), (3.5, 3.5)], ["x", "y"])
        rows = p.add_labels(df, "x", "y").orderBy("x").collect()
        # origin=bottom (default): y index flipped (reference partitioning.py:314-318)
        assert (rows[0]["x"], rows[0]["y"]) == ("0", "3")
        assert (rows[1]["x"], rows[1]["y"]) == ("3", "0")

    def test_two_level_origin_top(self, spark):
        p = TilePartitioning(size=1.0, extent=[0, 4, 0, 4], n_levels=2, origin="top")
        df = spark.createDataFrame([(0.5, 0.5)], ["x", "y"])
        r = p.add_labels(df, "x", "y").collect()[0]
        assert (r["x"], r["y"]) == ("0", "0")

    def test_one_level_direction_x(self, spark):
        p = TilePartitioning(size=1.0, extent=[0, 4, 0, 4], n_levels=1, origin="top")
        df = spark.createDataFrame([(1.5, 0.5), (0.5, 1.5)], ["x", "y"])
        rows = p.add_labels(df, "x", "y").orderBy("x").collect()
        # row-major ravel over (y, x): (y=1,x=0)->4 ; (y=0,x=1)->1
        assert rows[0]["tile"] == "4"
        assert rows[1]["tile"] == "1"

    def test_one_level_direction_y_justify(self, spark):
        p = TilePartitioning(
            size=1.0, extent=[0, 4, 0, 4], n_levels=1, origin="top", direction="y", justify=True
        )
        df = spark.createDataFrame([(1.5, 0.5)], ["x", "y"])
        r = p.add_labels(df, "x", "y").collect()[0]
        # column-major: x*n_y + y = 1*4+0 = 4, zero-padded to width len("16")=2
        assert r["tile"] == "04"

    def test_matches_numpy_ravel(self, spark):
        # Cross-check tile ids against np.ravel_multi_index for all cells
        for origin in ("top", "bottom"):
            for direction in ("x", "y"):
                p = TilePartitioning(
                    size=1.0, extent=[0, 3, 0, 2], n_levels=1, origin=origin, direction=direction
                )
                pts = [(x + 0.5, y + 0.5) for x in range(3) for y in range(2)]
                df = spark.createDataFrame(pts, ["x", "y"])
                got = {
                    (r["x"], r["y"]): r["tile"]
                    for r in p.add_labels(df, "x", "y")
                    .withColumn("x", F.col("x"))
                    .collect()
                }
                for (px, py), tile in got.items():
                    xi, yi = int(px - 0.5), int(py - 0.5)
                    yo = yi if origin == "top" else p.n_y - 1 - yi
                    order = "C" if direction == "x" else "F"
                    expect = np.ravel_multi_index((yo, xi), (p.n_y, p.n_x), order=order)
                    assert tile == str(expect), (origin, direction, px, py)


class TestPruning:
    def test_partitions_by_extent(self):
        p = LonLatPartitioning(size=10)
        parts = p.get_partitions_by_extent([5, 8, 0, 20])
        assert parts["lon_bin"] == ["5.0"]
        # endpoint 0 bins right-closed into (-10,0] so partition -5.0 is included
        # (matches reference get_partitions_by_extent centroid-range scan,
        # partitioning.py:599-620)
        assert parts["lat_bin"] == ["-5.0", "5.0", "15.0"]

    def test_partitions_by_extent_boundary(self):
        p = LonLatPartitioning(size=10)
        # extent touching a bin edge includes both neighbors of the edge? no:
        # [0,10] spans exactly bin (0,10] plus bin containing 0 -> (-10,0]
        parts = p.get_partitions_by_extent([0, 10, 0, 10])
        assert "5.0" in parts["lon_bin"]

    def test_pruning_predicate_filters(self, spark, orbit_df):
        p = LonLatPartitioning(size=10)
        labeled = p.add_labels(orbit_df, x="lon", y="lat")
        pred = p.pruning_predicate([5, 8, 0, 20])
        pruned = labeled.where(pred)
        # pruned superset of exact bbox rows
        exact = labeled.where(
            (F.col("lon") >= 5) & (F.col("lon") <= 8) & (F.col("lat") >= 0) & (F.col("lat") <= 20)
        )
        assert pruned.count() >= exact.count() > 0

    def test_disjoint_extent_empty(self):
        p = LonLatPartitioning(size=10, extent=[-20, 20, -20, 20])
        parts = p.get_partitions_by_extent([100, 110, 50, 60])
        assert parts["lon_bin"] == [] and parts["lat_bin"] == []


class TestSerialization:
    def test_round_trip(self):
        for p in [
            LonLatPartitioning(size=(10, 5), labels_decimals=2),
            XYPartitioning(size=(0.5, 0.25), extent=[0, 2, 0, 2]),
            TilePartitioning(size=1.0, extent=[0, 4, 0, 4], n_levels=1, justify=True),
        ]:
            q = partitioning_from_dict(p.to_dict())
            assert q.to_dict() == p.to_dict()

    def test_directories_hive(self):
        p = LonLatPartitioning(size=90)
        dirs = p.directories
        assert len(dirs) == p.n_partitions == 8
        assert all("lon_bin=" in d and "lat_bin=" in d for d in dirs)

    def test_order_differs_from_levels(self):
        p = LonLatPartitioning(size=90, order=["lat_bin", "lon_bin"])
        d = p.directories[0]
        assert d.startswith("lat_bin=")


class TestValidation:
    def test_bad_extent(self):
        with pytest.raises(ValueError):
            XYPartitioning(size=1, extent=[2, 1, 0, 1])

    def test_bad_size(self):
        with pytest.raises(ValueError):
            XYPartitioning(size=-1, extent=[0, 1, 0, 1])

    def test_bad_order(self):
        with pytest.raises(ValueError):
            LonLatPartitioning(size=10, order=["a", "b"])


class TestQuadmeshGeometry:
    """B15: quadmesh corners / per-cell vertices (viz helpers)."""

    def test_quadmesh_corners_shape_and_bounds(self):
        p = LonLatPartitioning(size=(90, 45))  # 4 x 4 cells
        xc, yc = p.quadmesh_corners()
        assert xc.shape == (p.n_y + 1, p.n_x + 1)
        assert yc.shape == (p.n_y + 1, p.n_x + 1)
        assert xc[0, 0] == -180 and xc[0, -1] == 180
        assert yc[0, 0] == -90 and yc[-1, 0] == 90

    def test_vertices_ccw_and_cell_extent(self):
        p = LonLatPartitioning(size=(90, 45))
        v = p.vertices()
        assert v.shape == (p.n_x * p.n_y, 4, 2)
        # first cell is the lower-left: [-180,-90] .. [-90,-45]
        cell = v[0]
        assert cell[:, 0].min() == -180 and cell[:, 0].max() == -90
        assert cell[:, 1].min() == -90 and cell[:, 1].max() == -45
        # counterclockwise: shoelace area positive for every cell
        x, y = v[:, :, 0], v[:, :, 1]
        area2 = np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1)
        assert (area2 > 0).all()

    def test_vertices_cover_extent_exactly(self):
        p = LonLatPartitioning(size=(60, 30))
        v = p.vertices()
        assert v[:, :, 0].min() == -180 and v[:, :, 0].max() == 180
        assert v[:, :, 1].min() == -90 and v[:, :, 1].max() == 90
        # total shoelace area == full extent area
        x, y = v[:, :, 0], v[:, :, 1]
        area = np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y) / 2
        assert area == 360 * 180


class TestFilterByExtentPartitions:
    def test_matches_label_filter(self, spark):
        import numpy as np

        p = LonLatPartitioning(size=10)
        rng = np.random.default_rng(3)
        rows = [
            (int(i), float(lon), float(lat))
            for i, (lon, lat) in enumerate(
                zip(rng.uniform(-180, 180, 500), rng.uniform(-90, 90, 500))
            )
        ]
        df = spark.createDataFrame(rows, ["id", "x", "y"])
        extent = [5, 25, -90, -80]
        naive = (
            p.add_labels(df, x="x", y="y")
            .where(p.pruning_predicate(extent))
            .select("id", "lon_bin", "lat_bin")
        )
        fast = p.filter_by_extent_partitions(df, extent, x="x", y="y").select(
            "id", "lon_bin", "lat_bin"
        )
        assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))

    def test_empty_extent_intersection(self, spark):
        p = LonLatPartitioning(size=10)
        df = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "x", "y"])
        out = p.filter_by_extent_partitions(df, [200, 210, 95, 99], x="x", y="y")
        assert out.count() == 0


class TestZorder:
    def test_matches_numpy_interleave(self, spark):
        import numpy as np

        from sat_bucket_spark.partitioning import zorder_index_expr

        xy = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(256)]
        df = spark.createDataFrame(xy, ["id", "x", "y"])
        got = {
            r["id"]: r["z"]
            for r in df.withColumn("z", zorder_index_expr("x", "y", bits=6)).collect()
        }

        def interleave(x, y):
            z = 0
            for b in range(6):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            return z

        for i, x, y in xy:
            assert got[i] == interleave(x, y)

    def test_null_bins_propagate(self, spark):
        from sat_bucket_spark.partitioning import zorder_index_expr

        df = spark.createDataFrame([(1, None, 3), (2, 2, 3)], "id int, x int, y int")
        got = {r["id"]: r["z"] for r in df.withColumn(
            "z", zorder_index_expr("x", "y", bits=4)).collect()}
        assert got[1] is None and got[2] is not None

    def test_zorder_sort_tightens_rowgroup_stats(self, spark, tmp_path):
        """Files written in z-order must carry tighter per-file x AND y ranges
        than the natural (x-major) order — the row-group pruning win."""
        import itertools

        from pyspark.sql import functions as F

        from sat_bucket_spark.partitioning import zorder_index_expr

        grid = list(itertools.product(range(32), range(32)))
        df = (
            spark.createDataFrame(grid, ["x", "y"])
            .withColumn("z", zorder_index_expr("x", "y", bits=5))
            .coalesce(1)
        )

        def avg_span(path):
            out = (
                spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg(
                    (F.max("x") - F.min("x")).alias("sx"),
                    (F.max("y") - F.min("y")).alias("sy"),
                )
                .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
                .first()
            )
            return out["ax"], out["ay"]

        opts = {"maxRecordsPerFile": "64"}
        zp, xp = str(tmp_path / "zsort"), str(tmp_path / "xsort")
        df.sortWithinPartitions("z").write.options(**opts).parquet(zp)
        df.sortWithinPartitions("x", "y").write.options(**opts).parquet(xp)
        zx, zy = avg_span(zp)
        xx, xy_ = avg_span(xp)
        # x-major sort: each 64-row file spans 2 x-values but ALL 32 y values;
        # z-order: each file is an 8x8 tile. Both axes must be bounded tight.
        assert zx <= 8 and zy <= 8
        assert xy_ >= 16  # the comparison baseline really is y-unbounded


class TestZorderProperties:
    def test_bijective_on_grid(self, spark):
        """Every (x, y) in a 64x64 grid maps to a distinct z value whose
        python-side decode returns the original pair (bit-exact bijection)."""
        import itertools

        from sat_bucket_spark.partitioning import zorder_index_expr

        grid = list(itertools.product(range(64), range(64)))
        df = spark.createDataFrame(grid, ["x", "y"])
        rows = df.withColumn("z", zorder_index_expr("x", "y", bits=6)).collect()

        def decode(z):
            x = y = 0
            for b in range(6):
                x |= ((z >> (2 * b)) & 1) << b
                y |= ((z >> (2 * b + 1)) & 1) << b
            return x, y

        zs = set()
        for r in rows:
            assert decode(r["z"]) == (r["x"], r["y"])
            zs.add(r["z"])
        assert len(zs) == len(grid)  # injective
        assert min(zs) == 0 and max(zs) == 4095  # onto [0, 4^6)

    def test_monotone_in_each_axis_prefix(self, spark):
        """Fixing y, z is strictly increasing in x (and vice versa) —
        the property row-group min/max pruning relies on."""
        from pyspark.sql import functions as F

        from sat_bucket_spark.partitioning import zorder_index_expr

        df = spark.createDataFrame([(x, 21) for x in range(256)], ["x", "y"])
        zs = [
            r["z"]
            for r in df.withColumn("z", zorder_index_expr("x", "y", bits=8))
            .orderBy("x")
            .collect()
        ]
        assert all(a < b for a, b in zip(zs, zs[1:]))


class TestZorder3D:
    def test_bijective_and_decodes(self, spark):
        """3-D interleave: every (x, y, t) on an 8^3 grid maps to a distinct
        z whose stride-3 decode returns the original triple."""
        import itertools

        from sat_bucket_spark.partitioning import zorder_index_expr

        grid = list(itertools.product(range(8), range(8), range(8)))
        df = spark.createDataFrame(grid, ["x", "y", "t"])
        rows = df.withColumn(
            "z", zorder_index_expr("x", "y", bits=3, t_bin="t")
        ).collect()

        def decode(z):
            x = y = t = 0
            for b in range(3):
                x |= ((z >> (3 * b)) & 1) << b
                y |= ((z >> (3 * b + 1)) & 1) << b
                t |= ((z >> (3 * b + 2)) & 1) << b
            return x, y, t

        zs = set()
        for r in rows:
            assert decode(r["z"]) == (r["x"], r["y"], r["t"])
            zs.add(r["z"])
        assert len(zs) == len(grid)
        assert min(zs) == 0 and max(zs) == 8 ** 3 - 1

    def test_two_d_unchanged_without_t(self, spark):
        """Omitting t_bin must reproduce the exact 2-D stride-2 index."""
        from sat_bucket_spark.partitioning import zorder_index_expr

        df = spark.createDataFrame([(i, (i * 7) % 16, (i * 5) % 16) for i in range(64)],
                                   ["id", "x", "y"])
        got = {
            r["id"]: r["z"]
            for r in df.withColumn("z", zorder_index_expr("x", "y", bits=4)).collect()
        }

        def interleave2(x, y):
            z = 0
            for b in range(4):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            return z

        for i, x, y in [(i, (i * 7) % 16, (i * 5) % 16) for i in range(64)]:
            assert got[i] == interleave2(x, y)

    def test_bits_overflow_raises(self, spark):
        from sat_bucket_spark.partitioning import zorder_index_expr

        import pytest

        with pytest.raises(ValueError, match="overflows"):
            zorder_index_expr("x", "y", bits=22, t_bin="t")
        with pytest.raises(ValueError, match="overflows"):
            zorder_index_expr("x", "y", bits=32)

    def test_3d_sort_tightens_all_three_axes(self, spark, tmp_path):
        """Files sorted by the 3-D index bound x, y AND t spans per file;
        a time-major sort leaves x/y unbounded within each file."""
        import itertools

        from pyspark.sql import functions as F

        from sat_bucket_spark.partitioning import zorder_index_expr

        grid = list(itertools.product(range(16), range(16), range(16)))
        df = (
            spark.createDataFrame(grid, ["x", "y", "t"])
            .withColumn("z", zorder_index_expr("x", "y", bits=4, t_bin="t"))
            .coalesce(1)
        )

        def avg_spans(path):
            out = (
                spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg(
                    (F.max("x") - F.min("x")).alias("sx"),
                    (F.max("y") - F.min("y")).alias("sy"),
                    (F.max("t") - F.min("t")).alias("st"),
                )
                .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"), F.avg("st").alias("at"))
                .first()
            )
            return out["ax"], out["ay"], out["at"]

        opts = {"maxRecordsPerFile": "512"}  # 8 files of 8x8x8 z-cubes
        zp, tp = str(tmp_path / "z3"), str(tmp_path / "tsort")
        df.sortWithinPartitions("z").write.options(**opts).parquet(zp)
        df.sortWithinPartitions("t", "x", "y").write.options(**opts).parquet(tp)
        zx, zy, zt = avg_spans(zp)
        tx, ty, tt = avg_spans(tp)
        # z-order: each 512-row file is an 8x8x8 cube -> all spans <= 8
        assert zx <= 8 and zy <= 8 and zt <= 8
        # time-major: t tight (2 values) but x and y span the full 16
        assert tx >= 15 and ty >= 15


class TestQuadmeshGeometry:
    """B15: viz geometry (reference partitioning.py:494-570) — numpy-only."""

    def _p(self):
        from sat_bucket_spark.partitioning import XYPartitioning

        return XYPartitioning(size=(10, 5), extent=(0.0, 20.0, 0.0, 10.0))

    def test_quadmesh_corner_shapes_and_values(self):
        p = self._p()  # 2 x 2 grid
        xc, yc = p.quadmesh_corners()
        assert xc.shape == (3, 3) and yc.shape == (3, 3)
        assert xc[0].tolist() == [0.0, 10.0, 20.0]
        assert [row[0] for row in yc.tolist()] == [0.0, 5.0, 10.0]

    def test_vertices_tile_the_extent(self):
        import numpy as np

        p = self._p()
        v = p.vertices()
        assert v.shape == (p.n_partitions, 4, 2)
        # first cell: (0,0) -> (10,0) -> (10,5) -> (0,5), counterclockwise
        assert v[0].tolist() == [[0, 0], [10, 0], [10, 5], [0, 5]]
        # every cell has positive signed area (CCW) and the same area
        x, y = v[..., 0], v[..., 1]
        area = 0.5 * np.sum(
            x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1
        )
        assert np.allclose(area, 50.0)
        assert float(area.sum()) == 20.0 * 10.0  # tiles the whole extent

    def test_to_shapely_raises_without_shapely(self):
        import pytest

        try:
            import shapely  # noqa: F401

            pytest.skip("shapely available; raise path untestable")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="shapely"):
            self._p().to_shapely()


class TestPolygonPruning:
    """Cell-exact polygon pruning (beyond-reference; bbox is the baseline)."""

    DIAG = [(-40.0, -40.0), (-30.0, -40.0), (40.0, 40.0), (30.0, 40.0)]  # diagonal strip

    def _sampled_cells(self, p, polygon, n=25):
        """Cells containing at least one of n*n polygon-interior samples —
        a subset of the true intersecting set (no sliver guarantees)."""
        import numpy as np

        from tests.test_filters import _pip_ref

        xs = np.linspace(min(v[0] for v in polygon), max(v[0] for v in polygon), n)
        ys = np.linspace(min(v[1] for v in polygon), max(v[1] for v in polygon), n)
        cells = set()
        for px in xs:
            for py in ys:
                if _pip_ref(px, py, polygon):
                    xi = int(np.searchsorted(p.x_bounds, px, side="left")) - 1
                    yi = int(np.searchsorted(p.y_bounds, py, side="left")) - 1
                    if 0 <= xi < p.n_x and 0 <= yi < p.n_y:
                        cells.add((xi, yi))
        return cells

    def test_no_false_prune(self):
        """Every cell provably touching the polygon must be kept."""
        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(10, 10))
        xi, yi = p._cells_by_polygon(self.DIAG)
        kept = set(zip(xi.tolist(), yi.tolist()))
        assert self._sampled_cells(p, self.DIAG) <= kept

    def test_prunes_beyond_bbox(self):
        """A diagonal strip keeps far fewer cells than its bbox envelope."""
        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(5, 5))
        xi, yi = p._cells_by_polygon(self.DIAG)
        xr, yr = p._index_ranges_by_extent([-40, 40, -40, 40])
        n_bbox = len(xr) * len(yr)
        assert 0 < len(xi) < n_bbox / 2  # strip ~ O(n), bbox ~ O(n^2)

    def test_cell_inside_and_vertex_inside_cases(self):
        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(10, 10))
        # polygon strictly inside one cell: keeps exactly that cell
        tiny = [(1.0, 1.0), (2.0, 1.0), (1.5, 2.0)]
        xi, yi = p._cells_by_polygon(tiny)
        assert set(zip(xi.tolist(), yi.tolist())) == {(18, 9)}
        # polygon spanning many whole cells: every interior cell kept
        big = [(-25.0, -25.0), (25.0, -25.0), (25.0, 25.0), (-25.0, 25.0)]
        xi, yi = p._cells_by_polygon(big)
        assert len(xi) == 6 * 6  # [-30..30) x [-30..30) cell range

    def test_predicate_references_partition_columns_only(self, spark):
        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(10, 10))
        pred = p.polygon_pruning_predicate(self.DIAG)
        s = str(pred._jc)
        assert "lon_bin" in s and "lat_bin" in s
        assert "lon'" not in s and "lat'" not in s  # no data columns

    def test_tile_partitioning_one_and_two_level(self):
        from sat_bucket_spark.partitioning import TilePartitioning

        tri = [(-170.0, -80.0), (-100.0, -80.0), (-170.0, 80.0)]
        ext = [-180, 180, -90, 90]
        t2 = TilePartitioning(size=(20, 20), extent=ext, n_levels=2)
        parts = t2.get_partitions_by_polygon(tri)
        assert set(parts) == {"x", "y"} and parts["x"] and parts["y"]
        t1 = TilePartitioning(size=(20, 20), extent=ext, n_levels=1)
        parts1 = t1.get_partitions_by_polygon(tri)
        assert set(parts1) == {"tile"} and parts1["tile"]
        # triangle covers ~half its bbox: the cell set must too
        xi, yi = t1._cells_by_polygon(tri)
        xr, yr = t1._index_ranges_by_extent([-170, -100, -80, 80])
        assert len(xi) < len(xr) * len(yr)

    def test_directories_by_polygon_subset_of_extent(self):
        from sat_bucket_spark.filters import polygon_bbox
        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(10, 10))
        by_poly = set(p.directories_by_polygon(self.DIAG))
        by_bbox = set(p.directories_by_extent(polygon_bbox(self.DIAG)))
        assert by_poly and by_poly < by_bbox


class TestPolygonPruningProperties:
    def test_never_false_prunes_random_polygons(self):
        """PROPERTY: for random polygons and random interior points, the
        point's cell is ALWAYS in the kept set (pruning may over-keep,
        never under-keep)."""
        import random

        import numpy as np

        from sat_bucket_spark.partitioning import LonLatPartitioning
        from tests.test_filters import _pip_ref

        p = LonLatPartitioning(size=(10, 10))
        rng = random.Random(123)
        for trial in range(30):
            # random star-shaped polygon around a random center (always simple)
            cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
            n = rng.randint(3, 9)
            pts = []
            for k in range(n):
                ang = 2 * 3.141592653589793 * k / n + rng.uniform(0, 0.3)
                r = rng.uniform(3, 25)
                pts.append((cx + r * np.cos(ang), cy + r * np.sin(ang)))
            poly = [(max(-179.9, min(179.9, a)), max(-89.9, min(89.9, b))) for a, b in pts]
            xi, yi = p._cells_by_polygon(poly)
            kept = set(zip(xi.tolist(), yi.tolist()))
            for _ in range(60):
                px = rng.uniform(min(a for a, _ in poly), max(a for a, _ in poly))
                py = rng.uniform(min(b for _, b in poly), max(b for _, b in poly))
                if not _pip_ref(px, py, poly):
                    continue
                ci = int(np.searchsorted(p.x_bounds, px, side="left")) - 1
                cj = int(np.searchsorted(p.y_bounds, py, side="left")) - 1
                assert (ci, cj) in kept, (trial, px, py, poly)

    def test_driver_side_cost_bounded_at_fine_grids(self):
        """The vectorized cell test stays driver-cheap on a 0.5-degree grid
        (259200 cells): a continental polygon plans in well under a second."""
        import time

        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(0.5, 0.5))
        poly = [(-120.0, -50.0), (-20.0, 60.0), (80.0, -40.0), (0.0, -10.0)]
        t0 = time.perf_counter()
        xi, yi = p._cells_by_polygon(poly)
        dt = time.perf_counter() - t0
        assert len(xi) > 1000  # genuinely large selection
        assert dt < 2.0, dt  # numpy-vectorized, not per-cell Python
