"""Dense-grid materialization tests (reference to_xarray contract)."""

from __future__ import annotations

import numpy as np
import pytest
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


class TestIdwGrid:
    def _ref(self, pts, p, power=2.0, r=1, min_d=1.0):
        """Independent numpy IDW accumulation."""
        import numpy as np

        from sat_bucket_spark.filters import _haversine_np

        acc = {}
        xc, yc = p.x_centroids, p.y_centroids
        for lon, lat, v in pts:
            xi = int(np.searchsorted(p.x_bounds, lon, side="left")) - 1
            yi = int(np.searchsorted(p.y_bounds, lat, side="left")) - 1
            for dx in range(-r, r + 1):
                for dy in range(-r, r + 1):
                    ti, tj = xi + dx, yi + dy
                    if not (0 <= ti < p.n_x and 0 <= tj < p.n_y):
                        continue
                    d = _haversine_np(
                        np.array([lon]), np.array([lat]), float(xc[ti]), float(yc[tj])
                    )[0]
                    w = 1.0 / max(d, min_d) ** power
                    sw, swv, n = acc.get((ti, tj), (0.0, 0.0, 0))
                    acc[(ti, tj)] = (sw + w, swv + w * v, n + 1)
        return {k: (swv / sw, n) for k, (sw, swv, n) in acc.items()}

    def test_matches_numpy_reference(self, spark):
        import random

        from sat_bucket_spark.gridding import idw_to_grid
        from sat_bucket_spark.partitioning import LonLatPartitioning

        rng = random.Random(5)
        pts = [
            (rng.uniform(-175, 175), rng.uniform(-85, 85), rng.uniform(0, 100))
            for _ in range(200)
        ]
        p = LonLatPartitioning(size=(10, 10))
        df = spark.createDataFrame(pts, ["lon", "lat", "value"])
        got = {
            (r["lon_c"], r["lat_c"]): (r["value"], r["n_obs"])
            for r in idw_to_grid(df, p).collect()
        }
        ref = self._ref(pts, p)
        ref_by_c = {
            (float(p.x_centroids[i]), float(p.y_centroids[j])): v
            for (i, j), v in ref.items()
        }
        assert set(got) == set(ref_by_c)
        for k, (val, n) in ref_by_c.items():
            assert got[k][1] == n
            assert got[k][0] == pytest.approx(val, rel=1e-9), k

    def test_border_observation_contributes_inside_only(self, spark):
        from sat_bucket_spark.gridding import idw_to_grid
        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(10, 10))
        df = spark.createDataFrame([(-179.0, -89.0, 5.0)], ["lon", "lat", "value"])
        rows = idw_to_grid(df, p).collect()
        # corner cell: only the 2x2 in-extent neighborhood receives it
        assert len(rows) == 4
        assert all(r["n_obs"] == 1 for r in rows)

    def test_single_shuffle_plan(self, spark):
        from sat_bucket_spark.gridding import idw_to_grid
        from sat_bucket_spark.partitioning import LonLatPartitioning

        p = LonLatPartitioning(size=(10, 10))
        df = spark.createDataFrame([(0.0, 0.0, 1.0)], ["lon", "lat", "value"])
        plan = idw_to_grid(df, p)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # one shuffle: the target-cell agg
        assert "Python" not in plan


class TestNearestGrid:
    def test_matches_numpy_reference(self, spark):
        import random

        from sat_bucket_spark.filters import _haversine_np
        from sat_bucket_spark.gridding import nearest_to_grid
        from sat_bucket_spark.partitioning import LonLatPartitioning

        rng = random.Random(9)
        pts = [
            (rng.uniform(-170, 170), rng.uniform(-80, 80), float(i))
            for i in range(150)
        ]
        p = LonLatPartitioning(size=(10, 10))
        df = spark.createDataFrame(pts, ["lon", "lat", "value"])
        got = {
            (r["lon_c"], r["lat_c"]): (r["value"], r["n_obs"])
            for r in nearest_to_grid(df, p).collect()
        }
        # reference: for each cell, nearest point among 3x3-neighborhood members
        ref = {}
        for lon, lat, v in pts:
            xi = int(np.searchsorted(p.x_bounds, lon, side="left")) - 1
            yi = int(np.searchsorted(p.y_bounds, lat, side="left")) - 1
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    ti, tj = xi + dx, yi + dy
                    if not (0 <= ti < p.n_x and 0 <= tj < p.n_y):
                        continue
                    d = round(
                        _haversine_np(
                            np.array([lon]), np.array([lat]),
                            float(p.x_centroids[ti]), float(p.y_centroids[tj]),
                        )[0],
                        6,
                    )
                    cur = ref.get((ti, tj))
                    if cur is None:
                        ref[(ti, tj)] = (d, v, 1)
                    elif (d, v) < (cur[0], cur[1]):
                        ref[(ti, tj)] = (d, v, cur[2] + 1)
                    else:
                        ref[(ti, tj)] = (cur[0], cur[1], cur[2] + 1)
        ref_by_c = {
            (float(p.x_centroids[i]), float(p.y_centroids[j])): (v, n)
            for (i, j), (d, v, n) in ref.items()
        }
        assert got == ref_by_c

    def test_single_shuffle_no_python(self, spark):
        from sat_bucket_spark.gridding import nearest_to_grid
        from sat_bucket_spark.partitioning import LonLatPartitioning

        df = spark.createDataFrame([(0.0, 0.0, 1.0)], ["lon", "lat", "value"])
        plan = (
            nearest_to_grid(df, LonLatPartitioning(size=(10, 10)))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1
        assert "Python" not in plan


def test_idw_output_feeds_dense_grid(spark):
    """Composition: IDW cell aggregates pivot straight into the dense
    (y, x) grid contract — labels are the same partition label columns."""
    from sat_bucket_spark.gridding import idw_to_grid

    p = LonLatPartitioning(size=90)  # 4 x 2 grid
    df = spark.createDataFrame(
        [(10.0, 10.0, 4.0), (-100.0, -50.0, 8.0)], ["lon", "lat", "value"]
    )
    arrays = to_grid_arrays(idw_to_grid(df, p, value_col="value"), p, ["value"])
    assert arrays["value"].shape == (2, 4)
    # each obs fills its own cell and (here) its in-extent neighbors
    assert not np.isnan(arrays["value"][1, 2])
    assert not np.isnan(arrays["value"][0, 0])


def test_idw_time_buckets_equal_per_day_runs(spark):
    """Space-time IDW == running plain IDW on each day's slice."""
    import datetime

    from sat_bucket_spark.gridding import idw_to_grid

    p = LonLatPartitioning(size=(10, 10))
    d1 = datetime.datetime(2021, 7, 5, 3, 0)
    d2 = datetime.datetime(2021, 7, 6, 21, 0)
    rows = [
        (1.0, 1.0, 10.0, d1), (2.0, 2.0, 30.0, d1 + datetime.timedelta(hours=2)),
        (1.0, 1.0, 99.0, d2), (15.0, 15.0, 7.0, d2),
    ]
    df = spark.createDataFrame(rows, ["lon", "lat", "value", "time"])
    st = {
        (r["lon_c"], r["lat_c"], r["time_bucket"]): (r["value"], r["n_obs"])
        for r in idw_to_grid(df, p, time_col="time", time_bucket="day").collect()
    }
    assert st  # non-empty
    for day in (d1.date(), d2.date()):
        sliced = df.where(F.to_date("time") == F.lit(day))
        plain = {
            (r["lon_c"], r["lat_c"]): (r["value"], r["n_obs"])
            for r in idw_to_grid(sliced, p).collect()
        }
        got_day = {
            (cx, cy): v
            for (cx, cy, tb), v in st.items()
            if tb.date() == day
        }
        assert got_day == plain, day


def test_nearest_time_buckets(spark):
    import datetime

    from sat_bucket_spark.gridding import nearest_to_grid

    p = LonLatPartitioning(size=(10, 10))
    d1 = datetime.datetime(2021, 7, 5)
    d2 = datetime.datetime(2021, 7, 6)
    df = spark.createDataFrame(
        [(1.0, 1.0, 10.0, d1), (1.0, 1.0, 99.0, d2)],
        ["lon", "lat", "value", "time"],
    )
    out = nearest_to_grid(df, p, time_col="time").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["time_bucket"], set()).add(r["value"])
    assert by_bucket == {d1: {10.0}, d2: {99.0}}


def test_resamplers_work_on_tile_partitioning(spark):
    """IDW/nearest are partitioning-polymorphic: tile grids get tile-id
    labels with the same cell math."""
    from sat_bucket_spark.gridding import idw_to_grid, nearest_to_grid
    from sat_bucket_spark.partitioning import TilePartitioning

    p = TilePartitioning(size=(10, 10), extent=[-180, 180, -90, 90], n_levels=1)
    df = spark.createDataFrame(
        [(5.0, 5.0, 1.0), (15.0, 5.0, 3.0)], ["lon", "lat", "value"]
    )
    idw = idw_to_grid(df, p).collect()
    assert {r["tile"] for r in idw} and all(r["n_obs"] >= 1 for r in idw)
    # the cell between both points averages them; weights favor neither
    mid = [r for r in idw if r["lon_c"] == 5.0 and r["lat_c"] == 15.0]
    assert mid and 1.0 < mid[0]["value"] < 3.0
    assert nearest_to_grid(df, p).count() == len(idw)


def test_fanout_candidates_built_inside_one_generator(spark):
    """r16 fan-out restructure: the (2r+1)² candidate cells are built and
    bounds-checked INSIDE one generator expression, so the heavy bin-index
    CASE is referenced only in the single Generate (shared by codegen
    subexpression elimination) and the post-explode Filter operator is
    gone — the r15 shape carried the CASE in both a pushed Filter and the
    target-index Project (~6 evaluations per fan-out row)."""
    from sat_bucket_spark.gridding import idw_to_grid, nearest_to_grid
    from sat_bucket_spark.partitioning import LonLatPartitioning

    p = LonLatPartitioning(size=(10, 10))
    df = spark.createDataFrame(
        [(0.0, 0.0, 1.0), (5.0, 5.0, 2.0)], ["lon", "lat", "value"]
    )
    for fn in (idw_to_grid, nearest_to_grid):
        plan = fn(df, p)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate") == 1, fn.__name__
        assert plan.count("Filter") == 0, fn.__name__  # bounds check is in-generator


def test_fanout_null_coords_contribute_nothing(spark):
    """NULL bin indices yield an empty candidate array which explode
    drops — exactly the r15 NULL-index filter's semantics."""
    from sat_bucket_spark.gridding import idw_to_grid
    from sat_bucket_spark.partitioning import LonLatPartitioning

    p = LonLatPartitioning(size=(10, 10))
    df = spark.createDataFrame(
        [(0.0, 0.0, 1.0), (None, 0.0, 9.0), (3.0, None, 9.0)],
        "lon double, lat double, value double",
    )
    rows = idw_to_grid(df, p).collect()
    # only the valid interior point lands: 3x3 cells, one obs each, and no
    # cell ever saw the NULL-coordinate values
    assert len(rows) == 9
    assert all(r["n_obs"] == 1 for r in rows)
    assert all(abs(r["value"] - 1.0) < 1e-12 for r in rows)


def test_edge_cases_empty_inputs(spark):
    """Empty inputs and out-of-extent polygons degrade to empty results,
    never errors."""
    from sat_bucket_spark.filters import filter_by_polygon
    from sat_bucket_spark.gridding import idw_to_grid, nearest_to_grid
    from sat_bucket_spark.joins import points_in_polygons_join

    p = LonLatPartitioning(size=(10, 10))
    empty = spark.createDataFrame([], "lon double, lat double, value double")
    assert idw_to_grid(empty, p).count() == 0
    assert nearest_to_grid(empty, p).count() == 0
    pts = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "lon", "lat"])
    no_polys = spark.createDataFrame(
        [], "polygon_id long, xs array<double>, ys array<double>"
    )
    assert points_in_polygons_join(pts, no_polys, p).count() == 0
    off_world = [(500.0, 500.0), (501.0, 500.0), (500.5, 501.0)]
    assert filter_by_polygon(pts, off_world).count() == 0
    assert p._cells_by_polygon(off_world)[0].size == 0
