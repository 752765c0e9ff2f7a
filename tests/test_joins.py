"""As-of join and binned interval join: oracles are pandas merge_asof and a
naive cross-join overlap filter."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.joins import asof_join, interval_join_binned


def _frames(seed: int = 7, n_left: int = 400, n_right: int = 150, n_keys: int = 5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": np.round(rng.uniform(0, 1000, n_left), 3),
            "lv": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": np.round(rng.uniform(0, 1000, n_right), 3),
            "rv": np.arange(n_right) * 10,
        }
    )
    return left, right


def _merge_asof(left, right, direction, tolerance=None):
    kwargs = {"tolerance": tolerance} if tolerance is not None else {}
    out = pd.merge_asof(
        left.sort_values(["t", "lv"]),
        right.sort_values("t").rename(columns={"t": "rt"}),
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
        **kwargs,
    )
    return out.sort_values("lv").reset_index(drop=True)


class TestAsofJoin:
    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_pandas_merge_asof(self, spark, direction):
        left, right = _frames()
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right.rename(columns={"t": "rt"})),
                on="t",
                right_on="rt",
                by="k",
                direction=direction,
            )
            .toPandas()
            .sort_values("lv")
            .reset_index(drop=True)
        )
        exp = _merge_asof(left, right, direction)
        pd.testing.assert_series_equal(got["rv"], exp["rv"], check_dtype=False)

    def test_tolerance(self, spark):
        left, right = _frames(seed=11)
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right.rename(columns={"t": "rt"})),
                on="t",
                right_on="rt",
                by="k",
                tolerance=25.0,
            )
            .toPandas()
            .sort_values("lv")
            .reset_index(drop=True)
        )
        exp = _merge_asof(left, right, "backward", tolerance=25.0)
        pd.testing.assert_series_equal(got["rv"], exp["rv"], check_dtype=False)

    def test_exact_tie_matches(self, spark):
        left = spark.createDataFrame([(1, 10.0, "L")], ["k", "t", "lv"])
        right = spark.createDataFrame([(1, 10.0, "R")], ["k", "rt", "rv"])
        out = asof_join(left, right, on="t", right_on="rt", by="k").collect()
        assert out[0]["rv"] == "R"
        fwd = asof_join(
            left, right, on="t", right_on="rt", by="k", direction="forward"
        ).collect()
        assert fwd[0]["rv"] == "R"

    def test_no_match_is_null(self, spark):
        left = spark.createDataFrame([(1, 5.0, 0)], ["k", "t", "lv"])
        right = spark.createDataFrame([(1, 9.0, 1)], ["k", "rt", "rv"])
        assert asof_join(left, right, on="t", right_on="rt", by="k").collect()[0][
            "rv"
        ] is None

    def test_name_collision_suffixed(self, spark):
        left = spark.createDataFrame([(1, 5.0, 7)], ["k", "t", "value"])
        right = spark.createDataFrame([(1, 4.0, 8)], ["k", "t", "value"])
        out = asof_join(left, right, on="t", by="k")
        assert "value_right" in out.columns
        row = out.collect()[0]
        assert row["value"] == 7 and row["value_right"] == 8

    def test_timestamps(self, spark):
        from datetime import datetime

        left = spark.createDataFrame(
            [(1, datetime(2024, 1, 1, 0, 5), 0)], ["k", "t", "lv"]
        )
        right = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 0, 1), 1),
                (1, datetime(2024, 1, 1, 0, 4), 2),
                (1, datetime(2024, 1, 1, 0, 6), 3),
            ],
            ["k", "rt", "rv"],
        )
        assert (
            asof_join(left, right, on="t", right_on="rt", by="k").collect()[0]["rv"]
            == 2
        )
        # tolerance in seconds over timestamps
        assert (
            asof_join(
                left, right, on="t", right_on="rt", by="k", tolerance=30.0
            ).collect()[0]["rv"]
            is None
        )

    def test_keyless_global_asof(self, spark):
        left, right = _frames(n_keys=1)
        left = left.drop(columns=["k"])
        right = right.drop(columns=["k"])
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right.rename(columns={"t": "rt"})),
                on="t",
                right_on="rt",
            )
            .toPandas()
            .sort_values("lv")
            .reset_index(drop=True)
        )
        exp = (
            pd.merge_asof(
                left.sort_values(["t", "lv"]),
                right.sort_values("t").rename(columns={"t": "rt"}),
                left_on="t",
                right_on="rt",
                direction="backward",
            )
            .sort_values("lv")
            .reset_index(drop=True)
        )
        pd.testing.assert_series_equal(got["rv"], exp["rv"], check_dtype=False)

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_null_times_never_match(self, spark, direction):
        left = spark.createDataFrame(
            [(1, None, 0), (1, 5.0, 1)], "k: long, t: double, lv: long"
        )
        right = spark.createDataFrame(
            [(1, 1.0, 10), (1, None, 99), (1, 9.0, 30)], "k: long, rt: double, rv: long"
        )
        rows = {
            r["lv"]: r["rv"]
            for r in asof_join(
                left, right, on="t", right_on="rt", by="k", direction=direction
            ).collect()
        }
        assert rows[0] is None  # null left time: no match in either direction
        assert rows[1] == (10 if direction == "backward" else 30)  # null rt skipped

    def test_reserved_names_rejected(self, spark):
        df = spark.createDataFrame([(1, 1.0)], ["k", "t"])
        bad = df.withColumn("__asof_t", F.lit(0))
        with pytest.raises(ValueError, match="__asof_t"):
            asof_join(bad, df, on="t", by="k")

    def test_plan_is_single_window_no_python(self, spark):
        left, right = _frames()
        out = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.rename(columns={"t": "rt"})),
            on="t",
            right_on="rt",
            by="k",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        assert "Python" not in plan  # pure Column expressions
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan


class TestIntervalJoinBinned:
    @staticmethod
    def _intervals(seed, n, span, name):
        rng = np.random.default_rng(seed)
        start = rng.uniform(0, 500, n)
        return pd.DataFrame(
            {
                f"{name}_id": np.arange(n),
                f"{name}_s": np.round(start, 3),
                f"{name}_e": np.round(start + rng.uniform(0, span, n), 3),
            }
        )

    @pytest.mark.parametrize("bin_width", [1.0, 7.0, 50.0])
    def test_matches_naive_overlap(self, spark, bin_width):
        lp = self._intervals(1, 200, 20, "a")
        rp = self._intervals(2, 120, 35, "b")
        got = (
            interval_join_binned(
                spark.createDataFrame(lp),
                spark.createDataFrame(rp),
                "a_s",
                "a_e",
                "b_s",
                "b_e",
                bin_width=bin_width,
            )
            .select("a_id", "b_id")
            .toPandas()
        )
        cross = lp.merge(rp, how="cross")
        exp = cross[(cross.a_s <= cross.b_e) & (cross.a_e >= cross.b_s)][
            ["a_id", "b_id"]
        ]
        got_set = set(map(tuple, got.values))
        exp_set = set(map(tuple, exp.values))
        assert got_set == exp_set
        assert len(got) == len(got_set)  # each pair exactly once

    def test_plan_is_equi_join(self, spark):
        lp = self._intervals(3, 50, 10, "a")
        rp = self._intervals(4, 50, 10, "b")
        out = interval_join_binned(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            "a_s",
            "a_e",
            "b_s",
            "b_e",
            bin_width=10.0,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # hash join on the bin id, never a nested-loop/cartesian theta join
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan

    def test_rejects_bad_args(self, spark):
        df = spark.createDataFrame([(0.0, 1.0)], ["s", "e"])
        with pytest.raises(ValueError):
            interval_join_binned(df, df, "s", "e", "s", "e", bin_width=0)
        with pytest.raises(ValueError):
            interval_join_binned(df, df, "s", "e", "s", "e", bin_width=1, how="left")
        # shared column names would make the joined output ambiguous
        with pytest.raises(ValueError, match="share column names"):
            interval_join_binned(df, df, "s", "e", "s", "e", bin_width=1)


class TestPointsInPolygonsJoin:
    POLYS = [
        (1, [-60.0, 0.0, 60.0, 0.0], [-40.0, 50.0, -40.0, -10.0]),   # dart
        (2, [-170.0, -100.0, -170.0], [-80.0, -80.0, 80.0]),          # triangle
        (3, [-65.0, -35.0, -35.0, -65.0], [-45.0, -45.0, -15.0, -15.0]),  # box overlapping dart
    ]

    def test_array_expr_equals_literal_expr(self, spark):
        import random

        from pyspark.sql import functions as F

        from sat_bucket_spark.filters import point_in_polygon_expr
        from sat_bucket_spark.joins import point_in_polygon_array_expr

        rng = random.Random(3)
        poly = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0), (4.0, 10.0), (0.0, 10.0)]
        pts = [(i, rng.uniform(-2, 12), rng.uniform(-2, 12)) for i in range(300)]
        df = spark.createDataFrame(pts, ["id", "lon", "lat"])
        xs = F.array(*[F.lit(p[0]) for p in poly])
        ys = F.array(*[F.lit(p[1]) for p in poly])
        rows = df.select(
            "id",
            point_in_polygon_expr(poly).alias("lit"),
            point_in_polygon_array_expr(F.col("lon"), F.col("lat"), xs, ys).alias("arr"),
        ).collect()
        assert all(r["lit"] == r["arr"] for r in rows)

    def test_join_matches_per_polygon_bruteforce(self, spark):
        import random

        from sat_bucket_spark.filters import filter_by_polygon
        from sat_bucket_spark.joins import points_in_polygons_join
        from sat_bucket_spark.partitioning import LonLatPartitioning

        rng = random.Random(17)
        pts = [(i, rng.uniform(-175, 175), rng.uniform(-85, 85)) for i in range(400)]
        points = spark.createDataFrame(pts, ["id", "lon", "lat"])
        polygons = spark.createDataFrame(self.POLYS, ["polygon_id", "xs", "ys"])
        p = LonLatPartitioning(size=(10, 10))
        got = {
            (r["id"], r["polygon_id"])
            for r in points_in_polygons_join(points, polygons, p).collect()
        }
        want = set()
        for pid, xs, ys in self.POLYS:
            poly = list(zip(xs, ys))
            for r in filter_by_polygon(points, poly).collect():
                want.add((r["id"], pid))
        assert got == want and want  # non-vacuous: overlapping polys, hits exist

    def test_plan_broadcasts_candidates(self, spark):
        from sat_bucket_spark.joins import points_in_polygons_join
        from sat_bucket_spark.partitioning import LonLatPartitioning

        points = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "lon", "lat"])
        polygons = spark.createDataFrame(self.POLYS, ["polygon_id", "xs", "ys"])
        out = points_in_polygons_join(points, polygons, LonLatPartitioning(size=(10, 10)))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
        assert "Python" not in plan

    def test_oversize_polygon_yields_null_not_wrong(self, spark):
        """Past max_vertices the expression is NULL (dropped by filters),
        never a truncated-polygon answer."""
        from pyspark.sql import functions as F

        from sat_bucket_spark.joins import point_in_polygon_array_expr

        poly = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
        df = spark.createDataFrame([(5.0, 5.0)], ["lon", "lat"])
        xs = F.array(*[F.lit(p[0]) for p in poly])
        ys = F.array(*[F.lit(p[1]) for p in poly])
        ok = df.select(
            point_in_polygon_array_expr(F.col("lon"), F.col("lat"), xs, ys, max_vertices=4).alias("r")
        ).collect()[0]["r"]
        over = df.select(
            point_in_polygon_array_expr(F.col("lon"), F.col("lat"), xs, ys, max_vertices=3).alias("r")
        ).collect()[0]["r"]
        assert ok is True and over is None

    def test_join_raises_on_oversized_polygon(self, spark):
        """An oversized ring must raise naming the polygon, never return 0 rows."""
        import pytest

        from sat_bucket_spark.joins import points_in_polygons_join
        from sat_bucket_spark.partitioning import LonLatPartitioning

        points = spark.createDataFrame([(1, 5.0, 5.0)], ["id", "lon", "lat"])
        n = 9  # max_vertices + 1 below
        import math
        xs = [5.0 + 4.0 * math.cos(2 * math.pi * i / n) for i in range(n)]
        ys = [5.0 + 4.0 * math.sin(2 * math.pi * i / n) for i in range(n)]
        polygons = spark.createDataFrame([(7, xs, ys)], ["polygon_id", "xs", "ys"])
        p = LonLatPartitioning(size=(10, 10))
        with pytest.raises(ValueError, match=r"exceed max_vertices=8.*7\(9 vertices\)"):
            points_in_polygons_join(points, polygons, p, max_vertices=8)
        # and at the default cap the same polygon is fine
        got = points_in_polygons_join(points, polygons, p).collect()
        assert {(r["id"], r["polygon_id"]) for r in got} == {(1, 7)}

    def test_explode_strategy_matches_bruteforce_on_large_rings(self, spark):
        """large_ring_strategy='explode' routes big rings through the
        edge-aggregate path; result must equal the per-polygon brute force,
        with small rings still joining through the unrolled path."""
        import math
        import random

        from sat_bucket_spark.filters import filter_by_polygon
        from sat_bucket_spark.joins import points_in_polygons_join
        from sat_bucket_spark.partitioning import LonLatPartitioning

        rng = random.Random(23)
        pts = [(i, rng.uniform(-175, 175), rng.uniform(-85, 85)) for i in range(500)]
        points = spark.createDataFrame(pts, ["id", "lon", "lat"])
        # a 200-vertex wavy ring (non-convex) + one small box
        n = 200
        big = [
            (
                40 * math.cos(2 * math.pi * k / n) * (1 + 0.3 * math.sin(8 * math.pi * k / n)),
                40 * math.sin(2 * math.pi * k / n) * (1 + 0.3 * math.sin(8 * math.pi * k / n)),
            )
            for k in range(n)
        ]
        small = [(-170.0, -80.0), (-100.0, -80.0), (-100.0, -20.0), (-170.0, -20.0)]
        polygons = spark.createDataFrame(
            [
                (1, [p[0] for p in big], [p[1] for p in big]),
                (2, [p[0] for p in small], [p[1] for p in small]),
            ],
            ["polygon_id", "xs", "ys"],
        )
        p = LonLatPartitioning(size=(10, 10))
        got = {
            (r["id"], r["polygon_id"])
            for r in points_in_polygons_join(
                points, polygons, p, max_vertices=64, large_ring_strategy="explode"
            ).collect()
        }
        want = set()
        for pid, poly in [(1, big), (2, small)]:
            for r in filter_by_polygon(points, poly).collect():
                want.add((r["id"], pid))
        assert got == want and want
        # and the same polygons via the pure unrolled path agree too
        unrolled = {
            (r["id"], r["polygon_id"])
            for r in points_in_polygons_join(
                points, polygons, p, max_vertices=256
            ).collect()
        }
        assert unrolled == want

    def test_explode_path_single_shuffle(self, spark):
        """The large-ring route must broadcast both dim tables and pay ONE
        exchange (the crossing aggregation)."""
        import math

        from sat_bucket_spark.joins import points_in_polygons_join
        from sat_bucket_spark.partitioning import LonLatPartitioning

        points = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "lon", "lat"])
        n = 100
        ring = [(30 * math.cos(2 * math.pi * k / n), 30 * math.sin(2 * math.pi * k / n)) for k in range(n)]
        polygons = spark.createDataFrame(
            [(1, [p[0] for p in ring], [p[1] for p in ring])], ["polygon_id", "xs", "ys"]
        )
        out = points_in_polygons_join(
            points, polygons, LonLatPartitioning(size=(10, 10)),
            max_vertices=8, large_ring_strategy="explode",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
        assert {(r["id"], r["polygon_id"]) for r in out.collect()} == {(1, 1)}

    def test_join_accepts_string_polygon_ids(self, spark):
        """Candidate-table id dtype follows polygons.schema (not hardcoded long)."""
        from sat_bucket_spark.joins import points_in_polygons_join
        from sat_bucket_spark.partitioning import LonLatPartitioning

        points = spark.createDataFrame([(1, 5.0, 5.0), (2, 50.0, 50.0)], ["id", "lon", "lat"])
        polygons = spark.createDataFrame(
            [("IT", [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0])],
            ["polygon_id", "xs", "ys"],
        )
        got = points_in_polygons_join(points, polygons, LonLatPartitioning(size=(10, 10))).collect()
        assert {(r["id"], r["polygon_id"]) for r in got} == {(1, "IT")}


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark):
        from sat_bucket_spark.joins import salted_join

        left = spark.createDataFrame(
            [(i, "hot" if i % 3 else "cold", float(i)) for i in range(300)],
            ["id", "k", "v"],
        )
        right = spark.createDataFrame(
            [("hot", 1.5), ("cold", 2.5), ("absent", 9.9)], ["k", "w"]
        )
        got = sorted(
            tuple(r)
            for r in salted_join(left, right, "k", salt=4)
            .select("id", "k", "v", "w")
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in left.join(right, "k").select("id", "k", "v", "w").collect()
        )
        assert got == want and len(got) == 300

    def test_left_join_keeps_unmatched(self, spark):
        from sat_bucket_spark.joins import salted_join

        left = spark.createDataFrame([(1, "a"), (2, "zzz")], ["id", "k"])
        right = spark.createDataFrame([("a", 10)], ["k", "w"])
        rows = {
            (r["id"], r["w"])
            for r in salted_join(left, right, ["k"], how="left").collect()
        }
        assert rows == {(1, 10), (2, None)}

    def test_spreads_hot_key_across_salts(self, spark):
        """The hot key's rows must actually land in multiple salt buckets —
        the whole point of the operator."""
        from pyspark.sql import functions as F

        left = spark.createDataFrame(
            [(i, "hot", float(i)) for i in range(1000)], ["id", "k", "v"]
        )
        n_buckets = (
            left.withColumn(
                "__salt",
                F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
            )
            .select("__salt")
            .distinct()
            .count()
        )
        assert n_buckets == 8

    def test_deterministic_across_runs(self, spark):
        from sat_bucket_spark.joins import salted_join

        left = spark.createDataFrame([(i, "k") for i in range(50)], ["id", "k"])
        right = spark.createDataFrame([("k", 1)], ["k", "w"])
        a = sorted(tuple(r) for r in salted_join(left, right, "k").collect())
        b = sorted(tuple(r) for r in salted_join(left, right, "k").collect())
        assert a == b

    def test_rejects_right_outer(self, spark):
        import pytest as _pytest

        from sat_bucket_spark.joins import salted_join

        df = spark.createDataFrame([(1, "a")], ["id", "k"])
        with _pytest.raises(ValueError, match="left-preserving"):
            salted_join(df, df, "k", how="right")
