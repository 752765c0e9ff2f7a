"""Time regularization + interpolation tests (reference utils/time.py semantics)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.functions.timeseries import interpolate_linear, regularize_timesteps


def test_regularize_fills_gaps(spark):
    base = datetime.datetime(2021, 1, 1)
    rows = [
        (base, 1.0),
        (base + datetime.timedelta(minutes=1), 2.0),
        # minute 2, 3 missing
        (base + datetime.timedelta(minutes=4), 5.0),
    ]
    df = spark.createDataFrame(rows, ["time", "v"])
    out = regularize_timesteps(
        df, freq_seconds=60, agg_exprs={"v": F.avg("v"), "n": F.count(F.lit(1))}
    ).orderBy("time")
    got = out.collect()
    assert len(got) == 5  # full grid minute 0..4
    assert [r["n"] for r in got] == [1, 1, None, None, 1]
    assert got[2]["v"] is None


def test_regularize_partitioned(spark):
    base = datetime.datetime(2021, 1, 1)
    rows = [("a", base, 1.0), ("a", base + datetime.timedelta(minutes=2), 3.0), ("b", base, 9.0)]
    df = spark.createDataFrame(rows, ["k", "time", "v"])
    out = regularize_timesteps(df, freq_seconds=60, partition_by=["k"], agg_exprs={"v": F.avg("v")})
    assert out.where(F.col("k") == "a").count() == 3
    assert out.where(F.col("k") == "b").count() == 1


class TestInterpolate:
    def _make(self, spark, values):
        base = datetime.datetime(2021, 1, 1)
        rows = [
            (base + datetime.timedelta(minutes=i), v) for i, v in enumerate(values)
        ]
        return spark.createDataFrame(rows, ["time", "v"])

    def test_linear_fill(self, spark):
        df = self._make(spark, [1.0, None, None, 4.0])
        got = [
            r["v"] for r in interpolate_linear(df, value="v").orderBy("time").collect()
        ]
        assert got == [1.0, 2.0, 3.0, 4.0]

    def test_edges_stay_null(self, spark):
        df = self._make(spark, [None, 2.0, None])
        got = [
            r["v"] for r in interpolate_linear(df, value="v").orderBy("time").collect()
        ]
        assert got == [None, 2.0, None]

    def test_limit_caps_gap(self, spark):
        df = self._make(spark, [1.0, None, None, None, 5.0, None, 7.0])
        got = [
            r["v"]
            for r in interpolate_linear(df, value="v", limit=1).orderBy("time").collect()
        ]
        # 3-null gap not filled (limit=1); single-null gap filled
        assert got == [1.0, None, None, None, 5.0, 6.0, 7.0]

    def test_irregular_spacing_uses_time(self, spark):
        base = datetime.datetime(2021, 1, 1)
        rows = [
            (base, 0.0),
            (base + datetime.timedelta(minutes=1), None),
            (base + datetime.timedelta(minutes=10), 10.0),
        ]
        df = spark.createDataFrame(rows, ["time", "v"])
        got = [r["v"] for r in interpolate_linear(df, value="v").orderBy("time").collect()]
        assert got[1] == pytest.approx(1.0)  # time-weighted, not row-weighted

    def test_out_column(self, spark):
        df = self._make(spark, [1.0, None, 3.0])
        out = interpolate_linear(df, value="v", out="v_filled").orderBy("time").collect()
        assert [r["v"] for r in out] == [1.0, None, 3.0]
        assert [r["v_filled"] for r in out] == [1.0, 2.0, 3.0]


class TestRollingFeatures:
    def test_matches_pandas_rolling(self, spark):
        import numpy as np
        import pandas as pd

        from sat_bucket_spark.functions.timeseries import add_rolling_features

        rng = np.random.default_rng(3)
        base = pd.Timestamp("2021-01-01")
        pdf = pd.DataFrame(
            {
                "k": rng.integers(0, 3, 200),
                "time": base + pd.to_timedelta(rng.integers(0, 36000, 200), unit="s"),
                "value": np.round(rng.uniform(0, 100, 200), 2),
            }
        )
        out = (
            add_rolling_features(
                spark.createDataFrame(pdf),
                window_seconds=600.0,
                partition_by=["k"],
            )
            .toPandas()
            .sort_values(["k", "time"])
            .reset_index(drop=True)
        )
        # pandas oracle: trailing 600s window, closed on both ends
        exp = pdf.sort_values(["k", "time"]).reset_index(drop=True)
        for col, fn in (("roll_count", "count"), ("roll_sum", "sum"), ("roll_min", "min"), ("roll_max", "max")):
            r = (
                exp.set_index("time")
                .groupby("k")["value"]
                .rolling("600s", closed="both")
                .agg(fn)
                .reset_index(drop=True)
            )
            got_col = out[col].astype("float64")
            assert np.allclose(got_col, r.to_numpy(), atol=1e-6), col

    def test_keyless_global_window(self, spark):
        import pandas as pd

        from sat_bucket_spark.functions.timeseries import add_rolling_features

        base = pd.Timestamp("2021-01-01")
        pdf = pd.DataFrame(
            {"time": [base, base + pd.Timedelta(seconds=30), base + pd.Timedelta(seconds=3000)],
             "value": [1.0, 2.0, 4.0]}
        )
        out = (
            add_rolling_features(spark.createDataFrame(pdf), window_seconds=60.0)
            .toPandas()
            .sort_values("time")
        )
        assert list(out["roll_count"]) == [1, 2, 1]
        assert [float(x) for x in out["roll_sum"]] == [1.0, 3.0, 4.0]


class TestSingleReducerGuard:
    """The unpartitioned-window cliff must be flagged at plan time."""

    def _big(self, spark):
        # spark.range carries an exact Catalyst size estimate (8 bytes/row)
        # with no job: 100M rows ~ 800 MB > the 256 MB guard bound.
        return (
            spark.range(100_000_000)
            .select(
                F.col("id").cast("double").alias("time"),
                F.col("id").cast("double").alias("value"),
            )
        )

    def test_interpolate_warns_keyless_on_large_input(self, spark):
        from sat_bucket_spark.plan_stats import SingleReducerWindowWarning

        with pytest.warns(SingleReducerWindowWarning, match="interpolate_linear"):
            interpolate_linear(self._big(spark))

    def test_regularize_warns_keyless_on_large_input(self, spark):
        from sat_bucket_spark.plan_stats import SingleReducerWindowWarning

        with pytest.warns(SingleReducerWindowWarning, match="regularize_timesteps"):
            regularize_timesteps(self._big(spark))

    def test_rolling_warns_keyless_on_large_input(self, spark):
        from sat_bucket_spark.functions.timeseries import add_rolling_features
        from sat_bucket_spark.plan_stats import SingleReducerWindowWarning

        with pytest.warns(SingleReducerWindowWarning, match="add_rolling_features"):
            add_rolling_features(self._big(spark))

    def test_no_warning_when_partitioned_or_small(self, spark, recwarn):
        from sat_bucket_spark.functions.timeseries import add_rolling_features
        from sat_bucket_spark.plan_stats import SingleReducerWindowWarning

        interpolate_linear(self._big(spark), partition_by=["value"])
        add_rolling_features(self._big(spark), partition_by=["value"])
        small = self._big(spark).limit(10)
        interpolate_linear(small)
        assert not [
            w for w in recwarn.list
            if issubclass(w.category, SingleReducerWindowWarning)
        ]

    def test_forced_global_sessionization_warns(self, spark):
        from sat_bucket_spark.analysis import add_overpass_id
        from sat_bucket_spark.plan_stats import SingleReducerWindowWarning

        big = self._big(spark)
        with pytest.warns(SingleReducerWindowWarning, match="scalable"):
            add_overpass_id(big, interval=60, time="time", strategy="global")

    def test_auto_still_routes_scalable_not_warn(self, spark, recwarn):
        """auto on a big keyless input must REROUTE (no warning needed)."""
        from sat_bucket_spark.analysis import add_overpass_id
        from sat_bucket_spark.plan_stats import SingleReducerWindowWarning

        out = add_overpass_id(
            self._big(spark).limit(1000).localCheckpoint(),
            interval=60, time="time", strategy="auto",
        )
        assert "overpass_id" in out.columns
        assert not [
            w for w in recwarn.list
            if issubclass(w.category, SingleReducerWindowWarning)
        ]
