"""Property-based pin: Spark bin indices == pandas.cut (the reference kernel).

The reference bins with ``pd.cut(values, bins=bounds, labels=False,
include_lowest=True, right=True)`` (reference: partitioning.py:237-250). Our
ceil-based Column expression must agree everywhere — including edges, the
partial last bin, NaN/None, and out-of-extent values.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from sat_bucket_spark.partitioning import XYPartitioning, get_bounds


def _pd_cut_reference(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    return pd.cut(values, bins=bounds, labels=False, include_lowest=True, right=True)


@settings(max_examples=12, deadline=None)
@given(
    vmin=st.floats(min_value=-1000, max_value=999, allow_nan=False),
    span=st.floats(min_value=0.5, max_value=500, allow_nan=False),
    size=st.floats(min_value=0.1, max_value=100, allow_nan=False),
    points=st.lists(
        st.floats(min_value=-1200, max_value=1200, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
)
def test_bin_index_matches_pandas_cut(spark, vmin, span, size, points):
    vmax = vmin + span
    if size >= span:
        size = span  # single bin
    p = XYPartitioning(size=(size, size), extent=[vmin, vmax, vmin, vmax])
    bounds = get_bounds(size, vmin, vmax)
    # Degenerate grid specs where np.arange overshoots vmax (e.g. vmin=256,
    # span=1.1, size=0.1 -> last arange edge 257.10000000000002 > vmax, so
    # the appended vmax makes the edges non-monotonic) are OUTSIDE the
    # reference's domain: its identical arange+append kernel feeds the same
    # edges to pd.cut, which raises "bins must increase monotonically" —
    # parity there is "both reject", not an index comparison. Found by
    # hypothesis in r15; the property compares only where pd.cut is defined.
    assume(np.all(np.diff(bounds) > 0))
    # add the exact edge values — the risky spots
    pts = np.array(points + [vmin, vmax, *bounds[: min(len(bounds), 5)].tolist()])
    expected = _pd_cut_reference(pts, bounds)

    df = spark.createDataFrame([(float(v), float(v)) for v in pts], ["x", "y"])
    got = [
        r["idx"]
        for r in df.select(p.x_index_expr("x").alias("idx"), "x").orderBy("x").collect()
    ]
    order = np.argsort(pts, kind="stable")
    exp_sorted = expected[order]
    for g, e in zip(got, exp_sorted):
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert g is None
        else:
            assert g == int(e)


def test_subnormal_above_edge_bins_right(spark):
    """Pinned hypothesis counterexample: v = 1.4e-45 on extent [-1, 1], size 1.

    (v - vmin)/size rounds to exactly 1.0 (the subnormal vanishes), so the
    closed-form ceil collapses v onto edge 0 and bins it LEFT; right-closed
    semantics demand bin 1. The always-on edge correction (v > b_hi -> idx+1)
    must restore pd.cut parity even though every edge value itself maps
    correctly (which is why gating the correction on edge-exactness was
    unsound).
    """
    p = XYPartitioning(size=(1.0, 1.0), extent=[-1.0, 1.0, -1.0, 1.0])
    pts = [1.401298464324817e-45, 0.0, -0.0, 5e-324, -5e-324]
    bounds = get_bounds(1.0, -1.0, 1.0)
    expected = _pd_cut_reference(np.array(pts), bounds)
    df = spark.createDataFrame([(float(v),) for v in pts], ["x"])
    got = [r["idx"] for r in df.select(p.x_index_expr("x").alias("idx")).collect()]
    assert got == [int(e) for e in expected]


@settings(max_examples=8, deadline=None)
@given(
    n_points=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_labels_match_numpy_reference(spark, n_points, seed):
    """Spark label strings == str(np.round(centroid, d)) for in-extent points."""
    rng = np.random.default_rng(seed)
    p = XYPartitioning(size=(0.5, 0.25), extent=[0, 2, 0, 2])
    pts = rng.uniform(0, 2, size=(n_points, 2))
    df = spark.createDataFrame([(float(a), float(b)) for a, b in pts], ["x", "y"])
    rows = (
        p.add_labels(df, "x", "y", remove_invalid_rows=False)
        .select("x", "y", "xbin", "ybin")
        .collect()
    )
    bounds_x = get_bounds(0.5, 0.0, 2.0)
    bounds_y = get_bounds(0.25, 0.0, 2.0)
    for r in rows:
        ix = _pd_cut_reference(np.array([r["x"]]), bounds_x)[0]
        iy = _pd_cut_reference(np.array([r["y"]]), bounds_y)[0]
        if math.isnan(ix) or math.isnan(iy):
            assert r["xbin"] is None and r["ybin"] is None
            continue
        exp_x = str(np.round(p.x_centroids[int(ix)], p.labels_decimals[0]))
        exp_y = str(np.round(p.y_centroids[int(iy)], p.labels_decimals[1]))
        assert r["xbin"] == exp_x, (r["x"], r["xbin"], exp_x)
        assert r["ybin"] == exp_y, (r["y"], r["ybin"], exp_y)


@pytest.mark.parametrize("size,extent", [
    ((0.1, 0.1), [0, 1, 0, 1]),
    ((3.0, 7.0), [-10, 10, -20, 15]),   # partial last bins both axes
    ((10, 10), [-180, 180, -90, 90]),
])
def test_all_centroids_bin_to_themselves(spark, size, extent):
    """Every centroid must land in its own bin (self-consistency)."""
    p = XYPartitioning(size=size, extent=extent)
    pts = [(float(x), float(y)) for x in p.x_centroids for y in [p.y_centroids[0]]]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = [
        r["idx"] for r in df.select(p.x_index_expr("x").alias("idx"), "x").orderBy("x").collect()
    ]
    assert got == list(range(p.n_x))
