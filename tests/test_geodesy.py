"""Property tests for the pure-numpy sphere geodesy (geodesy.py)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sat_bucket_spark.geodesy import (
    SPHERE_RADIUS,
    geodesic_fwd,
    geodesic_intermediate,
    geodesic_inv,
)

lons = st.floats(min_value=-179.9, max_value=179.9)
lats = st.floats(min_value=-89.0, max_value=89.0)


class TestGeodesyProperties:
    @settings(max_examples=200, deadline=None)
    @given(lons, lats, st.floats(min_value=-179.9, max_value=179.9),
           st.floats(min_value=0.0, max_value=1.5e7))
    def test_fwd_inv_round_trip(self, lon, lat, azi, dist):
        lon2, lat2, _ = geodesic_fwd(lon, lat, azi, dist)
        _, _, d_back = geodesic_inv(lon, lat, lon2, lat2)
        # inverse distance equals |walked| distance up to the antipode wrap
        circ = 2 * np.pi * SPHERE_RADIUS
        expect = min(dist % circ, circ - dist % circ)
        assert d_back == pytest.approx(expect, abs=1e-5)

    @settings(max_examples=100, deadline=None)
    @given(lons, lats, lons, lats)
    def test_inv_symmetry(self, lon1, lat1, lon2, lat2):
        _, _, d12 = geodesic_inv(lon1, lat1, lon2, lat2)
        _, _, d21 = geodesic_inv(lon2, lat2, lon1, lat1)
        assert d12 == pytest.approx(d21, abs=1e-6)
        assert d12 <= np.pi * SPHERE_RADIUS + 1e-6  # never exceeds half-circ

    @settings(max_examples=60, deadline=None)
    @given(lons, lats, lons, lats, st.integers(min_value=2, max_value=12))
    def test_intermediate_even_spacing_and_endpoints(
        self, lon1, lat1, lon2, lat2, n
    ):
        lons_, lats_, azis = geodesic_intermediate(lon1, lat1, lon2, lat2, n)
        assert (lons_[0], lats_[0]) == (lon1, lat1)
        assert (lons_[-1], lats_[-1]) == (lon2, lat2)
        _, _, total = geodesic_inv(lon1, lat1, lon2, lat2)
        segs = [
            geodesic_inv(lons_[i], lats_[i], lons_[i + 1], lats_[i + 1])[2]
            for i in range(n - 1)
        ]
        for s in segs:
            assert s == pytest.approx(total / (n - 1), abs=1e-4)
        # Clairaut's relation holds at every point (all on one great circle)
        if total > 1.0:  # degenerate same-point path has no defined azimuth
            cl = np.sin(np.radians(azis)) * np.cos(np.radians(lats_))
            assert np.ptp(cl) == pytest.approx(0.0, abs=1e-9)

    def test_known_values(self):
        a1, a2, d = geodesic_inv(0, 0, 90, 0)
        assert (a1, a2) == (90.0, 90.0)
        assert d == pytest.approx(SPHERE_RADIUS * np.pi / 2)
        a1, _, d = geodesic_inv(10, 0, 10, 90)
        assert a1 == pytest.approx(0.0)
        assert d == pytest.approx(SPHERE_RADIUS * np.pi / 2)
