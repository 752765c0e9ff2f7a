"""Distance-function unit tests (reference: test_filters.py analogues)."""

from __future__ import annotations

import numpy as np

from sat_bucket_spark.filters import _haversine_np, _vincenty_inverse


class TestVincenty:
    def test_known_distance(self):
        # Paris (2.35, 48.85) -> New York (-74.0, 40.7): ~5853 km (WGS84
        # ellipsoid; the spherical haversine value is ~5838 km)
        d = _vincenty_inverse(np.array([-74.0]), np.array([40.7]), 2.35, 48.85)
        assert abs(d[0] / 1000.0 - 5853.5) < 5.0

    def test_identical_points_zero(self):
        d = _vincenty_inverse(np.array([5.0]), np.array([5.0]), 5.0, 5.0)
        assert d[0] == 0.0

    def test_antipodal_falls_back_to_haversine(self):
        # Near-antipodal pair: Vincenty's lambda iteration does not converge;
        # result must be the haversine value (~half circumference), not garbage.
        lon0, lat0 = 0.0, 0.0
        lons = np.array([179.5, 180.0 - 1e-6])
        lats = np.array([0.3, 1e-7])
        d = _vincenty_inverse(lons, lats, lon0, lat0)
        h = _haversine_np(lons, lats, lon0, lat0)
        # within the haversine-vs-ellipsoid band around 20000 km, and finite
        assert np.all(np.isfinite(d))
        assert np.all(d > 19_800_000.0)
        assert np.all(d < 20_100_000.0)
        # the non-converged elements must literally equal the haversine value
        assert np.allclose(d, h) or np.all(np.abs(d - h) / h < 0.006)

    def test_mixed_batch_converged_unaffected(self):
        # A batch mixing a normal pair with an antipodal one: the normal
        # element must keep its Vincenty (ellipsoidal) value.
        lons = np.array([-74.0, 179.9999])
        lats = np.array([40.7, 0.0001])
        d = _vincenty_inverse(lons, lats, 2.35, 48.85)
        d_solo = _vincenty_inverse(np.array([-74.0]), np.array([40.7]), 2.35, 48.85)
        assert abs(d[0] - d_solo[0]) < 1e-6
