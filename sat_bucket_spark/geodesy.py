"""Spherical geodesy (great-circle inverse / direct / intermediate points).

Pure-numpy replacement for the geodesic primitives the reference's test
fixtures draw from ``pyproj.Geod(ellps="sphere")`` (reference
satbucket/tests/utils/fake_datasets.py:17-38): on a sphere the geodesic IS
the great circle, so the closed-form spherical-trigonometry solution is
exact — no ellipsoidal series needed, and results match GeographicLib's
sphere case to floating-point rounding.

Conventions follow proj/GeographicLib: azimuths in degrees clockwise from
north, longitudes/latitudes in degrees, distances in metres on the
``sphere`` ellipsoid (R = 6370997 m, proj's "Normal Sphere").

All functions are vectorized numpy — these exist for fixture generation
and driver-side planning, not for row-at-a-time use inside Spark plans
(the Spark-side distance expressions live in filters.py).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SPHERE_RADIUS",
    "geodesic_fwd",
    "geodesic_inv",
    "geodesic_intermediate",
]

# proj's ellps="sphere": a = b = 6370997 m
SPHERE_RADIUS = 6_370_997.0


def geodesic_inv(lon1, lat1, lon2, lat2, radius: float = SPHERE_RADIUS):
    """Great-circle inverse problem.

    Returns ``(fwd_azimuth_deg_at_1, fwd_azimuth_deg_at_2, distance_m)``,
    mirroring ``Geod.inv(..., return_back_azimuth=False)``: the second
    azimuth is the azimuth OF THE LINE at point 2 (its continuation
    direction), not the back azimuth toward point 1.
    """
    lam1, phi1, lam2, phi2 = map(np.radians, (lon1, lat1, lon2, lat2))
    dlam = lam2 - lam1
    cos_phi1, sin_phi1 = np.cos(phi1), np.sin(phi1)
    cos_phi2, sin_phi2 = np.cos(phi2), np.sin(phi2)

    y = cos_phi2 * np.sin(dlam)
    x = cos_phi1 * sin_phi2 - sin_phi1 * cos_phi2 * np.cos(dlam)
    azi1 = np.degrees(np.arctan2(y, x))

    sigma = np.arctan2(
        np.hypot(y, x), sin_phi1 * sin_phi2 + cos_phi1 * cos_phi2 * np.cos(dlam)
    )

    # azimuth of the line at point 2 = 180 - (azimuth from 2 toward 1)
    y2 = cos_phi1 * np.sin(-dlam)
    x2 = cos_phi2 * sin_phi1 - sin_phi2 * cos_phi1 * np.cos(-dlam)
    azi2 = np.degrees(np.arctan2(-y2, -x2))

    return azi1, azi2, sigma * radius


def geodesic_fwd(lon, lat, azimuth, distance, radius: float = SPHERE_RADIUS):
    """Great-circle direct problem (``Geod.fwd`` on the sphere).

    Returns ``(lon2, lat2, fwd_azimuth_deg_at_2)``. Negative distances walk
    backwards along the azimuth, as in proj.
    """
    lam1, phi1 = np.radians(lon), np.radians(lat)
    alpha = np.radians(azimuth)
    sigma = np.asarray(distance, dtype=float) / radius

    sin_phi1, cos_phi1 = np.sin(phi1), np.cos(phi1)
    sin_sigma, cos_sigma = np.sin(sigma), np.cos(sigma)

    sin_phi2 = sin_phi1 * cos_sigma + cos_phi1 * sin_sigma * np.cos(alpha)
    phi2 = np.arcsin(np.clip(sin_phi2, -1.0, 1.0))
    lam2 = lam1 + np.arctan2(
        np.sin(alpha) * sin_sigma * cos_phi1, cos_sigma - sin_phi1 * sin_phi2
    )
    # azimuth of the line at the destination (pole-safe form: num and den
    # both scaled by cos(phi1))
    azi2 = np.degrees(
        np.arctan2(
            np.sin(alpha) * cos_phi1,
            cos_phi1 * cos_sigma * np.cos(alpha) - sin_phi1 * sin_sigma,
        )
    )
    lon2 = np.degrees(lam2)
    # wrap to [-180, 180] like proj
    lon2 = (lon2 + 180.0) % 360.0 - 180.0
    return lon2, np.degrees(phi2), azi2


def geodesic_intermediate(
    lon1: float,
    lat1: float,
    lon2: float,
    lat2: float,
    n_points: int,
    radius: float = SPHERE_RADIUS,
):
    """Evenly-spaced points along the great circle, endpoints INCLUDED.

    Mirrors ``Geod.inv_intermediate(..., npts=n, initial_idx=0,
    terminus_idx=0, return_back_azimuth=False, flags=AZIS_KEEP)``: ``n``
    points at arc fractions ``i/(n-1)`` with the forward azimuth of the
    line at each point. Returns ``(lons, lats, azis)`` numpy arrays.
    """
    if n_points < 2:
        raise ValueError(f"n_points must be >= 2, got {n_points}")
    azi1, _, dist = geodesic_inv(lon1, lat1, lon2, lat2, radius=radius)
    s = np.linspace(0.0, dist, n_points)
    lons, lats, azis = geodesic_fwd(
        np.full(n_points, float(lon1)),
        np.full(n_points, float(lat1)),
        np.full(n_points, float(azi1)),
        s,
        radius=radius,
    )
    # exact endpoints (the direct solution reproduces them to ~1e-12 anyway;
    # pinning avoids boundary flips in bin assignment)
    lons[0], lats[0] = lon1, lat1
    lons[-1], lats[-1] = lon2, lat2
    return lons, lats, azis
