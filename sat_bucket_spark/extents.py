"""Driver-side geographic extent lookup for country / continent queries.

The reference resolves country/continent names to bounding extents via the
gpm-api geospatial helpers (reference: readers.py:246-267, partitioning.py:37-45).
We embed a compact public-domain bounding-box table (continents + common
countries, degrees WGS84 [xmin, xmax, ymin, ymax]) — extents are planning
metadata only (they feed partition pruning + a bbox post-filter), so coarse
bboxes are semantically safe.
"""

from __future__ import annotations

__all__ = ["get_continent_extent", "get_country_extent"]

# [xmin(lon_min), xmax(lon_max), ymin(lat_min), ymax(lat_max)]
CONTINENT_EXTENTS: dict[str, list[float]] = {
    "africa": [-17.6, 51.4, -34.8, 37.3],
    "antarctica": [-180.0, 180.0, -90.0, -60.0],
    "asia": [26.0, 180.0, -10.9, 81.9],
    "europe": [-31.3, 69.0, 34.8, 81.9],
    "north america": [-168.1, -52.6, 7.2, 83.1],
    "oceania": [112.9, 180.0, -47.3, -0.9],
    "south america": [-81.3, -34.8, -55.9, 12.5],
}

COUNTRY_EXTENTS: dict[str, list[float]] = {
    "australia": [112.9, 153.6, -43.6, -10.7],
    "brazil": [-73.9, -34.8, -33.8, 5.3],
    "canada": [-141.0, -52.6, 41.7, 83.1],
    "china": [73.5, 134.8, 18.2, 53.6],
    "france": [-5.1, 9.6, 41.3, 51.1],
    "germany": [5.9, 15.0, 47.3, 55.1],
    "india": [68.1, 97.4, 6.7, 35.5],
    "indonesia": [95.0, 141.0, -11.0, 6.1],
    "italy": [6.6, 18.5, 36.6, 47.1],
    "japan": [122.9, 145.8, 24.2, 45.5],
    "mexico": [-118.4, -86.7, 14.5, 32.7],
    "nigeria": [2.7, 14.7, 4.3, 13.9],
    "south africa": [16.5, 32.9, -34.8, -22.1],
    "spain": [-9.3, 4.3, 36.0, 43.8],
    "switzerland": [6.0, 10.5, 45.8, 47.8],
    "united kingdom": [-8.6, 1.8, 49.9, 60.9],
    "united states": [-171.8, -66.9, 18.9, 71.4],
}


def get_continent_extent(name: str) -> list[float]:
    """Continent name -> [xmin, xmax, ymin, ymax] (reference: readers.py:257-266)."""
    key = name.strip().lower()
    if key not in CONTINENT_EXTENTS:
        raise ValueError(
            f"unknown continent {name!r}; available: {sorted(CONTINENT_EXTENTS)}"
        )
    return list(CONTINENT_EXTENTS[key])


def get_country_extent(name: str) -> list[float]:
    """Country name -> [xmin, xmax, ymin, ymax] (reference: readers.py:247-256)."""
    key = name.strip().lower()
    if key not in COUNTRY_EXTENTS:
        raise ValueError(f"unknown country {name!r}; available: {sorted(COUNTRY_EXTENTS)}")
    return list(COUNTRY_EXTENTS[key])
