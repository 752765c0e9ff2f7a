"""Driver-side geographic extent lookup for country / continent queries.

The reference resolves country/continent names to bounding extents via the
gpm-api geospatial helpers (reference: readers.py:246-267, partitioning.py:37-45).
We embed a public-domain bounding-box table derived from Natural Earth
admin-0 country bounds (~200 countries + common territories, degrees WGS84
``[xmin, xmax, ymin, ymax]``, rounded to 0.1 deg outward) — extents are
planning metadata only (they feed partition pruning + a bbox post-filter),
so coarse bboxes are semantically safe.

Antimeridian note: countries whose territory crosses the 180th meridian
(fiji, kiribati, russia's easternmost islands) are given the conventional
full-longitude clip Natural Earth uses; the resulting superset extent keeps
pruning and bbox filtering correct, just less selective.
"""

from __future__ import annotations

__all__ = ["extend_extent", "get_continent_extent", "get_country_extent"]


def extend_extent(extent: list[float], padding) -> list[float]:
    """Extend an [xmin, xmax, ymin, ymax] extent by degrees of padding.

    Reference: readers.py:209-215 — a single number pads every direction;
    two values are (x, y) padding; four values follow the extent order.
    The result is clamped to the valid geographic domain.
    """
    if isinstance(padding, (int, float)):
        px0 = px1 = py0 = py1 = float(padding)
    else:
        vals = [float(v) for v in padding]
        if len(vals) == 2:
            px0 = px1 = vals[0]
            py0 = py1 = vals[1]
        elif len(vals) == 4:
            px0, px1, py0, py1 = vals
        else:
            raise ValueError("padding must be a number or a 2- or 4-element sequence")
    x0, x1, y0, y1 = (float(v) for v in extent)
    return [
        max(x0 - px0, -180.0),
        min(x1 + px1, 180.0),
        max(y0 - py0, -90.0),
        min(y1 + py1, 90.0),
    ]

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
    # -- Africa --------------------------------------------------------------
    "algeria": [-8.7, 12.0, 18.9, 37.1],
    "angola": [11.7, 24.1, -18.1, -4.4],
    "benin": [0.8, 3.9, 6.2, 12.4],
    "botswana": [19.9, 29.4, -27.0, -17.8],
    "burkina faso": [-5.6, 2.4, 9.4, 15.1],
    "burundi": [29.0, 30.9, -4.5, -2.3],
    "cabo verde": [-25.4, -22.6, 14.8, 17.2],
    "cameroon": [8.4, 16.2, 1.6, 13.1],
    "central african republic": [14.4, 27.5, 2.2, 11.0],
    "chad": [13.4, 24.0, 7.4, 23.5],
    "comoros": [43.2, 44.6, -12.5, -11.3],
    "cote d'ivoire": [-8.7, -2.5, 4.3, 10.8],
    "democratic republic of the congo": [12.2, 31.3, -13.5, 5.4],
    "djibouti": [41.7, 43.5, 10.9, 12.8],
    "egypt": [24.7, 36.9, 21.9, 31.7],
    "equatorial guinea": [5.6, 11.4, -1.5, 3.8],
    "eritrea": [36.4, 43.2, 12.3, 18.1],
    "eswatini": [30.8, 32.2, -27.4, -25.7],
    "ethiopia": [32.9, 48.0, 3.4, 15.0],
    "gabon": [8.7, 14.6, -4.0, 2.4],
    "gambia": [-16.9, -13.8, 13.0, 13.9],
    "ghana": [-3.3, 1.3, 4.7, 11.2],
    "guinea": [-15.2, -7.6, 7.1, 12.7],
    "guinea-bissau": [-16.8, -13.6, 10.9, 12.7],
    "kenya": [33.9, 42.0, -4.8, 5.6],
    "lesotho": [27.0, 29.5, -30.7, -28.5],
    "liberia": [-11.6, -7.3, 4.3, 8.6],
    "libya": [9.3, 25.2, 19.5, 33.2],
    "madagascar": [43.2, 50.5, -25.7, -11.9],
    "malawi": [32.6, 36.0, -17.2, -9.3],
    "mali": [-12.3, 4.3, 10.1, 25.0],
    "mauritania": [-17.1, -4.8, 14.7, 27.3],
    "mauritius": [56.5, 63.6, -20.6, -10.3],
    "morocco": [-13.2, -1.0, 27.6, 35.9],
    "mozambique": [30.2, 40.9, -26.9, -10.4],
    "namibia": [11.7, 25.3, -29.0, -16.9],
    "niger": [0.1, 16.0, 11.6, 23.5],
    "nigeria": [2.7, 14.7, 4.3, 13.9],
    "republic of the congo": [11.1, 18.7, -5.1, 3.7],
    "rwanda": [28.8, 30.9, -2.9, -1.0],
    "sao tome and principe": [6.4, 7.5, 0.0, 1.8],
    "senegal": [-17.6, -11.3, 12.3, 16.7],
    "seychelles": [46.2, 55.6, -9.8, -4.2],
    "sierra leone": [-13.4, -10.3, 6.9, 10.0],
    "somalia": [40.9, 51.5, -1.7, 12.1],
    "south africa": [16.5, 32.9, -34.9, -22.1],
    "south sudan": [24.1, 35.9, 3.5, 12.3],
    "sudan": [21.8, 38.7, 8.6, 22.3],
    "tanzania": [29.3, 40.5, -11.8, -0.9],
    "togo": [-0.2, 1.8, 6.1, 11.2],
    "tunisia": [7.5, 11.6, 30.2, 37.6],
    "uganda": [29.5, 35.0, -1.5, 4.3],
    "western sahara": [-17.2, -8.7, 20.7, 27.7],
    "zambia": [21.9, 33.7, -18.1, -8.2],
    "zimbabwe": [25.2, 33.1, -22.5, -15.6],
    # -- Americas ------------------------------------------------------------
    "antigua and barbuda": [-62.4, -61.7, 16.9, 17.8],
    "argentina": [-73.6, -53.6, -55.1, -21.8],
    "bahamas": [-79.1, -72.7, 20.9, 27.1],
    "barbados": [-59.7, -59.4, 13.0, 13.4],
    "belize": [-89.3, -87.7, 15.9, 18.5],
    "bolivia": [-69.7, -57.4, -22.9, -9.7],
    "brazil": [-73.9, -34.8, -33.8, 5.3],
    "canada": [-141.0, -52.6, 41.7, 83.1],
    "chile": [-109.5, -66.4, -55.9, -17.5],
    "colombia": [-81.8, -66.9, -4.3, 13.4],
    "costa rica": [-87.1, -82.5, 8.0, 11.2],
    "cuba": [-85.0, -74.1, 19.8, 23.3],
    "dominica": [-61.5, -61.2, 15.2, 15.7],
    "dominican republic": [-72.1, -68.3, 17.5, 19.9],
    "ecuador": [-92.1, -75.2, -5.0, 1.7],
    "el salvador": [-90.2, -87.7, 13.1, 14.5],
    "french guiana": [-54.6, -51.6, 2.1, 5.8],
    "greenland": [-73.3, -12.1, 59.7, 83.7],
    "grenada": [-61.8, -61.4, 11.9, 12.6],
    "guatemala": [-92.3, -88.2, 13.7, 17.8],
    "guyana": [-61.4, -56.5, 1.2, 8.6],
    "haiti": [-74.5, -71.6, 18.0, 20.1],
    "honduras": [-89.4, -83.1, 12.9, 16.5],
    "jamaica": [-78.4, -76.2, 17.7, 18.6],
    "mexico": [-118.4, -86.7, 14.5, 32.7],
    "nicaragua": [-87.7, -82.6, 10.7, 15.0],
    "panama": [-83.1, -77.2, 7.2, 9.7],
    "paraguay": [-62.7, -54.3, -27.6, -19.3],
    "peru": [-81.4, -68.7, -18.4, 0.0],
    "puerto rico": [-67.3, -65.2, 17.9, 18.5],
    "saint kitts and nevis": [-62.9, -62.5, 17.1, 17.4],
    "saint lucia": [-61.1, -60.9, 13.7, 14.1],
    "saint vincent and the grenadines": [-61.5, -61.1, 12.5, 13.4],
    "suriname": [-58.1, -54.0, 1.8, 6.0],
    "trinidad and tobago": [-61.9, -60.5, 10.0, 11.4],
    "united states": [-171.8, -66.9, 18.9, 71.4],
    "uruguay": [-58.4, -53.1, -35.0, -30.1],
    "venezuela": [-73.4, -59.8, 0.6, 12.2],
    # -- Asia ----------------------------------------------------------------
    "afghanistan": [60.5, 74.9, 29.3, 38.5],
    "armenia": [43.4, 46.6, 38.8, 41.3],
    "azerbaijan": [44.8, 50.4, 38.4, 41.9],
    "bahrain": [50.3, 50.7, 25.8, 26.3],
    "bangladesh": [88.0, 92.7, 20.6, 26.6],
    "bhutan": [88.7, 92.1, 26.7, 28.3],
    "brunei": [114.1, 115.4, 4.0, 5.1],
    "cambodia": [102.3, 107.6, 10.4, 14.7],
    "china": [73.5, 134.8, 18.2, 53.6],
    "cyprus": [32.3, 34.6, 34.6, 35.7],
    "georgia": [40.0, 46.7, 41.1, 43.6],
    "hong kong": [113.8, 114.4, 22.1, 22.6],
    "india": [68.1, 97.4, 6.7, 35.5],
    "indonesia": [95.0, 141.0, -11.0, 6.1],
    "iran": [44.0, 63.3, 25.1, 39.8],
    "iraq": [38.8, 48.6, 29.1, 37.4],
    "israel": [34.3, 35.9, 29.5, 33.3],
    "japan": [122.9, 145.8, 24.2, 45.5],
    "jordan": [34.9, 39.3, 29.2, 33.4],
    "kazakhstan": [46.5, 87.3, 40.6, 55.4],
    "kuwait": [46.6, 48.4, 28.5, 30.1],
    "kyrgyzstan": [69.3, 80.3, 39.2, 43.3],
    "laos": [100.1, 107.6, 13.9, 22.5],
    "lebanon": [35.1, 36.6, 33.1, 34.7],
    "macau": [113.5, 113.6, 22.1, 22.2],
    "malaysia": [99.6, 119.3, 0.9, 7.4],
    "maldives": [72.7, 73.8, -0.7, 7.1],
    "mongolia": [87.7, 119.9, 41.6, 52.2],
    "myanmar": [92.2, 101.2, 9.8, 28.5],
    "nepal": [80.1, 88.2, 26.4, 30.4],
    "north korea": [124.3, 130.7, 37.7, 43.0],
    "oman": [52.0, 59.8, 16.6, 26.4],
    "pakistan": [60.9, 77.8, 23.7, 37.1],
    "palestine": [34.2, 35.6, 31.2, 32.6],
    "philippines": [116.9, 126.6, 4.6, 21.1],
    "qatar": [50.8, 51.6, 24.5, 26.2],
    "russia": [19.6, 180.0, 41.2, 81.9],
    "saudi arabia": [34.5, 55.7, 16.4, 32.2],
    "singapore": [103.6, 104.0, 1.2, 1.5],
    "south korea": [125.1, 129.6, 33.1, 38.6],
    "sri lanka": [79.7, 81.9, 5.9, 9.8],
    "syria": [35.7, 42.4, 32.3, 37.3],
    "taiwan": [120.0, 122.0, 21.9, 25.3],
    "tajikistan": [67.3, 75.2, 36.7, 41.0],
    "thailand": [97.3, 105.6, 5.6, 20.5],
    "timor-leste": [124.0, 127.3, -9.5, -8.1],
    "turkey": [25.7, 44.8, 35.8, 42.1],
    "turkmenistan": [52.4, 66.7, 35.1, 42.8],
    "united arab emirates": [51.6, 56.4, 22.6, 26.1],
    "uzbekistan": [56.0, 73.1, 37.2, 45.6],
    "vietnam": [102.1, 109.5, 8.6, 23.4],
    "yemen": [42.5, 54.5, 12.1, 19.0],
    # -- Europe --------------------------------------------------------------
    "albania": [19.3, 21.1, 39.6, 42.7],
    "andorra": [1.4, 1.8, 42.4, 42.7],
    "austria": [9.5, 17.2, 46.4, 49.0],
    "belarus": [23.2, 32.8, 51.3, 56.2],
    "belgium": [2.5, 6.4, 49.5, 51.5],
    "bosnia and herzegovina": [15.7, 19.6, 42.6, 45.3],
    "bulgaria": [22.4, 28.6, 41.2, 44.2],
    "croatia": [13.5, 19.4, 42.4, 46.6],
    "czechia": [12.1, 18.9, 48.6, 51.1],
    "denmark": [8.1, 15.2, 54.6, 57.8],
    "estonia": [21.8, 28.2, 57.5, 59.7],
    "finland": [20.6, 31.6, 59.8, 70.1],
    "france": [-5.1, 9.6, 41.3, 51.1],
    "germany": [5.9, 15.0, 47.3, 55.1],
    "greece": [19.4, 29.6, 34.8, 41.7],
    "hungary": [16.1, 22.9, 45.7, 48.6],
    "iceland": [-24.5, -13.5, 63.4, 66.6],
    "ireland": [-10.5, -6.0, 51.4, 55.4],
    "italy": [6.6, 18.5, 36.6, 47.1],
    "kosovo": [20.0, 21.8, 41.9, 43.3],
    "latvia": [21.0, 28.2, 55.7, 58.1],
    "liechtenstein": [9.5, 9.6, 47.0, 47.3],
    "lithuania": [21.0, 26.8, 53.9, 56.5],
    "luxembourg": [5.7, 6.5, 49.4, 50.2],
    "malta": [14.2, 14.6, 35.8, 36.1],
    "moldova": [26.6, 30.2, 45.5, 48.5],
    "monaco": [7.3, 7.5, 43.7, 43.8],
    "montenegro": [18.4, 20.4, 41.8, 43.6],
    "netherlands": [3.3, 7.2, 50.8, 53.6],
    "north macedonia": [20.5, 23.0, 40.9, 42.4],
    "norway": [4.6, 31.1, 58.0, 71.2],
    "poland": [14.1, 24.2, 49.0, 54.8],
    "portugal": [-31.3, -6.2, 32.6, 42.2],
    "romania": [20.3, 29.7, 43.6, 48.3],
    "san marino": [12.4, 12.5, 43.9, 44.0],
    "serbia": [18.8, 23.0, 42.2, 46.2],
    "slovakia": [16.8, 22.6, 47.7, 49.6],
    "slovenia": [13.4, 16.6, 45.4, 46.9],
    "spain": [-9.3, 4.3, 36.0, 43.8],
    "sweden": [11.1, 24.2, 55.3, 69.1],
    "switzerland": [6.0, 10.5, 45.8, 47.8],
    "ukraine": [22.1, 40.2, 44.4, 52.4],
    "united kingdom": [-8.6, 1.8, 49.9, 60.9],
    "vatican city": [12.4, 12.5, 41.9, 42.0],
    # -- Oceania -------------------------------------------------------------
    "australia": [112.9, 153.6, -43.6, -10.7],
    "fiji": [-180.0, 180.0, -21.7, -12.5],
    "french polynesia": [-154.7, -134.9, -27.7, -7.9],
    "kiribati": [-180.0, 180.0, -11.4, 4.7],
    "marshall islands": [160.8, 172.0, 4.6, 14.6],
    "micronesia": [138.0, 163.1, 1.0, 10.1],
    "nauru": [166.8, 167.0, -0.6, -0.5],
    "new caledonia": [163.6, 168.1, -22.7, -19.5],
    "new zealand": [166.4, 178.6, -47.3, -34.4],
    "palau": [131.1, 134.7, 3.0, 8.1],
    "papua new guinea": [140.8, 155.0, -11.7, -1.3],
    "samoa": [-172.8, -171.4, -14.1, -13.4],
    "solomon islands": [155.5, 166.9, -11.8, -6.6],
    "tonga": [-175.4, -173.9, -21.5, -15.6],
    "tuvalu": [176.1, 179.9, -9.4, -5.6],
    "vanuatu": [166.5, 170.2, -20.3, -13.1],
}

# Common alternative names -> canonical table key.
COUNTRY_ALIASES: dict[str, str] = {
    "bolivia (plurinational state of)": "bolivia",
    "burma": "myanmar",
    "cape verde": "cabo verde",
    "congo": "republic of the congo",
    "congo-brazzaville": "republic of the congo",
    "congo-kinshasa": "democratic republic of the congo",
    "czech republic": "czechia",
    "côte d'ivoire": "cote d'ivoire",
    "dr congo": "democratic republic of the congo",
    "drc": "democratic republic of the congo",
    "east timor": "timor-leste",
    "great britain": "united kingdom",
    "holland": "netherlands",
    "iran (islamic republic of)": "iran",
    "ivory coast": "cote d'ivoire",
    "lao people's democratic republic": "laos",
    "macedonia": "north macedonia",
    "republic of korea": "south korea",
    "russian federation": "russia",
    "swaziland": "eswatini",
    "syrian arab republic": "syria",
    "the gambia": "gambia",
    "türkiye": "turkey",
    "uae": "united arab emirates",
    "uk": "united kingdom",
    "united states of america": "united states",
    "us": "united states",
    "usa": "united states",
    "venezuela (bolivarian republic of)": "venezuela",
    "viet nam": "vietnam",
}


def _fold_name(name: str) -> str:
    """Case/diacritic/punctuation fold for tolerant place-name lookup.

    NFKD-decompose and strip combining marks ("Türkiye" == "turkiye"),
    normalize curly apostrophes, collapse runs of whitespace.
    """
    import unicodedata

    s = unicodedata.normalize("NFKD", name.strip().lower())
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = s.replace("’", "'").replace("ʼ", "'")
    return " ".join(s.split())


# Fold-keyed lookup: canonical names + aliases, all diacritic/case folded.
_COUNTRY_LOOKUP: dict[str, str] = {}
for _k in COUNTRY_EXTENTS:
    _COUNTRY_LOOKUP[_fold_name(_k)] = _k
for _a, _c in COUNTRY_ALIASES.items():
    _COUNTRY_LOOKUP.setdefault(_fold_name(_a), _c)


def _suggest(key: str, candidates) -> str:
    import difflib

    close = difflib.get_close_matches(key, list(candidates), n=3, cutoff=0.6)
    return f"; did you mean {', '.join(repr(c) for c in close)}?" if close else ""


def get_continent_extent(name: str) -> list[float]:
    """Continent name -> [xmin, xmax, ymin, ymax] (reference: readers.py:257-266)."""
    key = _fold_name(name)
    if key not in CONTINENT_EXTENTS:
        raise ValueError(
            f"unknown continent {name!r}; available: {sorted(CONTINENT_EXTENTS)}"
            + _suggest(key, CONTINENT_EXTENTS)
        )
    return list(CONTINENT_EXTENTS[key])


def get_country_extent(name: str) -> list[float]:
    """Country name -> [xmin, xmax, ymin, ymax] (reference: readers.py:247-256).

    Lookup is case-, diacritic- and apostrophe-insensitive and accepts the
    common alternate names in :data:`COUNTRY_ALIASES`; unknown names raise
    with close-match suggestions.
    """
    key = _COUNTRY_LOOKUP.get(_fold_name(name))
    if key is None:
        raise ValueError(
            f"unknown country {name!r} (table has {len(COUNTRY_EXTENTS)} entries)"
            + _suggest(_fold_name(name), _COUNTRY_LOOKUP)
        )
    return list(COUNTRY_EXTENTS[key])
