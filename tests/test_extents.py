"""Country/continent extent table tests (reference: test_readers.py:211-227 analogues)."""

from __future__ import annotations

import pytest

from sat_bucket_spark.extents import (
    CONTINENT_EXTENTS,
    COUNTRY_ALIASES,
    COUNTRY_EXTENTS,
    get_continent_extent,
    get_country_extent,
)


class TestTableShape:
    def test_coverage(self):
        # full public table, not a demo subset
        assert len(COUNTRY_EXTENTS) >= 190

    def test_all_extents_valid(self):
        for name, (x0, x1, y0, y1) in {**COUNTRY_EXTENTS, **CONTINENT_EXTENTS}.items():
            assert -180.0 <= x0 <= x1 <= 180.0, name
            assert -90.0 <= y0 <= y1 <= 90.0, name

    def test_aliases_resolve(self):
        for alias, target in COUNTRY_ALIASES.items():
            assert target in COUNTRY_EXTENTS, alias
            assert get_country_extent(alias) == COUNTRY_EXTENTS[target]


class TestLookup:
    @pytest.mark.parametrize(
        "name", ["Kenya", "Nigeria", "Vanuatu", "san marino", " ICELAND ", "Usa", "Burma"]
    )
    def test_arbitrary_countries_resolve(self, name):
        x0, x1, y0, y1 = get_country_extent(name)
        assert x0 < x1 and y0 < y1

    def test_spot_values(self):
        ke = get_country_extent("Kenya")
        # Nairobi (36.8, -1.3) inside
        assert ke[0] <= 36.8 <= ke[1] and ke[2] <= -1.3 <= ke[3]
        nz = get_country_extent("New Zealand")
        # Wellington (174.8, -41.3) inside
        assert nz[0] <= 174.8 <= nz[1] and nz[2] <= -41.3 <= nz[3]

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown country"):
            get_country_extent("Atlantis")
        with pytest.raises(ValueError, match="unknown continent"):
            get_continent_extent("Lemuria")


class TestPadding:
    def test_scalar_padding(self):
        from sat_bucket_spark.extents import extend_extent

        assert extend_extent([0, 10, 0, 10], 2) == [-2.0, 12.0, -2.0, 12.0]

    def test_xy_padding(self):
        from sat_bucket_spark.extents import extend_extent

        assert extend_extent([0, 10, 0, 10], (1, 2)) == [-1.0, 11.0, -2.0, 12.0]

    def test_four_sided_padding_and_clamp(self):
        from sat_bucket_spark.extents import extend_extent

        assert extend_extent([0, 10, 0, 10], (1, 2, 3, 4)) == [-1.0, 12.0, -3.0, 14.0]
        assert extend_extent([-179, 179, -89, 89], 5) == [-180.0, 180.0, -90.0, 90.0]

    def test_invalid_padding_raises(self):
        from sat_bucket_spark.extents import extend_extent

        with pytest.raises(ValueError, match="padding"):
            extend_extent([0, 10, 0, 10], (1, 2, 3))

    def test_read_country_padding_widens_result(self, spark, orbit_df, tmp_path_factory):
        from sat_bucket_spark import LonLatPartitioning, read, write_bucket

        d = str(tmp_path_factory.mktemp("padbucket"))
        write_bucket(orbit_df, d, LonLatPartitioning(size=(10, 10)), x="lon", y="lat")
        base = read(spark, d, country="Ghana").count()
        padded = read(spark, d, country="Ghana", padding=30).count()
        assert padded > base


class TestBucketCountryQuery:
    """Country queries on a synthetic bucket match brute-force bbox counts
    (reference: test_readers.py:211-227)."""

    @pytest.mark.parametrize("name", ["Nigeria", "Ghana", "Kenya", "Brazil"])
    def test_country_counts(self, spark, orbit_df, tmp_path_factory, name):
        from pyspark.sql import functions as F

        from sat_bucket_spark import LonLatPartitioning, read, write_bucket

        d = str(tmp_path_factory.mktemp("cbucket"))
        write_bucket(orbit_df, d, LonLatPartitioning(size=(10, 10)), x="lon", y="lat")
        x0, x1, y0, y1 = get_country_extent(name)
        want = orbit_df.where(
            (F.col("lon") >= x0) & (F.col("lon") <= x1)
            & (F.col("lat") >= y0) & (F.col("lat") <= y1)
        ).count()
        assert read(spark, d, country=name).count() == want


class TestNameTolerance:
    def test_aliases(self):
        from sat_bucket_spark.extents import get_country_extent

        assert get_country_extent("USA") == get_country_extent("United States")
        assert get_country_extent("UK") == get_country_extent("United Kingdom")
        assert get_country_extent("Burma") == get_country_extent("Myanmar")

    def test_diacritic_and_apostrophe_folds(self):
        from sat_bucket_spark.extents import get_country_extent

        assert get_country_extent("Türkiye") == get_country_extent("turkey")
        # curly apostrophe and diacritics both fold
        assert get_country_extent("Côte d’Ivoire") == get_country_extent(
            "cote d'ivoire"
        )

    def test_did_you_mean(self):
        import pytest

        from sat_bucket_spark.extents import get_country_extent, get_continent_extent

        with pytest.raises(ValueError, match="did you mean.*germany"):
            get_country_extent("Germny")
        with pytest.raises(ValueError, match="did you mean.*europe"):
            get_continent_extent("Eurpe")

    def test_hopeless_name_raises_plain(self):
        import pytest

        from sat_bucket_spark.extents import get_country_extent

        with pytest.raises(ValueError, match="unknown country"):
            get_country_extent("zzzzqqqq")
