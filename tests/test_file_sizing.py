"""File and row-group sizing tests (reference: test_writers.py:100-245 semantics).

Verifies the parquet-encoded calibration of estimate_row_size: byte-size
targets must land within ~2x of actual encoded output, not be inflated by
the pandas in-memory footprint (3-10x off for strings).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.writers import (
    estimate_row_size,
    parse_size,
    write_partitioned_dataset,
)


@pytest.fixture(scope="module")
def wide_df(spark):
    # ~60k rows of mixed numeric + string; strings make in-memory pandas
    # bytes/row far exceed parquet-encoded bytes/row.
    return (
        spark.range(60_000)
        .withColumn("value", (F.col("id") * 7919 % 104729).cast("double"))
        .withColumn("tag", F.concat(F.lit("sensor_"), (F.col("id") % 50).cast("string")))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    )


def _parquet_files(d):
    return glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)


class TestEstimateRowSize:
    def test_matches_encoded_bytes_within_2x(self, wide_df, tmp_path):
        est = estimate_row_size(wide_df)
        out = str(tmp_path / "ref")
        wide_df.coalesce(1).write.parquet(out)
        f = _parquet_files(out)[0]
        actual = os.path.getsize(f) / 60_000
        assert actual / 2 <= est <= actual * 2, (est, actual)

    def test_empty_df_default(self, spark):
        df = spark.range(0).withColumn("v", F.lit("x"))
        assert estimate_row_size(df) == 100.0


class TestMaxFileSizeTarget:
    def test_files_near_target(self, wide_df, tmp_path):
        out = str(tmp_path / "sized")
        write_partitioned_dataset(wide_df, out, max_file_size="256KB")
        sizes = [os.path.getsize(f) for f in _parquet_files(out)]
        assert sizes
        target = parse_size("256KB")
        # every non-tail file should be within [target/4, target*2]: the
        # uncalibrated in-memory estimate put files at ~target/5 or smaller.
        big = [s for s in sizes if s > 20_000]
        assert big, sizes
        for s in big:
            assert target / 4 <= s <= target * 2, (s, target, sorted(sizes))


class TestRowGroupSize:
    def test_block_size_passthrough(self, wide_df, tmp_path):
        small = str(tmp_path / "small_rg")
        big = str(tmp_path / "big_rg")
        one = wide_df.coalesce(1)
        write_partitioned_dataset(one, small, row_group_size="64KB")
        write_partitioned_dataset(one, big, row_group_size="64MB")
        n_small = sum(pq.ParquetFile(f).num_row_groups for f in _parquet_files(small))
        n_big = sum(pq.ParquetFile(f).num_row_groups for f in _parquet_files(big))
        assert n_small > n_big, (n_small, n_big)
        assert n_big <= len(_parquet_files(big))


class TestParquetBloomFilters:
    def test_bloom_option_writes_filters_and_preserves_data(self, spark, tmp_path):
        """Bloom-enabled files carry the filter bytes (strictly larger) and
        read back identically; equality lookups stay correct."""
        import glob
        import os

        from sat_bucket_spark.writers import write_partitioned_dataset

        df = spark.range(5000).selectExpr(
            "id", "CAST(id * 2654435761 % 1000003 AS LONG) AS granule_id"
        ).coalesce(2)
        plain, bloom = str(tmp_path / "plain"), str(tmp_path / "bloom")
        write_partitioned_dataset(df, plain, repartition_by_levels=False)
        write_partitioned_dataset(
            df,
            bloom,
            repartition_by_levels=False,
            bloom_filter_columns=["granule_id"],
            bloom_filter_ndv=2500,
        )
        size = lambda d: sum(
            os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
        )
        assert size(bloom) > size(plain)  # the filter bytes are in the footers
        a = sorted(tuple(r) for r in spark.read.parquet(plain).collect())
        b = sorted(tuple(r) for r in spark.read.parquet(bloom).collect())
        assert a == b
        probe = spark.read.parquet(bloom).where("granule_id = 2654435761 % 1000003")
        assert probe.count() == 1
