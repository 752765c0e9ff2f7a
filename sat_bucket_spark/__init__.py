"""sat-bucket-spark: a PySpark-native spatio-temporal bucketing & query engine.

A from-scratch re-expression of the capabilities of the ghiggi/sat-bucket
reference (spatio-temporal re-archiving of satellite swath data into a
geographically partitioned Parquet archive + point/region/time queries) on the
Spark DataFrame/SQL stack: binning compiles to Column expressions inside
whole-stage codegen, partition pruning / predicate pushdown / compaction
parallelism come from Catalyst, and the public API mirrors the reference's
four entry points (reference: satbucket/__init__.py:31-43).

Beyond reference parity, :mod:`sat_bucket_spark.operators` adds the
large-scale training-data-pipeline toolkit: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), embedding similarity search, text analysis, and
multimodal column plumbing.
"""

from sat_bucket_spark.analysis import (
    add_overpass_count,
    add_overpass_id,
    add_overpass_id_scalable,
    add_swath_indices,
    get_list_overpass_time,
    overpass_to_grid,
    split_by_overpass,
)
from sat_bucket_spark.filters import (
    apply_spatial_filters,
    filter_around_point,
    filter_by_extent,
    filter_by_polygon,
)
from sat_bucket_spark.gridding import to_grid_arrays, to_pandas_grid, to_xarray
from sat_bucket_spark.io import (
    get_bucket_spatial_partitioning,
    get_bucket_temporal_partitioning,
    read_bucket_info,
    write_bucket_info,
)
from sat_bucket_spark.joins import asof_join, interval_join_binned
from sat_bucket_spark.partitioning import (
    LonLatPartitioning,
    TilePartitioning,
    XYPartitioning,
)
from sat_bucket_spark.readers import read, read_bucket_dataframe
from sat_bucket_spark.routines import (
    merge_granule_buckets,
    write_bucket,
    write_granules_bucket,
)
from sat_bucket_spark.maintenance import bucket_file_stats, compact_bucket
from sat_bucket_spark.rollup import read_rollup, update_rollup
from sat_bucket_spark.session import get_spark
from sat_bucket_spark.sources import read_corpus
from sat_bucket_spark.warc import read_warc, read_wet

__version__ = "0.1.0"

__all__ = [
    "bucket_file_stats",
    "compact_bucket",
    "LonLatPartitioning",
    "TilePartitioning",
    "XYPartitioning",
    "add_overpass_count",
    "add_overpass_id",
    "add_overpass_id_scalable",
    "add_swath_indices",
    "apply_spatial_filters",
    "asof_join",
    "filter_around_point",
    "filter_by_extent",
    "filter_by_polygon",
    "get_bucket_spatial_partitioning",
    "get_bucket_temporal_partitioning",
    "get_list_overpass_time",
    "get_spark",
    "interval_join_binned",
    "merge_granule_buckets",
    "overpass_to_grid",
    "read",
    "read_bucket_dataframe",
    "read_bucket_info",
    "read_corpus",
    "read_rollup",
    "read_warc",
    "read_wet",
    "update_rollup",
    "split_by_overpass",
    "to_grid_arrays",
    "to_pandas_grid",
    "to_xarray",
    "write_bucket",
    "write_bucket_info",
    "write_granules_bucket",
]
