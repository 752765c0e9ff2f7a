"""Scalar/column function helpers (temporal labels, geodesic, filename parsing)."""

from sat_bucket_spark.functions.temporal import (
    get_partitioning_boundaries,
    get_time_prefix,
    time_prefix_expr,
)

__all__ = ["get_partitioning_boundaries", "get_time_prefix", "time_prefix_expr"]
