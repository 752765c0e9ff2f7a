"""Structured Streaming counterparts of the batch analysis operators.

The reference is purely batch (SURVEY.md §2.9) — its gap sessionization
(analysis.py:41-110) is the natural streaming operator, so we expose it as a
first-class Structured Streaming pipeline: ``session_window`` + watermark.
This is the scale path for continuous ingest: late data is bounded by the
watermark instead of requiring a full re-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_overpass_counts", "streaming_time_partition_counts"]


def streaming_overpass_counts(
    stream: DataFrame,
    time: str = "time",
    gap: str = "2 minutes",
    watermark: str = "10 minutes",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Per-overpass row counts over a stream (gap-based session windows).

    Batch equivalent: analysis.add_overpass_count (reference analysis.py:283-288).
    ``session_window(time, gap)`` implements exactly the reference's
    "new session when gap exceeded" rule; the watermark bounds state retention
    for late data.
    """
    keys = list(partition_by) if partition_by else []
    src = stream
    drop_key = None
    if not keys:
        # Spark rejects *global* session-window aggregation; a constant
        # grouping key gives the same semantics (single global session stream).
        drop_key = "__global"
        src = stream.withColumn(drop_key, F.lit(0))
        keys = [drop_key]
    out = (
        src.withWatermark(time, watermark)
        .groupBy(*keys, F.session_window(F.col(time), gap).alias("overpass_window"))
        .agg(F.count(F.lit(1)).alias("count_overpass_occurence"))
        .select(
            *keys,
            F.col("overpass_window.start").alias("start_time"),
            F.col("overpass_window.end").alias("end_time"),
            "count_overpass_occurence",
        )
    )
    if drop_key:
        out = out.drop(drop_key)
    return out


def streaming_time_partition_counts(
    stream: DataFrame,
    partitioning,
    x: str = "lon",
    y: str = "lat",
    time: str = "time",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-spatial-partition counts — streaming bucket monitoring.

    Continuous analogue of the bucket gridding contract (labels + groupBy,
    reference partitioning.py:737-740): tumbling window x partition labels.
    """
    labeled = partitioning.add_labels(stream, x=x, y=y, remove_invalid_rows=True)
    return (
        labeled.withWatermark(time, watermark)
        .groupBy(*partitioning.levels, F.window(F.col(time), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *partitioning.levels,
            F.col("w.start").alias("window_start"),
            "n",
        )
    )
