"""SparkSession factory with engine-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "sat-bucket-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for the bucket engine.

    Defaults encode the scale posture: AQE on (runtime shuffle-partition
    coalescing + skew-join splitting), Arrow for pandas interchange, partition
    column type inference OFF (labels are strings — reference
    partitioning.py:899-910).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Don't let AQE coalesce below the core count: partitioned writes are
        # FILE-COUNT bound (per-directory writer setup + commit), so byte-based
        # coalescing to 1-2 tasks serializes hundreds of file creations.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # local[*] only: skip .crc sidecars on file:// (halves files touched in
        # many-directory partitioned writes, ~25% off write wall-clock); a real
        # cluster's hdfs/s3a paths never consult fs.file.impl.
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        # Partition discovery: the default threshold (32 paths) launches a
        # distributed listing JOB for any real bucket. Driver-side listing
        # handles ~1k directories in tens of ms (and avoids a full job's
        # scheduling latency); genuinely huge buckets (>1024 dirs) still get
        # the distributed listing where it actually wins.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
