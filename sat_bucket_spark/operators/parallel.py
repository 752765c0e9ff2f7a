"""Parallelism guard shared by expression-heavy map operators."""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism"]


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition tiny-partition-count file inputs up to cluster parallelism.

    A single small Parquet file arrives as ONE partition — on a 32-core
    executor (or a 1000-executor cluster) every downstream shingle/hash/explode
    runs serially. The repartition is a no-op condition at real scale (many
    input splits) and a trivial 1-round shuffle when it fires.

    The decision is metadata-only and never converts the plan to an RDD:

    1. ``inputFiles()`` count vs Spark's file bin-packing bound — every scan
       partition holds at most ``maxPartitionBytes / openCostInBytes`` files
       (each file is padded by ``openCostInBytes`` before packing), so
       ``partitions >= n_files * openCost / maxPartitionBytes``. Many files
       (the at-scale case) short-circuits here.
    2. If inconclusive, local ``file:`` paths are ``stat``-ed driver-side:
       splittable formats give ``partitions >= ceil(padded_bytes /
       maxPartitionBytes)``, so few-but-large local files are recognized as
       already parallel. (Covers local mode and tests exactly; remote
       schemes skip to 3.)
    3. Otherwise — few small files, or remote files whose size we won't pay
       a filesystem round-trip for — repartition. Worst case is one bounded
       shuffle of data that was small enough to live in a handful of files.

    Non-file sources (``inputFiles()`` empty/unsupported) are returned
    untouched: ``LocalTableScan`` already spreads rows across up to
    ``defaultParallelism`` partitions, and post-shuffle plans carry
    ``spark.sql.shuffle.partitions``.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    threshold = max(target // 2, 2)
    try:
        files = df.inputFiles()
    except Exception:
        return df  # non-file source
    if not files:
        return df
    from sat_bucket_spark.writers import parse_size

    max_bytes = parse_size(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    open_cost = parse_size(spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
    files_per_partition = max(max_bytes // max(open_cost, 1), 1)
    if len(files) >= threshold * files_per_partition:
        return df  # packing bound guarantees >= threshold partitions
    local = [urlparse(f) for f in files]
    if all(u.scheme in ("file", "") for u in local):
        try:
            padded = sum(os.path.getsize(u.path) + open_cost for u in local)
        except OSError:
            return df.repartition(target)
        est = -(-padded // max_bytes)  # ceil: lower bound on scan splits
        if est >= threshold:
            return df
    return df.repartition(target)
