"""Parallelism guard shared by expression-heavy map operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism"]


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition tiny-partition-count inputs up to the cluster's parallelism.

    A single small Parquet file arrives as ONE partition — on a 32-core
    executor (or a 1000-executor cluster) every downstream shingle/hash/explode
    runs serially. The repartition is a no-op condition at real scale (many
    input splits) and a trivial 1-round shuffle when it fires.

    The check is metadata-only in the common at-scale case. ``inputFiles()``
    alone is NOT a lower bound on scan partitions — Spark bin-packs small
    files (each padded by ``openCostInBytes``) into ``maxPartitionBytes``
    chunks, so 200 tiny files can become ~7 partitions. The packing itself
    gives the sound bound: every partition holds at most
    ``maxPartitionBytes / openCostInBytes`` files, so
    ``partitions >= n_files * openCost / maxPartitionBytes``. Only when that
    bound is inconclusive do we pay the exact ``rdd.getNumPartitions()``
    plan-to-RDD conversion.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    threshold = max(target // 2, 2)
    try:
        from sat_bucket_spark.writers import parse_size

        max_bytes = parse_size(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
        open_cost = parse_size(spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
        files_per_partition = max(max_bytes // max(open_cost, 1), 1)
        if len(df.inputFiles()) >= threshold * files_per_partition:
            return df  # packing bound guarantees >= threshold partitions
    except Exception:
        pass  # non-file source: fall through to the exact check
    if df.rdd.getNumPartitions() < threshold:
        return df.repartition(target)
    return df
