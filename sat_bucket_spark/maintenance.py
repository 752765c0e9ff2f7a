"""Archive maintenance: file statistics and selective small-file compaction.

A 100 TB bucket maintained by incremental ingest fragments over time: hot
spatial/temporal partitions accumulate one file per ingest batch, and small
files tax every later scan (per-file open cost, undersized row groups, poor
codec ratios). The reference compacts by re-merging everything
(/root/reference/satbucket/routines.py:530-852); at archive scale a full
rewrite is a multi-hour job, so the operational primitive is: measure
fragmentation cheaply, rewrite ONLY the partitions that need it.

- :func:`bucket_file_stats` reads Spark's hidden ``_metadata`` struct —
  file path and size come from the driver's file index, so the scan
  materializes no data pages (row counts ride the same pass as a
  count-only aggregate).
- :func:`compact_bucket` selects fragmented partitions from those stats on
  the driver (O(#partitions) metadata), reads back only those partitions
  (Catalyst prunes the rest), and rewrites them in ONE shuffled write with
  dynamic partition overwrite — untouched partitions' files are never
  opened, and a failed job leaves them intact.
"""

from __future__ import annotations

import functools
import operator
import warnings

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sat_bucket_spark.io import (
    get_bucket_spatial_partitioning,
    get_bucket_temporal_partitioning,
)
from sat_bucket_spark.writers import parse_size, write_partitioned_dataset

__all__ = ["bucket_file_stats", "compact_bucket", "flatten_time_partitions"]


def _read_hive(spark: SparkSession, bucket_dir: str) -> DataFrame:
    # pathGlobFilter skips bucket_info.yaml (same as readers.read_bucket_dataframe)
    return spark.read.option("pathGlobFilter", "*.parquet").parquet(bucket_dir)


def _bucket_partition_cols(spark: SparkSession, bucket_dir: str) -> list[str]:
    df = _read_hive(spark, bucket_dir)
    cols = []
    try:
        p = get_bucket_spatial_partitioning(bucket_dir)
        cols = [c for c in list(p.order) if c in df.columns]
    except FileNotFoundError:
        pass  # not a managed bucket (no bucket_info.yaml) — directory-column grouping only
    except (KeyError, TypeError, ValueError, yaml.YAMLError) as exc:
        # bucket_info.yaml exists but is corrupt/unparseable: surface it once
        # rather than silently degrading the stats grouping.
        warnings.warn(
            f"bucket_info.yaml in {bucket_dir} could not be parsed "
            f"({type(exc).__name__}: {exc}); grouping file stats by "
            "time_part only",
            stacklevel=3,
        )
    if "time_part" in df.columns and "time_part" not in cols:
        cols.append("time_part")
    return cols


def bucket_file_stats(
    spark: SparkSession,
    bucket_dir: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Per-partition file statistics for a hive-layout bucket.

    Returns one row per partition: ``(partition cols..., n_files,
    total_bytes, min_file_bytes, max_file_bytes, n_rows)``. File path and
    size come from the ``_metadata`` hidden column (served by the file
    index, not the data pages); only partition columns — also
    metadata-derived — are selected besides it, so the underlying parquet
    column scan is empty.
    """
    if partition_cols is None:
        partition_cols = _bucket_partition_cols(spark, bucket_dir)
    df = _read_hive(spark, bucket_dir)
    per_file = (
        df.select(
            *[F.col(c) for c in partition_cols],
            F.col("_metadata.file_path").alias("__f"),
            F.col("_metadata.file_size").alias("__sz"),
        )
        .groupBy(*partition_cols, "__f", "__sz")
        .agg(F.count(F.lit(1)).alias("__rows"))
    )
    return per_file.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("__sz").alias("total_bytes"),
        F.min("__sz").alias("min_file_bytes"),
        F.max("__sz").alias("max_file_bytes"),
        F.sum("__rows").alias("n_rows"),
    )


def compact_bucket(
    spark: SparkSession,
    bucket_dir: str,
    target_file_size: str | int = "128MB",
    min_files: int = 2,
    partition_cols: list[str] | None = None,
    **writer_kwargs,
) -> int:
    """Rewrite partitions whose files average below ``target_file_size``.

    A partition qualifies when it holds at least ``min_files`` files AND its
    mean file size is under the target — i.e. the same bytes could live in
    fewer files. Qualifying partitions are read back through a pruning
    predicate (OR of per-partition conjunctions over partition columns —
    Catalyst resolves it against the file index, so non-qualifying
    partitions are never opened) and rewritten via dynamic partition
    overwrite; the write inherits the engine's sizing controls
    (``max_file_size`` defaults to the compaction target).

    Returns the number of partitions compacted. Driver state is one row per
    qualifying partition — O(#partitions) metadata, the same order as the
    file index Spark already holds.
    """
    if partition_cols is None:
        partition_cols = _bucket_partition_cols(spark, bucket_dir)
    if not partition_cols:
        raise ValueError("compact_bucket requires at least one partition column")
    target = parse_size(target_file_size)
    victims = (
        bucket_file_stats(spark, bucket_dir, partition_cols)
        .where(
            (F.col("n_files") >= F.lit(min_files))
            & (F.col("total_bytes") / F.col("n_files") < F.lit(float(target)))
        )
        .select(*partition_cols)
        .collect()
    )
    if not victims:
        return 0
    pred = functools.reduce(
        operator.or_,
        (
            functools.reduce(
                operator.and_,
                (F.col(c) == F.lit(row[c]) for c in partition_cols),
            )
            for row in victims
        ),
    )
    df = _read_hive(spark, bucket_dir).where(pred)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer_kwargs.setdefault("max_file_size", target)
        write_partitioned_dataset(
            df,
            bucket_dir,
            partitions=partition_cols,
            mode="overwrite",
            **writer_kwargs,
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return len(victims)


def flatten_time_partitions(bucket_dir: str, time_level: str = "time_part") -> int:
    """Flatten ``time_part=X`` hive subdirectories into reference-layout files.

    The reference archive encodes the temporal group in the FILENAME —
    ``lon_bin=-5.0/lat_bin=5.0/2021_0.parquet`` (reference routines.py:530-852;
    naming golden at tests/test_routines.py:313-315) — where our merge uses a
    ``time_part`` partition directory (better for Catalyst pruning). This
    utility converts a merged bucket to the reference's physical layout for
    migration/interop: every ``time_part=X`` subdirectory's part files move up
    into the spatial partition directory as ``{X}_{i}.parquet`` (``i`` ranks
    the files by their original sorted names, so the rename is deterministic),
    and the emptied subdirectories are removed.

    Trade documented: the flattened bucket loses ``time_part`` DIRECTORY
    pruning; time filtering then relies on filename filters (``read``'s
    ``glob_pattern``/``regex_pattern``, the P11 filename time machinery) and
    parquet row-group time stats — exactly the reference's own read posture.
    Returns the number of files moved. Driver-side metadata operation
    (os.rename within a directory tree — no data rewrite).
    """
    import os

    prefix = time_level + "="
    # validate EVERYTHING before renaming ANYTHING: a stray file in one
    # time_part dir must not leave the bucket half-flattened, and a
    # destination `{label}_{i}.parquet` already sitting in the spatial dir
    # (rerun after an incremental merge, or a mixed-layout bucket) must not
    # be silently overwritten by os.rename
    offenders = []
    collisions = []
    for root, dirs, _files in os.walk(bucket_dir):
        for td in (d for d in dirs if d.startswith(prefix)):
            tdir = os.path.join(root, td)
            parts = []
            for f in os.listdir(tdir):
                if not (
                    f.endswith(".parquet") or f.startswith(("_", "."))
                ) or os.path.isdir(os.path.join(tdir, f)):
                    offenders.append(os.path.join(tdir, f))
                elif f.endswith(".parquet") and not f.startswith(("_", ".")):
                    parts.append(f)
            label = td[len(prefix):]
            for i in range(len(parts)):
                dest = os.path.join(root, f"{label}_{i}.parquet")
                if os.path.exists(dest):
                    collisions.append(dest)
    if offenders:
        raise ValueError(
            "refusing to flatten: unexpected entries inside time partitions "
            f"(first few: {offenders[:5]})"
        )
    if collisions:
        raise ValueError(
            "refusing to flatten: destination files already exist (bucket "
            "partially flattened or mixed-layout?) — remove or rename them "
            f"first (first few: {collisions[:5]})"
        )
    moved = 0
    for root, dirs, _files in os.walk(bucket_dir):
        time_dirs = sorted(d for d in dirs if d.startswith(prefix))
        for td in time_dirs:
            label = td[len(prefix):]
            tdir = os.path.join(root, td)
            parts = sorted(
                f for f in os.listdir(tdir)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
            for i, fname in enumerate(parts):
                os.rename(
                    os.path.join(tdir, fname),
                    os.path.join(root, f"{label}_{i}.parquet"),
                )
                moved += 1
            leftovers = [
                f for f in os.listdir(tdir) if f.startswith(("_", "."))
            ]
            for f in leftovers:  # _SUCCESS markers and hidden CRCs
                os.remove(os.path.join(tdir, f))
            os.rmdir(tdir)
        # don't descend into (now removed) time dirs
        dirs[:] = [d for d in dirs if not d.startswith(prefix)]
    return moved
