"""Bucket metadata: the self-describing ``bucket_info.yaml`` header.

Reference: satbucket/io.py:35-73 — the bucket root holds a YAML spec with the
partitioning class/parameters (+ optional ``temporal_partitioning``); readers
reconstruct the partitioning object from it (io.py:42-49).
"""

from __future__ import annotations

import os

import yaml

from sat_bucket_spark.partitioning import partitioning_from_dict

__all__ = [
    "read_bucket_info",
    "get_bucket_spatial_partitioning",
    "get_bucket_temporal_partitioning",
    "write_bucket_info",
]

BUCKET_INFO_FILENAME = "bucket_info.yaml"


def bucket_info_path(bucket_dir: str) -> str:
    """Path of the bucket metadata file."""
    return os.path.join(bucket_dir, BUCKET_INFO_FILENAME)


def write_bucket_info(bucket_dir: str, partitioning, temporal_partitioning: str | None = None):
    """Write ``bucket_info.yaml`` at the bucket root (reference: io.py:58-73).

    The spec is the partitioning's ``to_dict()`` plus an optional
    ``temporal_partitioning`` key (reference: io.py:64).
    """
    os.makedirs(bucket_dir, exist_ok=True)
    info = {"spatial_partitioning": partitioning.to_dict()}
    if temporal_partitioning is not None:
        info["temporal_partitioning"] = temporal_partitioning
    with open(bucket_info_path(bucket_dir), "w") as f:
        yaml.safe_dump(info, f, sort_keys=False)


def read_bucket_info(bucket_dir: str) -> dict:
    """Read the raw bucket metadata dict (reference: io.py:35-41)."""
    path = bucket_info_path(bucket_dir)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no {BUCKET_INFO_FILENAME} found in {bucket_dir}")
    with open(path) as f:
        return yaml.safe_load(f)


def get_bucket_spatial_partitioning(bucket_dir: str):
    """Reconstruct the partitioning object from bucket metadata (reference: io.py:42-49)."""
    info = read_bucket_info(bucket_dir)
    return partitioning_from_dict(info["spatial_partitioning"])


def get_bucket_temporal_partitioning(bucket_dir: str) -> str | None:
    """Temporal partitioning granularity, if recorded (reference: io.py:50-55)."""
    return read_bucket_info(bucket_dir).get("temporal_partitioning")


def get_partition_filepaths(
    bucket_dir: str,
    extent=None,
    extension: str = ".parquet",
) -> list[str]:
    """List data files, optionally only partitions intersecting an extent.

    Driver-side helper mirroring reference io.py:96-126 + readers.py:269-279.
    The Spark query path never needs this (Catalyst prunes from predicates) —
    it exists for inspection/maintenance tooling.
    """
    partitioning = get_bucket_spatial_partitioning(bucket_dir)
    if extent is not None:
        dirs = [os.path.join(bucket_dir, d) for d in partitioning.directories_by_extent(extent)]
    else:
        dirs = [os.path.join(bucket_dir, d) for d in partitioning.directories]
    out: list[str] = []
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for root, _, files in os.walk(d):
            out.extend(
                os.path.join(root, f) for f in files if f.endswith(extension)
            )
    return sorted(out)
