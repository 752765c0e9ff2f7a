"""Continuous aggregates: incrementally-maintained rollups over a bucket.

The hypertable-rollup primitive: a summary table (per group: count, sums,
extrema, sum-of-squares) kept up to date as new granule files land in a
bucket — WITHOUT rescanning the data already summarized. The design is the
classic mergeable-state split:

- ``rollup_aggregate``: data -> partial state. Every statistic kept is
  ALGEBRAIC (count, sum, sumsq, min, max): partials from disjoint file sets
  merge exactly by re-aggregation, so incremental == full recompute,
  bit-for-bit (sums carried as decimal so accumulation order cannot
  matter).
- ``rollup_merge``: union of state tables -> one state table (one shuffle
  keyed by the group columns, volume bounded by #groups, never by data
  size).
- ``rollup_finalize``: state -> human stats (mean, std via E[x^2]-E[x]^2).

``update_rollup`` drives the incremental maintenance against a bucket
directory:

1. list the bucket's data files; diff against the manifest of files already
   incorporated;
2. aggregate ONLY the new files (Spark reads an explicit file list — the
   old data is never opened);
3. merge with the current state and publish a NEW VERSION directory
   containing both the merged state and its manifest, then atomically swap
   the ``_CURRENT`` pointer (``os.replace``). State and manifest live in
   the same version, so a crash anywhere leaves the previous version
   intact and fully consistent — re-running after a crash re-processes at
   most the batch that never got published, never double-counts.

At 100 TB: each maintenance run costs O(new data) scan + O(#groups)
shuffle. The state table is itself partitionable by the group columns if
#groups is large. Readers (``read_rollup``) see snapshot-isolated versions.

Reference scope: beyond sat-bucket (its summaries are recomputed batch
jobs; cites satbucket/routines.py bucket re-aggregation as the full-rescan
baseline this replaces).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "rollup_aggregate",
    "rollup_merge",
    "rollup_finalize",
    "update_rollup",
    "stream_update_rollup",
    "read_rollup",
    "current_rollup_version",
]

_CURRENT = "_CURRENT"

# Decimal precision for exact sums: 20 integral digits absorbs ~1e12 rows of
# 1e8-scale values; 10 fractional digits out-resolves float64 inputs.
_DEC = "decimal(30,10)"


def _state_cols(value_cols: list[str]) -> list[str]:
    out = ["n_rows"]
    for c in value_cols:
        out += [f"n_{c}", f"sum_{c}", f"sumsq_{c}", f"min_{c}", f"max_{c}"]
    return out


def rollup_aggregate(
    df: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """Partial rollup state per group: count + (count, sum, sumsq, min, max)
    per value column. All algebraic — states from disjoint row sets merge
    exactly via :func:`rollup_merge`. Sums/sumsqs are decimal: exact, so
    merge order and partitioning cannot perturb them.

    ``distinct_cols`` adds a ``hll_<col>`` HyperLogLog sketch (Apache
    DataSketches binary, Spark's ``hll_sketch_agg``) per listed column:
    COUNT DISTINCT becomes incrementally maintainable too — sketches are
    bounded-size register arrays whose union is a register-wise max, so
    merging batch states gives exactly the estimate a full recompute
    would (union is commutative/associative/idempotent; ~2% error).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in value_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(c).alias(f"n_{c}"),
            F.sum(v.cast(_DEC)).alias(f"sum_{c}"),
            F.sum((v * v).cast(_DEC)).alias(f"sumsq_{c}"),
            F.min(v).alias(f"min_{c}"),
            F.max(v).alias(f"max_{c}"),
        ]
    for c in distinct_cols or []:
        aggs.append(F.hll_sketch_agg(c).alias(f"hll_{c}"))
    return df.groupBy(*group_cols).agg(*aggs)


def rollup_merge(
    states: list[DataFrame],
    group_cols: list[str],
    value_cols: list[str],
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """Merge state tables by re-aggregation: sums/counts add, extrema
    combine, HLL sketches union. One exchange keyed by the group columns,
    bounded by #groups."""
    if not states:
        raise ValueError("need at least one state table")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in value_cols:
        aggs += [
            F.sum(f"n_{c}").alias(f"n_{c}"),
            F.sum(F.col(f"sum_{c}").cast(_DEC)).alias(f"sum_{c}"),
            F.sum(F.col(f"sumsq_{c}").cast(_DEC)).alias(f"sumsq_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
        ]
    for c in distinct_cols or []:
        aggs.append(F.hll_union_agg(f"hll_{c}").alias(f"hll_{c}"))
    return u.groupBy(*group_cols).agg(*aggs)


def rollup_finalize(
    state: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    distinct_cols: list[str] | None = None,
    round_decimals: int = 6,
) -> DataFrame:
    """State -> presentation stats per group: n, mean, std, min, max (and
    ``approx_distinct_<col>`` per sketched column).

    mean = sum/n from the EXACT decimal sum cast to double once; variance
    via E[x^2] - mean^2 (same pinned double arithmetic an ANSI-SQL engine
    reproduces). NULL-only groups yield NULL stats.
    """
    cols = [F.col(c) for c in group_cols] + [F.col("n_rows")]
    for c in value_cols:
        n = F.col(f"n_{c}")
        mean = F.col(f"sum_{c}").cast("double") / n
        ex2 = F.col(f"sumsq_{c}").cast("double") / n
        var = ex2 - mean * mean
        std = F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))
        cols += [
            n.alias(f"n_{c}"),
            F.round(F.when(n > 0, mean), round_decimals).alias(f"mean_{c}"),
            F.round(F.when(n > 0, std), round_decimals).alias(f"std_{c}"),
            F.col(f"min_{c}"),
            F.col(f"max_{c}"),
        ]
    for c in distinct_cols or []:
        cols.append(F.hll_sketch_estimate(f"hll_{c}").alias(f"approx_distinct_{c}"))
    return state.select(*cols)


# ---------------------------------------------------------------------------
# versioned on-disk maintenance
# ---------------------------------------------------------------------------


def _read_current(rollup_dir: str) -> str | None:
    try:
        with open(os.path.join(rollup_dir, _CURRENT)) as fh:
            name = fh.read().strip()
        return name or None
    except FileNotFoundError:
        return None


def current_rollup_version(rollup_dir: str) -> dict | None:
    """The live version's manifest (``None`` before the first update)."""
    cur = _read_current(rollup_dir)
    if cur is None:
        return None
    with open(os.path.join(rollup_dir, cur, "manifest.json")) as fh:
        return json.load(fh)


def _list_bucket_files(spark: SparkSession, bucket_dir: str) -> list[str]:
    # inputFiles() serves from the driver's file index: no data pages read.
    return sorted(
        spark.read.option("pathGlobFilter", "*.parquet")
        .parquet(bucket_dir)
        .inputFiles()
    )


def update_rollup(
    spark: SparkSession,
    bucket_dir: str,
    rollup_dir: str,
    group_cols: list[str],
    value_cols: list[str],
    distinct_cols: list[str] | None = None,
    derive=None,
) -> int:
    """Incorporate the bucket's NEW data files into the rollup; returns how
    many files were processed (0 = already current, no job ran).

    ``derive``: optional ``DataFrame -> DataFrame`` applied to the raw
    file scan before aggregation (e.g. add a time-bucket or label column
    that the rollup groups by). It must be deterministic — it re-runs per
    batch, only over that batch's files.

    Publication is snapshot-versioned: the merged state parquet and its
    manifest land in a fresh ``v_<ts>_<uuid>`` directory, and the
    ``_CURRENT`` pointer flips via ``os.replace`` (atomic on POSIX). A
    concurrent reader holds a consistent version for its whole read; a
    crashed update leaves no trace but an orphaned unpointed directory.
    Not safe for CONCURRENT writers (single-maintainer assumption, the
    same one the reference's bucket merge makes).
    """
    all_files = _list_bucket_files(spark, bucket_dir)
    cur_name = _read_current(rollup_dir)
    seen: set[str] = set()
    spec = {
        "group_cols": group_cols,
        "value_cols": value_cols,
        "distinct_cols": distinct_cols or [],
    }
    if cur_name is not None:
        manifest = current_rollup_version(rollup_dir)
        if manifest["spec"] != spec:
            raise ValueError(
                f"rollup spec changed: manifest has {manifest['spec']}, "
                f"caller wants {spec}; use a fresh rollup_dir"
            )
        if "files" not in manifest:
            raise ValueError(
                f"{rollup_dir} is maintained by stream_update_rollup "
                "(batch-id manifest); file-based update_rollup cannot "
                "resume it — use a fresh rollup_dir"
            )
        seen = set(manifest["files"])
    new_files = [f for f in all_files if f not in seen]
    if not new_files:
        return 0

    batch = spark.read.parquet(*new_files)
    if derive is not None:
        batch = derive(batch)
    new_state = rollup_aggregate(batch, group_cols, value_cols, distinct_cols)
    if cur_name is not None:
        old_state = spark.read.parquet(os.path.join(rollup_dir, cur_name, "state"))
        merged = rollup_merge(
            [old_state, new_state], group_cols, value_cols, distinct_cols
        )
    else:
        merged = new_state

    _publish_version(
        rollup_dir,
        merged,
        {"spec": spec, "files": sorted(seen | set(new_files)), "previous": cur_name},
    )
    return len(new_files)


def _publish_version(rollup_dir: str, merged: DataFrame, manifest: dict) -> str:
    """Write (state, manifest) into a fresh version dir, then atomically flip
    ``_CURRENT``. The two artifacts share the version directory, so readers
    can never observe a state without its manifest (or vice versa)."""
    version = f"v_{int(time.time() * 1000)}_{uuid.uuid4().hex[:8]}"
    vdir = os.path.join(rollup_dir, version)
    merged.write.parquet(os.path.join(vdir, "state"))
    with open(os.path.join(vdir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    tmp = os.path.join(rollup_dir, f".{_CURRENT}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(rollup_dir, _CURRENT))
    return version


def stream_update_rollup(
    stream_df: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_cols: list[str],
    distinct_cols: list[str] | None = None,
    derive=None,
    trigger: dict | None = None,
    query_name: str = "rollup_maintenance",
):
    """Maintain the rollup continuously from a STREAM: each micro-batch's
    partial state merges into the published version (``foreachBatch``).

    Exactly-once effect from an at-least-once callback: the manifest
    records the last merged ``batch_id``; a replayed micro-batch (restart
    from checkpoint, task retry re-invoking the epoch) is skipped instead
    of double-merged. Versioned publication is the same atomic
    ``_CURRENT`` flip as the batch path, so a crash mid-merge leaves the
    previous version live and the checkpoint replays the batch.

    Cost per trigger: O(micro-batch) scan + O(#groups) merge — a true
    continuous aggregate; no growing state store, no watermark needed
    (the state is commutative-merge, not event-time windowed). Don't mix
    with ``update_rollup`` on the same rollup_dir (different manifests).

    Returns the started ``StreamingQuery``.
    """
    if not stream_df.isStreaming:
        raise ValueError("stream_update_rollup needs a streaming DataFrame; "
                         "use update_rollup for batch maintenance")
    spark = stream_df.sparkSession
    spec = {
        "group_cols": group_cols,
        "value_cols": value_cols,
        "distinct_cols": distinct_cols or [],
    }

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        cur_name = _read_current(rollup_dir)
        prev_manifest = current_rollup_version(rollup_dir) if cur_name else None
        if prev_manifest is not None:
            if prev_manifest["spec"] != spec:
                raise ValueError(
                    f"rollup spec changed: manifest has {prev_manifest['spec']}, "
                    f"stream wants {spec}; use a fresh rollup_dir"
                )
            if prev_manifest.get("last_batch_id", -1) >= batch_id:
                return  # replayed micro-batch: already merged
        if derive is not None:
            batch_df = derive(batch_df)
        new_state = rollup_aggregate(batch_df, group_cols, value_cols, distinct_cols)
        if cur_name is not None:
            old = spark.read.parquet(os.path.join(rollup_dir, cur_name, "state"))
            merged = rollup_merge([old, new_state], group_cols, value_cols, distinct_cols)
        else:
            merged = new_state
        _publish_version(
            rollup_dir,
            merged,
            {"spec": spec, "last_batch_id": batch_id, "previous": cur_name},
        )

    writer = (
        stream_df.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .queryName(query_name)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_rollup(
    spark: SparkSession,
    rollup_dir: str,
    finalize: bool = True,
    round_decimals: int = 6,
) -> DataFrame:
    """Read the live rollup version (finalized stats by default)."""
    cur = _read_current(rollup_dir)
    if cur is None:
        raise FileNotFoundError(f"no published rollup version in {rollup_dir}")
    manifest = current_rollup_version(rollup_dir)
    state = spark.read.parquet(os.path.join(rollup_dir, cur, "state"))
    if not finalize:
        return state
    return rollup_finalize(
        state,
        manifest["spec"]["group_cols"],
        manifest["spec"]["value_cols"],
        manifest["spec"].get("distinct_cols") or [],
        round_decimals=round_decimals,
    )
