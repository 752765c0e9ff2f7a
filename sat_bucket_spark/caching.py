"""Stage materialization policy: localCheckpoint vs persist vs checkpoint.

Several multi-branch operators (LSH dedup, image hashing, connected
components) materialize a small intermediate once so that the branches
referencing it do not recompute the expensive upstream (decode, hashing).
The default mechanism is ``DataFrame.localCheckpoint`` — fastest, because
the blocks live on executor LOCAL disk/memory with no replication. The
trade: on a real cluster with dynamic allocation or preemption, losing an
executor loses its blocks AND the truncated lineage, killing the query
instead of recomputing it.

This module makes the policy a knob so cluster deployments can choose a
fault-tolerant posture without touching operator code:

- ``"local_checkpoint"`` (default): fastest; not safe under executor loss.
- ``"persist"``: ``MEMORY_AND_DISK`` cache, lineage KEPT — executor loss
  recomputes the lost partitions. Iterative loops (connected components)
  keep growing their plan under this mode, which is slower but correct.
- ``"reliable_checkpoint"``: ``DataFrame.checkpoint`` to the Spark
  checkpoint directory (HDFS/object store on a cluster) — survives any
  executor loss and truncates lineage; pays a write to reliable storage.
  Requires ``spark.sparkContext.setCheckpointDir(...)`` first.

Use :func:`set_stage_cache_mode` (process-global) or the
:func:`stage_cache_mode` context manager. All modes produce identical
results; tests pin that (tests/test_caching.py).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

__all__ = [
    "STAGE_CACHE_MODES",
    "get_stage_cache_mode",
    "set_stage_cache_mode",
    "stage_cache",
    "stage_cache_mode",
]

STAGE_CACHE_MODES = ("local_checkpoint", "persist", "reliable_checkpoint")

_mode: str = "local_checkpoint"


def get_stage_cache_mode() -> str:
    return _mode


def set_stage_cache_mode(mode: str) -> None:
    global _mode
    if mode not in STAGE_CACHE_MODES:
        raise ValueError(
            f"stage-cache mode must be one of {STAGE_CACHE_MODES}, got {mode!r}"
        )
    _mode = mode


@contextmanager
def stage_cache_mode(mode: str):
    """Temporarily switch the stage-cache policy (restores on exit)."""
    prev = get_stage_cache_mode()
    set_stage_cache_mode(mode)
    try:
        yield
    finally:
        set_stage_cache_mode(prev)


def stage_cache(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize a reused intermediate under the configured policy.

    ``eager=True`` forces materialization NOW (iterative loops need it so
    each round's work is bounded); ``eager=False`` materializes at first
    action. See the module docstring for the executor-loss trade of each
    mode.
    """
    if _mode == "local_checkpoint":
        return df.localCheckpoint(eager=eager)
    if _mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise RuntimeError(
            "stage-cache mode 'reliable_checkpoint' needs a checkpoint "
            "directory: call spark.sparkContext.setCheckpointDir(...) with "
            "a cluster-visible path (HDFS/object store) first"
        )
    return df.checkpoint(eager=eager)
