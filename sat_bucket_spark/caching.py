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
  recomputes the lost partitions. Iterative loops (connected components,
  PageRank) never use plain persist for round boundaries — kept lineage
  grows the plan exponentially per round (see :func:`round_cache`); they
  upgrade to checkpoint (if a dir is set) or localCheckpoint + warning.
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
    "release_stage_cache",
    "round_cache",
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
        _raise_no_checkpoint_dir()
    return df.checkpoint(eager=eager)


_warned_persist_rounds = False


def round_cache(df: DataFrame) -> DataFrame:
    """Round-boundary materialization for ITERATIVE loops (connected
    components, PageRank) — always eager and always lineage-truncating.

    Iterative rounds cannot use plain ``persist``: round k's analyzed plan
    embeds round k-1's plan — usually more than once (PageRank's rank
    frame feeds both the contribution join and the dangling-mass
    aggregate; the star rounds read the edge frame several times) — so
    with lineage kept the logical tree grows EXPONENTIALLY in the round
    count, and planning itself OOMs the JVM long before any data pressure
    (observed: 10-round PageRank at sf0.01 on a 1 GiB driver). Under
    ``persist`` mode this therefore upgrades to a reliable ``checkpoint``
    when a checkpoint directory is configured (fault-tolerant AND
    plan-bounded, the posture a persist-mode user asked for) and otherwise
    falls back to ``localCheckpoint`` with a one-time warning about the
    executor-loss trade. Branch-reuse (DAG-shaped) intermediates should
    keep using :func:`stage_cache`, where persist's kept lineage is the
    feature, not the bug.
    """
    if _mode == "persist":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        global _warned_persist_rounds
        if not _warned_persist_rounds:
            import warnings

            warnings.warn(
                "stage-cache mode 'persist' cannot bound an iterative "
                "loop's plan (kept lineage grows exponentially per round); "
                "falling back to localCheckpoint for round boundaries. Set "
                "a checkpoint dir (spark.sparkContext.setCheckpointDir) to "
                "get fault-tolerant, plan-bounded rounds instead.",
                RuntimeWarning,
                stacklevel=2,
            )
            _warned_persist_rounds = True
        return df.localCheckpoint(eager=True)
    return stage_cache(df, eager=True)


def release_stage_cache(df: DataFrame, destructive: bool = False) -> None:
    """Release the storage held by a :func:`stage_cache` or
    :func:`round_cache` frame once an iterative loop no longer needs it.

    Three storage shapes:

    - ``persist`` stage frames are registered in the cache manager and
      released with a non-blocking ``unpersist`` (lineage kept, so the
      frame stays usable — always safe, the default handles it).
    - ``localCheckpoint`` round frames hold executor blocks that the cache
      manager does NOT track (``df.storageLevel`` reads as NONE); without
      an explicit release they are reclaimed only when the driver GCs the
      RDD reference — on a long loop with an idle driver heap that means
      every round's blocks accumulate. With ``destructive=True`` the
      blocks are freed directly through the plan's ``LogicalRDD``.
    - ``checkpoint`` (reliable) round frames write one directory per round
      under the checkpoint dir that Spark never deletes; with
      ``destructive=True`` the files are removed through the Hadoop
      filesystem API.

    The last two shapes have NO recompute fallback — lineage was truncated
    at materialization, so a released frame raises
    ``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`` on next access. They therefore
    run only under ``destructive=True``; the default call is a safe hint
    that releases persisted (lineage-kept) frames and leaves checkpointed
    frames untouched, matching this function's original contract.
    Destructive callers must release round k only AFTER round k+1 is
    eagerly materialized and must not reference round k again; the graph
    loops satisfy both by construction. If Spark's internals move and the
    ``LogicalRDD`` probe fails, this degrades to the GC-driven cleanup,
    never an error.
    """
    if df.storageLevel.useMemory or df.storageLevel.useDisk:
        df.unpersist(blocking=False)
        return
    if not destructive:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return
        rdd = plan.rdd()
        level = rdd.getStorageLevel()
        if level.useMemory() or level.useDisk():
            rdd.unpersist(False)
        if rdd.isCheckpointed() and rdd.getCheckpointFile().isDefined():
            path_str = rdd.getCheckpointFile().get()
            jvm = df.sparkSession._jvm
            path = jvm.org.apache.hadoop.fs.Path(path_str)
            fs = path.getFileSystem(
                df.sparkSession._jsc.hadoopConfiguration()
            )
            fs.delete(path, True)
    except Exception:
        return


def _raise_no_checkpoint_dir() -> None:
    raise RuntimeError(
        "stage-cache mode 'reliable_checkpoint' needs a checkpoint "
        "directory: call spark.sparkContext.setCheckpointDir(...) with "
        "a cluster-visible path (HDFS/object store) first"
    )
