"""Zero-extra-job pipeline metrics: per-stage funnels via ``observe``.

A curation pipeline wants the rejection funnel — rows in, rows surviving
each stage — but calling ``count()`` after every stage re-executes the
prefix of the pipeline per stage: a 10-stage funnel over 100 TB pays ~10
full scans. Spark's ``Observation`` API attaches aggregate metrics to a
plan node and collects them as a side effect of the ONE action that runs
anyway — the funnel becomes free.

Reference scope: beyond sat-bucket (operational tooling for the curation
suite); built entirely on the public ``DataFrame.observe`` API.
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["PipelineFunnel", "observe_funnel"]

# Observation names must be unique within one query plan: two funnels
# composed into a single action (union, join) would otherwise collide on
# "funnel_input" and fail analysis. A process-wide sequence disambiguates.
_FUNNEL_SEQ = itertools.count()


class PipelineFunnel:
    """The observed pipeline: ``df`` to act on, ``counts()`` after acting.

    ``counts()`` (and ``metrics()``) block until the observed metrics are
    available, so call them only after an action has executed ``df``.
    """

    def __init__(self, df: DataFrame, observations: list[tuple[str, Observation]]):
        self.df = df
        self._observations = observations

    def counts(self) -> dict[str, int]:
        """Rows that flowed PAST each stage (insertion order preserved)."""
        return {name: obs.get["rows"] for name, obs in self._observations}

    def metrics(self) -> dict[str, dict]:
        """All observed metrics per stage."""
        return {name: dict(obs.get) for name, obs in self._observations}

    def dropped(self) -> dict[str, int]:
        """Rows REMOVED by each stage (first stage's input is the baseline)."""
        cs = list(self.counts().items())
        return {
            name: prev_n - n
            for (_, prev_n), (name, n) in zip(cs, cs[1:])
        }


def observe_funnel(
    df: DataFrame,
    stages: Sequence[tuple[str, Callable[[DataFrame], DataFrame]]],
    extra_metrics: Sequence[Column] = (),
) -> PipelineFunnel:
    """Chain ``stages`` over ``df`` with an observed row count after each.

    ``stages`` is ``[(name, fn), ...]``; each ``fn`` maps DataFrame ->
    DataFrame (filter, dedup, rebuild — anything). An ``input`` observation
    is added before the first stage. ``extra_metrics`` (aggregate Columns,
    e.g. ``F.sum("n_tokens").alias("tokens")``) are observed at EVERY
    point alongside the row count.

    Scale contract: observations are plan-side aggregates merged on the
    executors and shipped with task results — the funnel adds ZERO jobs,
    zero shuffles, and no caching; whatever single action the caller runs
    (a write, usually) produces every number. Note Spark computes observed
    metrics for rows that FLOW THROUGH the node — a downstream limit or
    pushed-down pruning that skips rows entirely also skips their metrics,
    the standard ``observe`` caveat. The converse also holds: a plan
    region the engine EXECUTES TWICE inflates its observations — the
    common case is ``repartitionByRange`` downstream of the last shuffle,
    whose range-sampling pass re-runs the un-materialized region (metrics
    upstream of a shuffle boundary are immune: the shuffle materializes
    once). Treat such a stage's count as an at-least bound, or read the
    sink back for the exact number. (This suite's own shard exporter,
    ``writers.write_jsonl_shards``, routes shards through hash preimages
    precisely to avoid that sampling pass — its funnels read exact.)
    """
    seq = next(_FUNNEL_SEQ)
    obs_in = Observation(f"funnel{seq}_input")
    out = df.observe(obs_in, F.count(F.lit(1)).alias("rows"), *extra_metrics)
    observations: list[tuple[str, Observation]] = [("input", obs_in)]
    for name, fn in stages:
        out = fn(out)
        ob = Observation(f"funnel{seq}_{name}")
        out = out.observe(ob, F.count(F.lit(1)).alias("rows"), *extra_metrics)
        observations.append((name, ob))
    return PipelineFunnel(out, observations)
