"""Sketch-based and top-k aggregates for corpus-scale analytics.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-bound
(every distinct value crosses the wire); the standard answer is mergeable
sketches — HyperLogLog++ for cardinality, a quantile sketch for
percentiles — which reduce per-group state to KBs and make the aggregation
a normal partial/final combine. Spark ships both as native expressions
(``approx_count_distinct``, ``percentile_approx``) running inside codegen;
these wrappers pin the engine contract (column naming, grouping shape) and
document the error model.

``heavy_hitters`` is the exact complement: per-group top-k most frequent
values with a deterministic tie-break. Exact top-k needs the (group, value)
count — one shuffle keyed by the pair, map-side combined — then a bounded
per-group sort. It is SQL-replayable (the driver oracle covers it);
the sketch operators are validated by tolerance tests instead (their
outputs are estimator-specific by construction, so no cross-engine hash
can match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["approx_distinct", "approx_quantiles", "heavy_hitters"]


def approx_distinct(
    df: DataFrame,
    cols: list[str],
    group_by: list[str] | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """HyperLogLog++ distinct-count estimate per column (per group).

    ``rsd`` is the target relative standard deviation (2% default ~ the
    classic 1.04/sqrt(2^12) setting). State is O(2^p) bytes per (group,
    column) regardless of data volume — the property that makes global
    cardinality tractable at 100 TB. Output columns: ``n_distinct_<col>``.
    """
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"n_distinct_{c}") for c in cols
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    group_by: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate quantiles per group (Greenwald-Khanna style sketch).

    Guarantees rank error <= 1/accuracy; sketch state is O(accuracy) per
    group and mergeable, so the plan is a standard two-phase aggregate.
    Output: one ``q_<pct>`` column per requested probability.
    """
    for p in probabilities:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probabilities must be in [0, 1], got {p}")
    aggs = [
        F.percentile_approx(col, F.lit(float(p)), F.lit(accuracy)).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probabilities
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Exact per-group top-k most frequent values, deterministically ordered.

    Plan: groupBy (group, value) count — map-side partial aggregation absorbs
    the very skew that makes a value a heavy hitter, so the shuffle carries
    one row per distinct (group, value) per map partition — then a rank
    window per group (bounded: k rows survive). Tie-break is (count desc,
    value asc) so results are total-ordered and engine-reproducible.

    Returns ``(group..., value_col, n, rank)`` with rank in [1, k].
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    keys = list(group_by or [])
    counted = df.groupBy(*keys, value_col).agg(F.count(F.lit(1)).alias("n"))
    order = [F.col("n").desc(), F.col(value_col).asc()]
    if not keys:
        # Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
        # each partition keeps its local top-k, the driver merges k*p rows —
        # no single-reducer window over every distinct value. The rank window
        # then runs over k rows only.
        counted = counted.orderBy(*order).limit(k)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= F.lit(k))
    )
