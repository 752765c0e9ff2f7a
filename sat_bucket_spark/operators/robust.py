"""Robust (median/MAD) outlier scoring for curation pipelines.

Mean/stddev z-scores are the textbook outlier filter and the wrong one for
web-scale data: a single 10 GB document (or a bot's 10^9 repeated events)
drags the mean toward itself and inflates sigma until nothing is an
outlier. The robust alternative scores against the MEDIAN and the median
absolute deviation (MAD) — both 50%-breakdown estimators — via the
modified z-score  z = 0.6745 * (x - median) / MAD  (Iglewicz & Hoaglin's
consistency constant for normal data; |z| > 3.5 is their standard cut).

Scale shape: exact medians per group are rank statistics, so the grouped
path shuffles the data ONCE by the group key and evaluates both percentile
windows (median, then MAD of deviations) inside that single partitioning —
no second exchange, no join-back. The global path (no groups) avoids the
one-reducer window cliff entirely: two scalar aggregates, each a 1-row
broadcast. For data volumes where an exact global rank statistic is itself
unreasonable, compute the cut from ``approx_quantiles``
(operators/sketches.py) and filter with a plain predicate instead.

Reference scope: beyond sat-bucket (its QC filters are fixed-threshold
numpy masks, e.g. satbucket filtering utilities; this is the distributed,
estimator-backed re-expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["add_robust_zscore", "mad_outlier_filter"]

#: Consistency constant: for normal data, MAD * 1/0.6745 estimates sigma.
MAD_K = 0.6745


def add_robust_zscore(
    df: DataFrame,
    value: str,
    by: list[str] | str | None = None,
    out: str = "robust_z",
    round_decimals: int = 6,
) -> DataFrame:
    """Add median, MAD, and the modified z-score of ``value`` (per group).

    Appends ``median_<value>``, ``mad_<value>`` and ``out`` columns. When
    MAD is 0 (over half the group shares one value) the z-score is NULL —
    any deviation from the median is then infinitely surprising, and the
    companion filter treats NULL-z rows with ``value != median`` as
    outliers. All three outputs are rounded to ``round_decimals`` so
    cross-engine float accumulation cannot diverge.

    Grouped path: one hash exchange on ``by``; both exact percentiles run as
    window aggregates inside that partitioning. Global path: two scalar
    aggregates broadcast back (no single-reducer window).
    """
    if isinstance(by, str):
        by = [by]
    med_col = f"median_{value}"
    mad_col = f"mad_{value}"
    v = F.col(value).cast("double")

    if by:
        w = Window.partitionBy(*by)
        with_med = df.withColumn("__med", F.percentile(v, F.lit(0.5)).over(w))
        with_mad = with_med.withColumn(
            "__mad",
            F.percentile(F.abs(v - F.col("__med")), F.lit(0.5)).over(w),
        )
    else:
        med = df.agg(F.percentile(v, F.lit(0.5)).alias("__med"))
        with_med = df.join(F.broadcast(med))
        mad = with_med.agg(
            F.percentile(F.abs(v - F.col("__med")), F.lit(0.5)).alias("__mad")
        )
        with_mad = with_med.join(F.broadcast(mad))

    z = F.when(
        F.col("__mad") > 0.0, MAD_K * (v - F.col("__med")) / F.col("__mad")
    )
    return (
        with_mad.withColumn(med_col, F.round(F.col("__med"), round_decimals))
        .withColumn(mad_col, F.round(F.col("__mad"), round_decimals))
        .withColumn(out, F.round(z, round_decimals))
        .drop("__med", "__mad")
    )


def mad_outlier_filter(
    df: DataFrame,
    value: str,
    by: list[str] | str | None = None,
    threshold: float = 3.5,
    keep: str = "inliers",
    round_decimals: int = 6,
) -> DataFrame:
    """Filter rows by modified z-score: |z| > ``threshold`` is an outlier.

    ``keep``: ``"inliers"`` drops outliers (the curation default),
    ``"outliers"`` keeps only them (anomaly mining), ``"flag"`` keeps every
    row and appends a boolean ``is_outlier``. Zero-MAD groups: rows off the
    median are outliers (NULL z), rows on it are inliers. The threshold
    compares against the ROUNDED z-score, so the decision boundary is
    engine-reproducible.
    """
    if keep not in ("inliers", "outliers", "flag"):
        raise ValueError(f"keep must be inliers|outliers|flag, got {keep!r}")
    scored = add_robust_zscore(
        df, value, by=by, out="__z", round_decimals=round_decimals
    )
    med_col = f"median_{value}"
    v = F.col(value).cast("double")
    is_out = F.when(F.col("__z").isNotNull(), F.abs(F.col("__z")) > threshold).otherwise(
        v != F.col(med_col)
    )
    if keep == "flag":
        return scored.withColumn("is_outlier", is_out).withColumnRenamed(
            "__z", "robust_z"
        )
    kept = scored.where(~is_out if keep == "inliers" else is_out)
    return kept.withColumnRenamed("__z", "robust_z")
