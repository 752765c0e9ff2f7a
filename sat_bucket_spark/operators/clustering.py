"""Distributed k-means over embedding columns.

Topic-bucketing a corpus by embedding cluster (for balancing, dedup
within topics, or stratified eval splits) needs k-means ON THE FULL
DATASET, not the driver-side sample that suffices for the IVF coarse
quantizer. Lloyd's algorithm maps cleanly onto DataFrames:

    assign:  argmin_c ||v - c||^2 — a literal-codebook Column expression
             (operators.similarity._nearest_centroid_expr), whole-stage
             codegen, no shuffle;
    update:  per-(cluster, dim) sums — posexplode + one partial-aggregated
             shuffle of k x dim cells; the driver folds k x dim floats into
             the next round's literals.

Per iteration: one job, one shuffle whose volume is k x dim x partitions
(map-side combine), driver traffic k x dim floats. The dataset never
leaves the executors — the classic scalable-Lloyd shape. Iterations are
driver-bounded (fixed count or centroid-shift tolerance), and the final
assignment is a pure expression usable in any downstream plan.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.similarity import _nearest_centroid_expr, cosine_expr

__all__ = ["assign_clusters", "kmeans_fit", "semantic_dedup", "semantic_dup_pairs"]


def kmeans_fit(
    vectors: DataFrame,
    dim: int,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    n_iter: int = 10,
    tol: float = 1e-6,
    seed: int = 42,
    init: np.ndarray | None = None,
    sample_rows: int = 10_000,
) -> np.ndarray:
    """Lloyd's k-means on the full distributed dataset; returns (k, dim).

    ``init`` defaults to a seeded random pick from a bounded driver sample
    (deterministic); pass explicit centroids to resume/refine. Stops after
    ``n_iter`` rounds or when the max centroid shift falls below ``tol``.
    Empty clusters keep their previous centroid (no respawn — deterministic).
    """
    if init is None:
        pdf = vectors.select(vec_col).limit(sample_rows).toPandas()
        X = np.array(pdf[vec_col].tolist(), dtype="float64")
        rng = np.random.default_rng(seed)
        init = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    centroids = np.array(init, dtype="float64")

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for _ in range(n_iter):
        assigned = vectors.select(
            _nearest_centroid_expr(v, centroids).alias("__c"), v.alias("__v")
        )
        cells = (
            assigned.select("__c", F.posexplode("__v").alias("__d", "__x"))
            .groupBy("__c", "__d")
            .agg(F.sum("__x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        counts = np.zeros(len(centroids))
        sums = np.zeros_like(centroids)
        for r in cells:
            sums[r["__c"], r["__d"]] = r["s"]
            counts[r["__c"]] = r["n"]
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift < tol:
            break
    return centroids


def assign_clusters(
    vectors: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "cluster",
) -> DataFrame:
    """Append the nearest-centroid cluster id — a pure literal-codebook
    expression (codegen, zero shuffle); compose freely with any plan."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return vectors.withColumn(out, _nearest_centroid_expr(v, np.asarray(centroids, dtype="float64")))


def semantic_dup_pairs(
    vectors: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster cosine near-dup pairs (SemDeDup-style candidates).

    Semantic dedup prunes documents whose embeddings nearly coincide with
    another document *in the same k-means cluster* — the cluster structure
    bounds the pairwise work: candidates come from an equi-join on the
    cluster id (pairwise only within a cluster), never the corpus-level
    all-pairs product. With k clusters over n docs the pair volume drops
    from n^2 to ~n^2/k; pick k ~ sqrt(n) (SemDeDup uses tens of thousands
    of clusters for web-scale corpora) so each cluster's pairwise block
    stays executor-sized. Assignment itself is a literal-codebook argmin
    expression — codegen, zero shuffle; the only shuffle is the equi-join
    on cluster id. Skew note: at small k the join hashes few distinct
    keys — AQE skew-join splits oversized clusters at runtime.

    Returns ``(id_a, id_b, cluster, cosine)`` with ``id_a < id_b`` and
    ``cosine >= threshold`` (rounded to 6 decimals for portability).
    """
    assigned = assign_clusters(vectors, centroids, vec_col=vec_col, out="__cluster").select(
        id_col, "__cluster", vec_col
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col("__cluster"), F.col(vec_col).alias("__va")
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col("__cluster"), F.col(vec_col).alias("__vb")
    )
    return (
        a.join(b, "__cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("__va"), F.col("__vb")), 6))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", F.col("__cluster").alias("cluster"), "cosine")
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Keep one representative per semantic near-dup neighborhood.

    Drop rule (deterministic, SemDeDup's anchor approximation): a row is
    dropped when some *smaller-id* row in its cluster has cosine >=
    ``threshold`` with it; min-id rows always survive as representatives.
    The drop set is just ``id_b`` of :func:`semantic_dup_pairs` — ids only
    through the shuffle — and survivors come from a left-anti join, so the
    full rows (embedding payloads included) move exactly once.
    """
    dropped = semantic_dup_pairs(
        vectors, centroids, threshold=threshold, id_col=id_col, vec_col=vec_col
    ).select(F.col("id_b").alias(id_col)).distinct()
    return vectors.join(dropped, id_col, "left_anti")
