"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed scale path.

Operates on a table with an ``array<float>`` embedding column (testdata:
``embeddings(vec_id, embedding, label)``). The dot products are computed with
``aggregate``/``zip_with`` — JVM-side, vectorized by codegen, no Python.

Scale design: brute-force is O(N*Q) and exists as the exactness baseline and
for broadcast-sized query sets; the production path buckets vectors with
random-hyperplane LSH so candidate generation is an equi-join on bucket keys,
then ranks exactly within buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "brute_force_topk",
    "cosine_expr",
    "dot_expr",
    "norm_expr",
    "ivf_topk",
    "lsh_near_dup_pairs",
    "pairwise_near_duplicates",
    "random_hyperplane_signature",
    "train_ivf_centroids",
    "lsh_topk",
]


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_expr(a: Column) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (0 when either norm is 0)."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k of every query against the vector table.

    The query side is broadcast (top-k makes no sense for a huge query set in
    one job), so the join is map-side: each vector partition scans the
    broadcast queries — no shuffle of the big table. Ranking uses
    ``row_number`` partitioned by query with a deterministic (similarity desc,
    id asc) tiebreak.
    """
    joined = vectors.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def pairwise_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold (embedding near-dup).

    All-pairs on purpose — the exactness oracle for embedding dedup. At scale
    use :func:`random_hyperplane_signature` buckets first and run this within
    buckets only.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def lsh_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs — the bucketed scale path of
    :func:`pairwise_near_duplicates`.

    Candidates come from ``n_bands`` independent sign-random-projection
    bucketings (seeds ``seed..seed+n_bands-1``): a pair is a candidate when it
    shares a full bucket in ANY band — an equi-join per band, never the
    all-pairs product. The exact cosine verify restores precision; recall is
    probabilistic (a cosine-``t`` pair survives one band with
    ``(1 - acos(t)/pi)^n_planes``, so more bands raise recall, more planes cut
    candidates). Fully deterministic given ``seed`` — an external engine can
    replay bucket assignment from the same literal hyperplanes, which is how
    the driver oracle reproduces it bit-for-bit.

    Shuffle shape: per band, (id, bucket) pairs only; the candidate distinct
    carries (id_a, id_b); vectors travel only in the two verify joins.
    """
    cand = None
    for band in range(n_bands):
        # (id, int) — materialize so the a/b join sides don't each re-run
        # the dim x n_planes projection fold.
        sig = (
            random_hyperplane_signature(
                vectors, dim=dim, n_planes=n_planes, vec_col=vec_col,
                out="__lsh_b", seed=seed + band,
            )
            .select(id_col, "__lsh_b")
            .localCheckpoint(eager=False)
        )
        a = sig.select(F.col(id_col).alias("id_a"), "__lsh_b")
        b = sig.select(F.col(id_col).alias("id_b"), "__lsh_b")
        pairs = (
            a.join(b, "__lsh_b")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()  # ids only — no vector payload through the shuffle

    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_expr(F.col("__va"), F.col("__vb")), 6))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _literal_vector(v) -> Column:
    """A literal double array as ONE parsed expression.

    ``F.array(*[F.lit(x) ...])`` costs one py4j round-trip per element —
    ~1 ms each, so a 16x64 codebook burns >1 s of driver time just building
    the plan. A single ``F.expr`` string is one round-trip; ``repr(float)``
    round-trips exactly, so the values are bit-identical.
    """
    return F.expr("array(" + ", ".join(f"{float(x)!r}D" for x in v) + ")")


def _literal_matrix(mat) -> Column:
    rows = ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in row) + ")" for row in mat
    )
    return F.expr(f"array({rows})")


def random_hyperplane_signature(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    out: str = "lsh_bucket",
    seed: int = 42,
) -> DataFrame:
    """Sign-random-projection LSH bucket id per vector.

    Bit i of the bucket = sign(v . h_i) for fixed seeded hyperplanes folded
    into the plan as literal arrays. Cosine-similar vectors collide with high
    probability (SimHash for real vectors).
    """
    planes = _hyperplanes(n_planes, dim, seed=seed)
    bucket = None
    for i in range(n_planes):
        plane = _literal_vector(planes[i])
        bit = (dot_expr(F.col(vec_col), plane) > 0).cast("long")
        term = bit * F.lit(2**i)
        bucket = term if bucket is None else (bucket + term)
    return vectors.withColumn(out, bucket)


def train_ivf_centroids(
    vectors: DataFrame,
    dim: int,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    seed: int = 42,
    n_iter: int = 10,
) -> np.ndarray:
    """Driver-side k-means on a sample — the IVF coarse quantizer.

    The codebook is tiny (k x dim floats) and folds into Column expressions as
    literals; training on a bounded sample is the standard IVF recipe. Fully
    deterministic (seeded init, fixed iterations).
    """
    pdf = vectors.select(vec_col).limit(sample_rows).toPandas()
    X = np.array(pdf[vec_col].tolist(), dtype="float64")
    rng = np.random.default_rng(seed)
    centroids = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _nearest_centroid_expr(vec: Column, centroids: np.ndarray) -> Column:
    """argmin_c ||v - c||^2 as a fold over literal centroid arrays (JVM-side).

    Uses ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 is common so the
    argmin reduces to argmin_c (||c||^2 - 2 v.c) — one dot product per
    centroid, no per-row allocation.
    """
    # Materialize all scores into ONE array column, then take the index of the
    # min. A chained when(score_i < best, ...) alternative duplicates best
    # (which embeds every earlier score) at each step — an O(2^n_clusters)
    # expression tree that Janino can't codegen and the interpreter re-evaluates.
    # The codebook is a single nested literal array folded by ONE shared
    # transform/aggregate lambda (||c||^2 - 2 v.c accumulated element-wise), so
    # the plan holds n_clusters*dim literal leaves but only a constant number
    # of operator nodes — analyzer/optimizer passes stay fast as the codebook
    # grows. First-min tie-break (array_position) matches DuckDB list_position.
    cents = _literal_matrix(centroids)
    scores = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(c, vec, lambda a, b: a * a - 2.0 * a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(scores, F.array_min(scores)) - 1).cast("int")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize vectors into inverted lists,
    scan only the query's ``n_probe`` nearest lists.

    The scale path for ANN when hyperplane LSH recall is insufficient:
    candidate volume is ~(n_probe / n_clusters) of the corpus, and cluster
    assignment is a pure expression (no shuffle beyond the candidate join).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            vectors, dim, n_clusters=n_clusters, vec_col=vec_col, seed=seed
        )
    v = vectors.withColumn("__cluster", _nearest_centroid_expr(F.col(vec_col), centroids))

    # Driver-side probe lists per query cluster: tiny (k x k distances)
    d2 = ((centroids[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe_order = d2.argsort(axis=1)[:, :n_probe]
    probes = [
        (int(c), int(p)) for c in range(len(centroids)) for p in probe_order[c]
    ]
    spark = vectors.sparkSession
    probe_df = spark.createDataFrame(probes, ["__qcluster", "__cluster"])

    q = queries.withColumn(
        "__qcluster", _nearest_centroid_expr(F.col(query_vec_col), centroids)
    ).join(F.broadcast(probe_df), "__qcluster")
    joined = v.join(F.broadcast(q), "__cluster").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: rank exactly only within the query's LSH bucket.

    The scale path: bucket both sides (an equi-join on the bucket id replaces
    the cross product), then exact cosine + row_number within buckets. Recall
    is tunable via n_planes (fewer planes -> bigger buckets -> higher recall).
    """
    v = random_hyperplane_signature(
        vectors, dim, n_planes=n_planes, vec_col=vec_col, out="__bucket", seed=seed
    )
    q = random_hyperplane_signature(
        queries, dim, n_planes=n_planes, vec_col=query_vec_col, out="__bucket", seed=seed
    )
    joined = v.join(F.broadcast(q), "__bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
