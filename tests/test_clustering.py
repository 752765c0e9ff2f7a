"""Distributed k-means tests vs a local numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from sat_bucket_spark.operators.clustering import assign_clusters, kmeans_fit


def _local_lloyd(X, init, n_iter):
    c = np.array(init, dtype="float64")
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        new = c.copy()
        for k in range(len(c)):
            m = X[a == k]
            if len(m):
                new[k] = m.mean(axis=0)
        c = new
    return c


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    X = np.array(
        [r["embedding"] for r in df.select("embedding").collect()], dtype="float64"
    )
    return df, X


class TestKMeans:
    def test_matches_local_reference(self, spark, emb):
        df, X = emb
        init = X[:4].copy()
        got = kmeans_fit(df, dim=X.shape[1], n_clusters=4, init=init, n_iter=5, tol=0.0)
        want = _local_lloyd(X, init, 5)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    def test_inertia_decreases(self, spark, emb):
        df, X = emb
        init = X[10:13].copy()
        fitted = kmeans_fit(df, dim=X.shape[1], n_clusters=3, init=init, n_iter=8)

        def inertia(c):
            d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            return d2.min(axis=1).sum()

        assert inertia(fitted) <= inertia(init) + 1e-9

    def test_assign_clusters_no_shuffle(self, spark, emb):
        df, X = emb
        out = assign_clusters(df, X[:4])
        assert out.select("cluster").distinct().count() <= 4
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan

    def test_deterministic_default_init(self, spark, emb):
        df, X = emb
        a = kmeans_fit(df, dim=X.shape[1], n_clusters=3, n_iter=2, seed=7)
        b = kmeans_fit(df, dim=X.shape[1], n_clusters=3, n_iter=2, seed=7)
        np.testing.assert_array_equal(a, b)
