"""Connected components / duplicate clustering tests."""

from __future__ import annotations

import numpy as np
import pytest

from sat_bucket_spark.operators.graph import (
    connected_components,
    near_duplicate_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def test_chain_and_clique(self, spark):
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21), (21, 22), (20, 22)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_self_loops_and_duplicates_ignored(self, spark):
        df = spark.createDataFrame([(5, 5), (5, 6), (6, 5)], ["src", "dst"])
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == {5: 5, 6: 5}

    def test_string_ids(self, spark):
        df = spark.createDataFrame([("b", "a"), ("b", "c"), ("x", "y")], ["src", "dst"])
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, driver_threshold=0).collect()
        }
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_long_chain_converges_fast(self, spark):
        # a 200-node path is the adversarial case for label propagation;
        # star rounds handle it in O(log n)
        edges = [(i, i + 1) for i in range(200)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, driver_threshold=0).collect()
        }
        assert set(got.values()) == {0}
        assert len(got) == 201

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("threshold", [200_000, 0])  # driver and distributed paths
    def test_random_vs_union_find(self, spark, seed, threshold):
        rng = np.random.default_rng(seed)
        n, m = 300, 260
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
            if a != b
        ]
        expected = _union_find(edges)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, driver_threshold=threshold).collect()
        }
        assert got == expected


class TestNearDuplicateClusters:
    def test_clusters_and_keep_flag(self, spark):
        pairs = spark.createDataFrame(
            [(3, 7), (7, 9), (12, 15)], ["id_a", "id_b"]
        )
        rows = {r["doc_id"]: r for r in near_duplicate_clusters(pairs).collect()}
        assert rows[3]["cluster_id"] == 3 and rows[3]["is_kept"]
        assert rows[7]["cluster_id"] == 3 and not rows[7]["is_kept"]
        assert rows[9]["cluster_id"] == 3 and not rows[9]["is_kept"]
        assert rows[12]["cluster_id"] == 12 and rows[12]["is_kept"]
        assert rows[15]["cluster_id"] == 12 and not rows[15]["is_kept"]


class TestResolveDuplicates:
    def test_priority_and_singletons(self, spark):
        from sat_bucket_spark.operators.dedup import resolve_duplicates

        docs = spark.createDataFrame(
            [
                (1, "crawl"), (2, "wiki"), (3, "crawl"),   # cluster A
                (4, "crawl"), (5, "crawl"),                # cluster B (tie -> min id)
                (9, "crawl"),                              # singleton
            ],
            ["doc_id", "source"],
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], ["doc_id", "cluster_id"]
        )
        out = resolve_duplicates(docs, clusters, priority=["wiki", "crawl"])
        got = sorted(r["doc_id"] for r in out.collect())
        # cluster A -> wiki doc 2; cluster B -> min-id 4; singleton 9 survives
        assert got == [2, 4, 9]

    def test_unlisted_sources_rank_last(self, spark):
        from sat_bucket_spark.operators.dedup import resolve_duplicates

        docs = spark.createDataFrame(
            [(1, "mystery"), (2, "wiki")], ["doc_id", "source"]
        )
        clusters = spark.createDataFrame([(1, 1), (2, 1)], ["doc_id", "cluster_id"])
        out = resolve_duplicates(docs, clusters, priority=["wiki"])
        assert [r["doc_id"] for r in out.collect()] == [2]
