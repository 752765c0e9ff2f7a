"""Sequence-packing operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.operators.packing import pack_sequences


class TestPackSequences:
    def test_greedy_bins_single_group(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (2, 200), (3, 300), (4, 250), (5, 50)],
            ["doc_id", "n_tokens"],
        )
        rows = {
            r["doc_id"]: r["bin"]
            for r in pack_sequences(df, capacity=500, n_groups=1).collect()
        }
        # fills: 100, 300 | 300 (new bin: 300+300>500? 100+200=300, +300=600>500)
        # bin0: 1,2 (300); bin1: 3 (300); 250 fits (550>500? 300+250=550 -> new);
        # bin2: 4,5 (300)
        assert rows == {1: 0, 2: 0, 3: 1, 4: 2, 5: 2}

    def test_oversized_doc_gets_own_bin(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 999), (3, 10)], ["doc_id", "n_tokens"]
        )
        rows = {
            r["doc_id"]: r["bin"]
            for r in pack_sequences(df, capacity=100, n_groups=1).collect()
        }
        assert rows == {1: 0, 2: 1, 3: 2}

    def test_partitioning_invariance(self, spark):
        df = spark.range(500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("n_tokens")
        )
        a = sorted(
            (r["doc_id"], r["group"], r["bin"])
            for r in pack_sequences(df, capacity=256, n_groups=8).collect()
        )
        b = sorted(
            (r["doc_id"], r["group"], r["bin"])
            for r in pack_sequences(df.repartition(13), capacity=256, n_groups=8).collect()
        )
        assert a == b

    def test_bins_respect_capacity(self, spark):
        df = spark.range(300).select(
            F.col("id").alias("doc_id"), (F.col("id") % 60 + 1).alias("n_tokens")
        )
        out = pack_sequences(df, capacity=150, n_groups=4)
        fills = (
            out.groupBy("group", "bin").agg(F.sum("n_tokens").alias("fill")).collect()
        )
        assert all(r["fill"] <= 150 for r in fills)  # no oversized docs here
        assert out.count() == 300  # nothing dropped

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 10)], ["doc_id", "n_tokens"])
        with pytest.raises(ValueError):
            pack_sequences(df, capacity=0)
        with pytest.raises(ValueError):
            pack_sequences(df, n_groups=0)


class TestPackingProperties:
    def test_random_invariants(self, spark):
        """Hypothesis-style randomized invariants (fixed seeds for CI speed):
        totality, fill bound, bin density per group."""
        import numpy as np

        for seed in (0, 7):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(50, 400))
            cap = int(rng.integers(50, 500))
            sizes = rng.integers(1, cap * 2, n)  # some oversized
            df = spark.createDataFrame(
                [(int(i), int(s)) for i, s in enumerate(sizes)],
                ["doc_id", "n_tokens"],
            )
            out = pack_sequences(df, capacity=cap, n_groups=5).toPandas()
            assert len(out) == n  # total: nothing dropped
            for (g, b), grp in out.groupby(["group", "bin"]):
                # a bin exceeding capacity must be a single oversized doc
                if grp["n_tokens"].sum() > cap:
                    assert len(grp) == 1 and grp["n_tokens"].iloc[0] > cap
            for g, grp in out.groupby("group"):
                bins = sorted(grp["bin"].unique())
                assert bins == list(range(len(bins)))  # dense 0..k
