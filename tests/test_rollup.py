"""Tests: incrementally-maintained rollups (continuous aggregates).

The load-bearing property is exactness: after any sequence of incremental
updates, the finalized rollup must equal a full recompute over all data —
decimal partial sums make the merge order irrelevant.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.rollup import (
    current_rollup_version,
    read_rollup,
    rollup_aggregate,
    rollup_finalize,
    rollup_merge,
    update_rollup,
)

GROUPS = ["g"]
VALUES = ["v", "w"]


def _batch(spark, seed: int, n: int = 200):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [
        (
            int(i),
            ["a", "b", "c"][int(rng.integers(0, 3))],
            float(rng.normal(50, 20)),
            None if i % 7 == 0 else float(rng.uniform(0, 1)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "g", "v", "w"])


def _full_recompute(spark, bucket_dir):
    df = spark.read.option("pathGlobFilter", "*.parquet").parquet(bucket_dir)
    return rollup_finalize(
        rollup_aggregate(df, GROUPS, VALUES), GROUPS, VALUES
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: str(t[0])
    )


class TestIncrementalExactness:
    def test_three_batches_equal_full_recompute(self, spark, tmp_path):
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        for i, seed in enumerate([1, 2, 3]):
            _batch(spark, seed).write.mode("append").parquet(bucket)
            n_proc = update_rollup(spark, bucket, rollup, GROUPS, VALUES)
            assert n_proc > 0
            got = _rows(read_rollup(spark, rollup))
            want = _rows(_full_recompute(spark, bucket))
            assert got == want, f"divergence after batch {i}"

    def test_noop_when_current(self, spark, tmp_path):
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        _batch(spark, 5).write.parquet(bucket)
        assert update_rollup(spark, bucket, rollup, GROUPS, VALUES) > 0
        v1 = current_rollup_version(rollup)
        assert update_rollup(spark, bucket, rollup, GROUPS, VALUES) == 0
        assert current_rollup_version(rollup) == v1  # pointer untouched

    def test_null_handling(self, spark, tmp_path):
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        _batch(spark, 9).write.parquet(bucket)
        update_rollup(spark, bucket, rollup, GROUPS, VALUES)
        out = read_rollup(spark, rollup).collect()
        total_rows = sum(r["n_rows"] for r in out)
        total_w = sum(r["n_w"] for r in out)
        assert total_rows == 200
        assert total_w < total_rows  # every 7th w is NULL
        for r in out:
            assert r["min_w"] is not None and 0.0 <= r["min_w"] <= 1.0


class TestVersioning:
    def test_spec_change_raises(self, spark, tmp_path):
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        _batch(spark, 11).write.parquet(bucket)
        update_rollup(spark, bucket, rollup, GROUPS, VALUES)
        with pytest.raises(ValueError, match="spec changed"):
            update_rollup(spark, bucket, rollup, GROUPS, ["v"])

    def test_orphan_version_ignored(self, spark, tmp_path):
        """A crashed update (version dir written, pointer never flipped)
        must be invisible to readers."""
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        _batch(spark, 12).write.parquet(bucket)
        update_rollup(spark, bucket, rollup, GROUPS, VALUES)
        before = _rows(read_rollup(spark, rollup))
        orphan = os.path.join(rollup, "v_9999999999999_deadbeef")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "manifest.json"), "w") as fh:
            json.dump({"spec": "garbage", "files": []}, fh)
        assert _rows(read_rollup(spark, rollup)) == before

    def test_manifest_chain(self, spark, tmp_path):
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        _batch(spark, 13).write.mode("append").parquet(bucket)
        update_rollup(spark, bucket, rollup, GROUPS, VALUES)
        m1 = current_rollup_version(rollup)
        _batch(spark, 14).write.mode("append").parquet(bucket)
        update_rollup(spark, bucket, rollup, GROUPS, VALUES)
        m2 = current_rollup_version(rollup)
        assert m1["previous"] is None
        assert m2["previous"] is not None
        assert set(m1["files"]) < set(m2["files"])

    def test_read_before_first_update(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_rollup(spark, str(tmp_path / "empty"))


class TestDerive:
    def test_derived_group_column(self, spark, tmp_path):
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        _batch(spark, 21).write.parquet(bucket)

        def derive(df):
            return df.withColumn("id_band", (F.col("id") / 100).cast("long"))

        update_rollup(spark, bucket, rollup, ["id_band"], ["v"], derive=derive)
        out = {r["id_band"]: r["n_rows"] for r in read_rollup(spark, rollup).collect()}
        assert out == {0: 100, 1: 100}


class TestSketchedDistincts:
    def test_incremental_hll_equals_full(self, spark, tmp_path):
        """Distinct counts via mergeable HLL sketches: the union of
        per-batch sketches must estimate exactly what one sketch over all
        data estimates (register-wise max is order-insensitive)."""
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        for seed in (41, 42, 43):
            _batch(spark, seed).write.mode("append").parquet(bucket)
            update_rollup(
                spark, bucket, rollup, GROUPS, ["v"], distinct_cols=["id"]
            )
        got = {
            r["g"]: r["approx_distinct_id"]
            for r in read_rollup(spark, rollup).collect()
        }
        full = spark.read.option("pathGlobFilter", "*.parquet").parquet(bucket)
        want = {
            r["g"]: r["est"]
            for r in rollup_finalize(
                rollup_aggregate(full, GROUPS, [], ["id"]), GROUPS, [], ["id"]
            )
            .withColumnRenamed("approx_distinct_id", "est")
            .collect()
        }
        assert got == want
        # sanity: each batch reuses ids 0..199 with fresh random g, so a
        # group's distinct ids ~ 200*(1-(2/3)^3) ~ 141 — union semantics,
        # not the ~200 sum per batch that double-counting would give
        for est in got.values():
            assert est <= 210
        assert sum(got.values()) < 520

    def test_sketch_column_in_raw_state(self, spark, tmp_path):
        bucket = str(tmp_path / "bucket")
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        _batch(spark, 50).write.parquet(bucket)
        update_rollup(spark, bucket, rollup, GROUPS, ["v"], distinct_cols=["id"])
        raw = read_rollup(spark, rollup, finalize=False)
        assert dict(raw.dtypes)["hll_id"] == "binary"


class TestMergeAlgebra:
    def test_merge_matches_single_aggregate(self, spark):
        df = _batch(spark, 31, n=300)
        parts = [
            df.where(F.col("id") % 3 == i) for i in range(3)
        ]
        states = [rollup_aggregate(p, GROUPS, VALUES) for p in parts]
        merged = rollup_finalize(
            rollup_merge(states, GROUPS, VALUES), GROUPS, VALUES
        )
        direct = rollup_finalize(
            rollup_aggregate(df, GROUPS, VALUES), GROUPS, VALUES
        )
        assert _rows(merged) == _rows(direct)


class TestStreamingRollup:
    def test_stream_equals_batch_recompute(self, spark, tmp_path):
        """availableNow stream through foreachBatch maintenance == one-shot
        aggregate over all the data, including the HLL distinct estimates."""
        from sat_bucket_spark.rollup import stream_update_rollup

        src = str(tmp_path / "src")
        for seed in (61, 62, 63):
            _batch(spark, seed).write.mode("append").parquet(src)
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_update_rollup(
            stream,
            rollup,
            checkpoint_dir=str(tmp_path / "ckpt"),
            group_cols=GROUPS,
            value_cols=VALUES,
            distinct_cols=["id"],
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

        got = _rows(read_rollup(spark, rollup))
        full = spark.read.parquet(src)
        want = _rows(
            rollup_finalize(
                rollup_aggregate(full, GROUPS, VALUES, ["id"]),
                GROUPS,
                VALUES,
                ["id"],
            )
        )
        assert got == want

    def test_restart_does_not_double_merge(self, spark, tmp_path):
        """Re-running the drained stream on the same checkpoint must leave
        the rollup unchanged (batch-id idempotency)."""
        from sat_bucket_spark.rollup import stream_update_rollup

        src = str(tmp_path / "src")
        _batch(spark, 71).write.parquet(src)
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        schema = spark.read.parquet(src).schema
        for _ in range(2):
            q = stream_update_rollup(
                spark.readStream.schema(schema).parquet(src),
                rollup,
                checkpoint_dir=str(tmp_path / "ckpt"),
                group_cols=GROUPS,
                value_cols=VALUES,
                trigger={"availableNow": True},
            )
            q.awaitTermination(120)
        out = read_rollup(spark, rollup).collect()
        assert sum(r["n_rows"] for r in out) == 200

    def test_batch_update_rejects_stream_manifest(self, spark, tmp_path):
        from sat_bucket_spark.rollup import stream_update_rollup

        src = str(tmp_path / "src")
        _batch(spark, 81).write.parquet(src)
        rollup = str(tmp_path / "rollup")
        os.makedirs(rollup)
        schema = spark.read.parquet(src).schema
        q = stream_update_rollup(
            spark.readStream.schema(schema).parquet(src),
            rollup,
            checkpoint_dir=str(tmp_path / "ckpt"),
            group_cols=GROUPS,
            value_cols=VALUES,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        with pytest.raises(ValueError, match="stream_update_rollup"):
            update_rollup(spark, src, rollup, GROUPS, VALUES)

    def test_batch_frame_rejected(self, spark):
        from sat_bucket_spark.rollup import stream_update_rollup

        df = spark.createDataFrame([(1, "a", 1.0, 1.0)], ["id", "g", "v", "w"])
        with pytest.raises(ValueError, match="streaming"):
            stream_update_rollup(df, "/tmp/x", "/tmp/y", GROUPS, VALUES)
