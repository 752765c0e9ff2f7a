"""ensure_parallelism: metadata-only decisions, no RDD plan conversion."""

from __future__ import annotations

from pyspark.sql import functions as F

from sat_bucket_spark.operators.parallel import ensure_parallelism


def _n_partitions(df):
    # test-side observation only (the operator itself must not touch .rdd)
    return df.rdd.getNumPartitions()


class TestEnsureParallelism:
    def test_single_small_file_is_spread(self, spark, tmp_path):
        p = str(tmp_path / "one")
        spark.range(1000).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        assert _n_partitions(df) == 1
        out = ensure_parallelism(df)
        assert _n_partitions(out) >= max(spark.sparkContext.defaultParallelism // 2, 2)
        assert out.count() == 1000

    def test_many_files_untouched(self, spark, tmp_path):
        import math

        max_bytes = 128 * 1024 * 1024
        open_cost = 4 * 1024 * 1024
        target = spark.sparkContext.defaultParallelism
        need = math.ceil(max(target // 2, 2) * (max_bytes / open_cost))
        p = str(tmp_path / "many")
        spark.range(need).repartition(need).write.parquet(p)
        df = spark.read.parquet(p)
        assert ensure_parallelism(df) is df  # packing bound short-circuits

    def test_few_large_local_files_untouched(self, spark, tmp_path, monkeypatch):
        # shrink maxPartitionBytes so a single modest file counts as "large"
        p = str(tmp_path / "big")
        spark.range(200_000).select(
            F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("s")
        ).coalesce(1).write.parquet(p)
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64KB")
        try:
            df = spark.read.parquet(p)
            # size bound: one multi-MB file / 64KB >> threshold -> already parallel
            assert ensure_parallelism(df) is df
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_non_file_source_untouched(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
        assert ensure_parallelism(df) is df

    def test_no_operator_module_touches_rdd(self):
        import pathlib
        import re

        # caching.py's release_stage_cache reads the JVM plan's RDD handle
        # to unpersist localCheckpoint blocks — storage management, not a
        # DataFrame->RDD data path, which is what this guard forbids
        allowed = {"caching.py"}
        pkg = pathlib.Path(__file__).parent.parent / "sat_bucket_spark"
        offenders = []
        for f in pkg.rglob("*.py"):
            if f.name in allowed:
                continue
            if re.search(r"\.rdd\b", f.read_text()):
                offenders.append(str(f))
        assert offenders == []
