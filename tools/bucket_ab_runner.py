#!/usr/bin/env python
"""One timed run of the bucket family (write / read / merge / stream_ingest)
from an arbitrary checkout — the code-vs-code receipt harness for the
r12 verdict's reproduced bucket-family drift (What's wrong #2).

Usage: python tools/bucket_ab_runner.py <repo_path> [sf_dir]
Prints ONE JSON line with the four timings. Run in a FRESH process per
measurement (alternating checkouts) so JIT/page-cache state cannot favor
one side; tools/bucket_ab.py orchestrates the interleaving.

The stage logic mirrors bench.py's bucket block exactly (public API only,
stable since r11): ingest -> extent/polygon reads -> temporal merge ->
availableNow streaming ingest + compaction with the integrity gate.
"""
import json
import os
import shutil
import sys
import tempfile
import time

repo = os.path.abspath(sys.argv[1])
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from sat_bucket_spark import (  # noqa: E402
    LonLatPartitioning,
    get_spark,
    merge_granule_buckets,
    read,
    write_bucket,
)
from sat_bucket_spark.streaming.ingest import stream_write_bucket  # noqa: E402

import importlib  # noqa: E402

entry_mod = importlib.import_module("__spark_entry__")

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name="bucket-ab", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")

timings = {}
work = tempfile.mkdtemp(prefix="bucket_ab_")
try:
    ev = entry_mod._with_coords(entry_mod._events(spark, sf_dir)).withColumnRenamed(
        "ts", "time"
    )
    p = LonLatPartitioning(size=(10, 10))
    bucket = f"{work}/bucket"
    merged = f"{work}/merged"
    t0 = time.perf_counter()
    write_bucket(ev, bucket, p, x="lon", y="lat")
    timings["bucket_write"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    read(spark, bucket, extent=[-20, 40, 0, 30]).count()
    timings["bucket_read_extent"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    merge_granule_buckets(spark, bucket, merged, temporal_partitioning="month")
    timings["bucket_merge"] = round(time.perf_counter() - t0, 3)

    src = f"{work}/stream_src"
    ev.repartition(4).write.parquet(src)
    n_src = spark.read.parquet(src).count()
    sbucket = f"{work}/stream_bucket"
    smerged = f"{work}/stream_merged"
    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_write_bucket(
        stream, sbucket, p, checkpoint_dir=f"{work}/ckpt",
        x="lon", y="lat", trigger={"availableNow": True}, repartition=8,
    )
    q.awaitTermination()
    merge_granule_buckets(spark, sbucket, smerged, temporal_partitioning="month")
    timings["bucket_stream_ingest"] = round(time.perf_counter() - t0, 3)
    n_stream = spark.read.parquet(sbucket).count()
    if n_stream != n_src:
        raise AssertionError(f"integrity: src={n_src} stream={n_stream}")
finally:
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()

print(json.dumps({"repo": repo, **timings}))
