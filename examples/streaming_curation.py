#!/usr/bin/env python
"""Continuous corpus curation demo: documents land as parquet micro-batches
in a drop directory; the stream normalizes, redacts PII, scores quality, and
deduplicates on content fingerprint within the watermark — only the dedup
stage is stateful. Run:

    python examples/streaming_curation.py [sf_dir]
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sat_bucket_spark import get_spark
from sat_bucket_spark.streaming.curation import streaming_curate


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="streaming-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_curation_")
    drop = os.path.join(work, "drop")
    os.makedirs(drop)
    try:
        # Stage "crawl" micro-batches from the documents table: second batch
        # re-delivers half of the first (the duplicate-delivery failure mode
        # continuous ingest must absorb).
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
            "time", F.lit(datetime.datetime(2024, 1, 1)) + F.make_interval(secs=F.col("doc_id"))
        )
        docs.where(F.col("doc_id") % 2 == 0).write.parquet(os.path.join(drop, "b0"))
        docs.where(F.col("doc_id") % 4 == 0).write.parquet(os.path.join(drop, "b1"))
        docs.where(F.col("doc_id") % 2 == 1).write.parquet(os.path.join(drop, "b2"))

        schema = spark.read.parquet(os.path.join(drop, "b0")).schema
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(drop)
        curated = streaming_curate(stream, watermark="1 hour", min_quality=0.2)
        q = (
            curated.writeStream.format("memory")
            .queryName("curated")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        total_in = docs.count() + docs.where(F.col("doc_id") % 4 == 0).count()
        out = spark.table("curated")
        n_out = out.count()
        n_unique = out.select("fingerprint").distinct().count()
        print(f"delivered rows (with re-delivery): {total_in}")
        print(f"curated unique documents: {n_out} (fingerprints: {n_unique})")
        assert n_out == n_unique, "watermark dedup must leave no duplicate fingerprints"
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
