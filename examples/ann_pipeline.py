#!/usr/bin/env python
"""ANN-at-scale pipeline: encode once at ingest, query from the codes table.

The production shape for embedding search over a 100 TB corpus:

1. INGEST: assign every vector a coarse IVF cluster and a PQ code — pure
   literal-codebook expressions — and persist the tiny (id, cluster, code)
   table partitioned by cluster. Raw embeddings are written once and then
   left alone.
2. QUERY: IVFADC reads ONLY the codes table (m ints per row), probes the
   query's nearest clusters via partition pruning, and ranks candidates by
   lookup-table sums. Exact re-ranking (optional) fetches raw vectors for
   the shortlist alone.

Run: python examples/ann_pipeline.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sat_bucket_spark import get_spark
from sat_bucket_spark.operators.similarity import (
    _nearest_centroid_expr,
    brute_force_topk,
    ivfpq_topk,
    pq_encode,
    train_ivf_centroids,
    train_pq_codebooks,
)

DIM = 64


def main(workdir: str) -> None:
    spark = get_spark(app_name="ann-pipeline", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )

    # --- train (driver-side, sampled, deterministic) -----------------------
    centroids = train_ivf_centroids(emb, DIM, n_clusters=8, seed=7)
    codebooks = train_pq_codebooks(emb, DIM, m=8, ksub=16, seed=11)

    # --- ingest: persist the codes table, partitioned by coarse cluster ----
    codes_dir = os.path.join(workdir, "codes")
    codes = pq_encode(
        emb.withColumn("cluster", _nearest_centroid_expr("embedding", centroids)),
        codebooks,
    ).select("vec_id", "cluster", "pq_code")
    codes.write.partitionBy("cluster").mode("overwrite").parquet(codes_dir)
    n_parts = len([d for d in os.listdir(codes_dir) if d.startswith("cluster=")])
    print(f"codes table: {codes.count()} rows across {n_parts} cluster partitions")

    # --- query: IVFADC over the corpus ------------------------------------
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = ivfpq_topk(
        emb, queries, dim=DIM, k=10, n_probe=4, centroids=centroids, codebooks=codebooks
    )
    exact = brute_force_topk(emb, queries, k=10)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    print(f"IVFADC recall@10 vs brute force: {recall:.2f}")

    # --- production recipe: wide ADC shortlist -> exact re-rank -----------
    # ADC distance is a quantized surrogate; the standard fix is a k'=50
    # shortlist from codes, then exact cosine on just those 50 vectors.
    from pyspark.sql import Window

    shortlist = ivfpq_topk(
        emb, queries, dim=DIM, k=50, n_probe=4, centroids=centroids,
        codebooks=codebooks,
    ).select("query_id", "vec_id")
    from sat_bucket_spark.operators.similarity import cosine_expr

    sv = emb.select(F.col("vec_id"), F.col("embedding").alias("__v"))
    qv = queries.select(F.col("query_id"), F.col("query_vec"))
    rer = (
        shortlist.join(sv, "vec_id").join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(cosine_expr(F.col("__v"), F.col("query_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    top = rer.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 10)
    a2 = {(r["query_id"], r["vec_id"]) for r in top.collect()}
    print(f"shortlist-50 + exact re-rank recall@10: {len(a2 & e) / len(e):.2f}")

    # --- persisted-index lifecycle: build -> nightly appends -> compact ----
    # The standing-index story: train + encode ONCE, append new batches with
    # the frozen codebooks, and periodically compact the cluster partitions
    # the appends fragmented (every probed search pays one file open per
    # append batch otherwise). Compaction rewrites only fragmented clusters
    # and leaves search results identical.
    from sat_bucket_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_index_topk,
    )

    idx_dir = os.path.join(workdir, "index")
    standing = emb.where(F.col("vec_id") % 4 != 0)
    build_ivfpq_index(standing, idx_dir, dim=DIM, n_clusters=8, m=8, ksub=16)
    for night in (1, 2, 3):  # three nightly batches
        batch = emb.where(
            (F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 3 == night % 3)
        )
        append_to_ivfpq_index(batch, idx_dir)
    before = sorted(
        tuple(r)
        for r in ivfpq_index_topk(spark, idx_dir, queries, k=10, n_probe=4).collect()
    )
    n_compacted = compact_ivfpq_index(spark, idx_dir, target_file_size="64MB")
    after = sorted(
        tuple(r)
        for r in ivfpq_index_topk(spark, idx_dir, queries, k=10, n_probe=4).collect()
    )
    assert after == before, "compaction must not change search results"
    print(f"index lifecycle: 3 appends, {n_compacted} cluster partitions "
          f"compacted, search results identical")


if __name__ == "__main__":
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ann_")
    try:
        main(work)
    finally:
        if len(sys.argv) <= 1:
            shutil.rmtree(work, ignore_errors=True)
