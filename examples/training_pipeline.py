#!/usr/bin/env python
"""Training-data curation pipeline over the documents/embeddings tables:

    quality filter -> fingerprint dedup -> MinHash-LSH near-dup removal ->
    deterministic train/val/test split -> vocabulary + language stats,
    plus embedding near-dup detection on the vectors side.

Every stage is a Column-expression plan (no Python UDFs); run:

    python examples/training_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sat_bucket_spark import get_spark
from sat_bucket_spark.operators.dedup import dedup_exact, minhash_lsh_dedup_pairs
from sat_bucket_spark.operators.sampling import assign_splits
from sat_bucket_spark.operators.similarity import lsh_near_dup_pairs
from sat_bucket_spark.operators.text import (
    add_fingerprint,
    add_language_id,
    add_quality_score,
    add_token_count,
    vocabulary,
)


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="training-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality + language annotation, low-quality filter
    docs = add_language_id(add_quality_score(add_token_count(docs)))
    docs = docs.where((F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 5))
    n1 = docs.count()

    # 2. exact dedup on the normalization fingerprint (keep min doc_id).
    # Cache here: every later stage (near-dup join, split counts, vocabulary)
    # is an action over this lineage — without the cache each one would re-run
    # quality scoring + the dedup window from the scan.
    docs = dedup_exact(add_fingerprint(docs), ["fingerprint"], id_col="doc_id").cache()
    n2 = docs.count()

    # 3. near-dup removal: MinHash signatures -> LSH banding -> exact verify;
    #    drop the higher id of each confirmed pair
    pairs = minhash_lsh_dedup_pairs(docs, min_jaccard=0.5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. deterministic content-keyed split (stable under re-ingest)
    docs = assign_splits(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    split_counts = dict(docs.groupBy("split").count().collect())

    # 5. corpus stats on the surviving train set
    train = docs.where(F.col("split") == "train")
    vocab = vocabulary(train, top_k=10).collect()

    # 6. embedding-side near-dup detection (bucketed LSH + exact cosine verify)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    near = lsh_near_dup_pairs(emb, dim=64, threshold=0.3, n_bands=2).count()

    print(f"documents: {n0} -> quality {n1} -> exact-dedup {n2} -> near-dedup {n3}")
    print(f"splits: {split_counts}")
    print("top tokens:", [(r["token"], r["doc_freq"]) for r in vocab])
    print(f"embedding near-dup pairs (cos>=0.3): {near}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
