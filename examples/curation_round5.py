#!/usr/bin/env python
"""Round-5 curation additions in one pipeline over documents/embeddings:

    profile the table -> diagnose key skew -> repair mojibake ->
    robust (median/MAD) length outlier filter -> PassJoin edit-distance
    dedup -> learn real BPE merges + token budgets -> kNN neighbor graph
    (corpus x corpus, no broadcast side) -> incremental rollup of the
    curated stats (versioned continuous aggregate).

Run:

    python examples/curation_round5.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sat_bucket_spark import get_spark
from sat_bucket_spark.operators.bpe import apply_bpe, learn_bpe_merges
from sat_bucket_spark.operators.dedup import edit_distance_pairs
from sat_bucket_spark.operators.profiling import key_skew_report, profile_columns
from sat_bucket_spark.operators.robust import mad_outlier_filter
from sat_bucket_spark.operators.similarity import knn_join
from sat_bucket_spark.operators.text import add_token_count, repair_mojibake
from sat_bucket_spark.rollup import read_rollup, update_rollup


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="curation-round5-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. look before you shuffle: one-pass profile + hot-key check
    profile_columns(docs, ["doc_id", "lang", "source", "n_chars"]).show(
        truncate=False
    )
    key_skew_report(docs, ["source"], top=5).show()

    # 2. byte hygiene: unwind double-encoded UTF-8 before anything hashes text
    docs = repair_mojibake(docs)

    # 3. robust length filter: median/MAD per language survives the one
    #    10 MB page that would stretch a mean/sigma cut into uselessness
    docs = add_token_count(docs)
    kept = mad_outlier_filter(docs, "n_tokens", by="lang", threshold=3.5)
    print(f"robust length filter: {docs.count()} -> {kept.count()} docs")

    # 4. typo-level dedup: pairs MinHash can't see (edit distance <= 2)
    pairs = edit_distance_pairs(kept, max_distance=2)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = kept.join(F.broadcast(drop), "doc_id", "left_anti")
    print(f"edit-distance dedup: dropped {drop.count()} near-identical docs")

    # 5. real token budgets: learn BPE on the surviving corpus, count subwords
    merges = learn_bpe_merges(kept, n_merges=500, max_words=20_000)
    budgets = apply_bpe(kept, merges, count_only=True)
    budgets.agg(
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.round(F.avg("n_bpe_tokens"), 1).alias("mean_per_doc"),
    ).show()

    # 6. similarity graph at corpus scale: every embedding's top-3 neighbors,
    #    both sides distributed (shuffled cell join, nothing broadcast)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    graph = knn_join(
        emb.selectExpr("vec_id as query_id", "embedding as query_vec"),
        emb,
        dim=64,
        k=3,
        n_clusters=8,
        n_probe=2,
        exclude_self=True,
    )
    print(f"kNN graph edges: {graph.count()}")

    # 7. continuous aggregate: maintain per-(lang, source) stats of the
    #    curated corpus incrementally — only NEW files are ever rescanned
    with tempfile.TemporaryDirectory() as work:
        bucket = f"{work}/curated"
        kept.write.parquet(bucket)
        rollup_dir = f"{work}/rollup"
        os.makedirs(rollup_dir)
        n = update_rollup(
            spark, bucket, rollup_dir,
            group_cols=["lang", "source"],
            value_cols=["n_tokens"],
            distinct_cols=["doc_id"],
        )
        print(f"rollup: incorporated {n} files")
        read_rollup(spark, rollup_dir).orderBy("lang", "source").show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
