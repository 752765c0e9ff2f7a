#!/usr/bin/env python
"""Training-data curation pipeline over the documents/embeddings tables:

    normalize + PII-redact -> quality filter -> fingerprint dedup ->
    MinHash-LSH near-dup clustering (connected components, keep-lowest-id) ->
    deterministic train/val/test split -> chunk -> pack into context bins ->
    vocabulary + language stats, plus embedding near-dup detection on the
    vectors side.

Every stage is a Column-expression plan (no Python UDFs); run:

    python examples/training_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sat_bucket_spark import get_spark
from sat_bucket_spark.operators.chunking import chunk_documents
from sat_bucket_spark.operators.dedup import dedup_exact, minhash_lsh_dedup_pairs
from sat_bucket_spark.operators.graph import near_duplicate_clusters
from sat_bucket_spark.operators.packing import pack_sequences
from sat_bucket_spark.operators.pii import redact_pii
from sat_bucket_spark.operators.sampling import assign_splits
from sat_bucket_spark.operators.similarity import lsh_near_dup_pairs
from sat_bucket_spark.operators.text import (
    add_fingerprint,
    add_language_id,
    add_quality_score,
    add_token_count,
    normalize_text,
    vocabulary,
)


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="training-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. ingestion hygiene: canonical text + PII scrubbing, both map-only
    docs = redact_pii(normalize_text(docs))

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

    # 3. near-dup removal: MinHash -> LSH banding -> exact verify -> connected
    #    components. Clustering (not pairwise loser-dropping) is what makes the
    #    policy transitive: A~B and B~C keeps exactly one of {A,B,C}.
    pairs = minhash_lsh_dedup_pairs(docs, min_jaccard=0.5)
    losers = near_duplicate_clusters(pairs.select("id_a", "id_b")).where(
        ~F.col("is_kept")
    ).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. deterministic content-keyed split (stable under re-ingest)
    docs = assign_splits(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    split_counts = dict(docs.groupBy("split").count().collect())

    # 5. chunk long documents and pack chunks into fixed-capacity bins
    train = docs.where(F.col("split") == "train")
    chunks = chunk_documents(train, chunk_size=256, overlap=32)
    sized = chunks.select(
        F.concat_ws("_", "doc_id", "chunk_id").alias("chunk_key"),
        F.length("chunk").cast("long").alias("n_chars"),
    )
    packed = pack_sequences(
        sized, id_col="chunk_key", size_col="n_chars", capacity=2048, n_groups=16
    )
    n_bins = packed.select("group", "bin").distinct().count()

    # 6. corpus stats on the surviving train set
    vocab = vocabulary(train, top_k=10).collect()

    # 7. embedding-side near-dup detection (bucketed LSH + exact cosine verify)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    near = lsh_near_dup_pairs(emb, dim=64, threshold=0.3, n_bands=2).count()

    # 8. round-3 curation stages: per-language quantile filter, domain cap,
    #    trained NB scoring, content-defined chunk dedup
    from sat_bucket_spark.operators.chunking import chunk_documents_cdc
    from sat_bucket_spark.operators.classify import (
        score_with_token_weights,
        train_token_classifier,
    )
    from sat_bucket_spark.operators.sampling import (
        cap_per_group,
        filter_by_group_quantile,
    )

    scored = add_quality_score(docs)
    q60 = filter_by_group_quantile(
        scored, "quality_score", 0.4, group_cols=["lang"], id_col="doc_id"
    )
    capped = cap_per_group(q60, ["source"], 40, "doc_id")
    labeled = docs.withColumn("is_en", (F.col("lang") == "en").cast("int"))
    weights, prior = train_token_classifier(labeled, "is_en")
    nb = score_with_token_weights(capped, weights, prior=prior)
    n_cdc = chunk_documents_cdc(capped).count()
    print(
        f"quantile-filter {q60.count()} -> domain-cap {capped.count()}"
        f" | NB-scored {nb.count()} | CDC chunks {n_cdc}"
    )

    # Round-4 stages: multi-benchmark leak check in one scan, Bloom-routed
    # incremental dedup against a standing corpus, token-budget mixture.
    from sat_bucket_spark.operators.dedup import (
        decontamination_report_multi,
        dedup_exact_against_bloom,
    )
    from sat_bucket_spark.operators.sampling import mix_sources

    evs = {
        "benchA": docs.where(F.col("doc_id") % 10 == 0),
        "benchB": docs.where(F.col("doc_id") % 10 == 1),
    }
    leaks = decontamination_report_multi(
        docs.where(F.col("doc_id") % 10 > 1), evs, threshold=0.3
    )
    n_leaked = leaks.where("is_contaminated").count()
    standing = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1)
    fresh = dedup_exact_against_bloom(incoming, standing, ["text"])
    tokened = add_token_count(docs)
    mixture = mix_sources(
        tokened,
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        id_col="doc_id",
        mass_col="n_tokens",
    )
    mix_mass = {
        r["source"]: r["sum(n_tokens)"]
        for r in mixture.groupBy("source").sum("n_tokens").collect()
    }
    print(
        f"leaked doc-benchmark pairs: {n_leaked}"
        f" | bloom-routed fresh batch rows: {fresh.count()}"
        f" | token-mixture mass: {mix_mass}"
    )

    # final hand-off: deterministic gzipped JSONL shards for the trainer
    import tempfile

    from sat_bucket_spark.writers import write_jsonl_shards

    export = tempfile.mkdtemp(prefix="train_export_") + "/shards"
    write_jsonl_shards(mixture.select("doc_id", "text", "source"), export, n_shards=8)
    spark_ = mixture.sparkSession
    n_exported = spark_.read.option("basePath", export).json(export + "/shard=*").count()

    print(f"documents: {n0} -> quality {n1} -> exact-dedup {n2} -> near-dedup {n3}")
    print(f"splits: {split_counts}")
    print(f"train chunks: {packed.count()} packed into {n_bins} bins")
    print("top tokens:", [(r["token"], r["doc_freq"]) for r in vocab])
    print(f"embedding near-dup pairs (cos>=0.3): {near}")
    print(f"exported {n_exported} mixture rows as 8 JSONL shards at {export}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
