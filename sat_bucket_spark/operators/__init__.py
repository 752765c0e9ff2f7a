"""Large-scale training-data pipeline operators (beyond reference parity).

Deduplication, similarity search, text analysis, and multimodal plumbing —
the operations a 100 TB data-curation pipeline runs on top of the bucket
engine. All hot paths are Column expressions (JVM-side); Python appears only
in Arrow-batched multimodal stubs.
"""

from sat_bucket_spark.operators.chunking import chunk_documents
from sat_bucket_spark.operators.clustering import assign_clusters, kmeans_fit
from sat_bucket_spark.operators.dedup import (
    add_simhash,
    decontamination_report,
    dedup_exact,
    exact_duplicate_groups,
    lsh_candidate_pairs,
    minhash_lsh_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from sat_bucket_spark.operators.graph import (
    connected_components,
    near_duplicate_clusters,
    update_connected_components,
    update_pagerank,
)
from sat_bucket_spark.operators.packing import pack_sequences
from sat_bucket_spark.operators.relevance import bm25_scores, inverted_index, tf_idf_scores
from sat_bucket_spark.operators.pii import add_pii_counts, pii_summary, redact_pii
from sat_bucket_spark.operators.sampling import (
    assign_splits,
    hash_sample,
    stratified_hash_sample,
)
from sat_bucket_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    heavy_hitters,
)
from sat_bucket_spark.operators.similarity import (
    brute_force_topk,
    dedupe_ivfpq_index,
    lsh_topk,
    pairwise_near_duplicates,
    random_hyperplane_signature,
    semantic_dedup_against_index,
)
from sat_bucket_spark.operators.text import (
    add_fingerprint,
    add_language_id,
    add_quality_score,
    add_token_count,
    normalize_text,
    repetition_signals,
    vocabulary,
)

__all__ = [
    "add_fingerprint",
    "add_language_id",
    "add_pii_counts",
    "add_quality_score",
    "add_simhash",
    "add_token_count",
    "approx_distinct",
    "approx_quantiles",
    "assign_clusters",
    "assign_splits",
    "bm25_scores",
    "brute_force_topk",
    "chunk_documents",
    "connected_components",
    "decontamination_report",
    "dedup_exact",
    "dedupe_ivfpq_index",
    "exact_duplicate_groups",
    "hash_sample",
    "heavy_hitters",
    "inverted_index",
    "kmeans_fit",
    "lsh_candidate_pairs",
    "lsh_topk",
    "minhash_lsh_dedup_pairs",
    "minhash_signatures",
    "near_duplicate_clusters",
    "ngram_jaccard_pairs",
    "normalize_text",
    "pack_sequences",
    "pairwise_near_duplicates",
    "pii_summary",
    "random_hyperplane_signature",
    "redact_pii",
    "repetition_signals",
    "semantic_dedup_against_index",
    "stratified_hash_sample",
    "tf_idf_scores",
    "update_connected_components",
    "update_pagerank",
    "vocabulary",
]
