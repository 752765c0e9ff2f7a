"""Large-scale training-data pipeline operators (beyond reference parity).

Deduplication, similarity search, text analysis, and multimodal plumbing —
the operations a 100 TB data-curation pipeline runs on top of the bucket
engine. All hot paths are Column expressions (JVM-side); Python appears only
in Arrow-batched multimodal stubs.
"""

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
from sat_bucket_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    pairwise_near_duplicates,
    random_hyperplane_signature,
)
from sat_bucket_spark.operators.text import (
    add_fingerprint,
    add_language_id,
    add_quality_score,
    add_token_count,
    repetition_signals,
)

__all__ = [
    "add_fingerprint",
    "add_language_id",
    "add_quality_score",
    "add_simhash",
    "add_token_count",
    "brute_force_topk",
    "decontamination_report",
    "dedup_exact",
    "exact_duplicate_groups",
    "lsh_candidate_pairs",
    "lsh_topk",
    "minhash_lsh_dedup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "pairwise_near_duplicates",
    "random_hyperplane_signature",
    "repetition_signals",
]
