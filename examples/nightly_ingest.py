#!/usr/bin/env python
"""Nightly-ingest loop over the persisted dedup indexes — the standing-corpus
posture where the corpus is 100 TB and the nightly batch is not:

    ONE-TIME  build_bloom_index        (exact keys -> few-MB bitmap)
              build_minhash_index      (near-dup bands + 60-bit shingle sets)
              build_ivfpq_index        (embeddings -> coarse-clustered PQ codes)
    NIGHTLY   exact dedup via the Bloom index      -- ZERO corpus access
              near-dup dedup via the MinHash index -- corpus text never rescanned
              semantic dedup via the IVFPQ index   -- probed code partitions only
              stage survivors (they land in the corpus store anyway)
              append survivors to ALL indexes      -- bitmap/batch-sized
    CADENCE   compact_minhash_index    (fold append fragmentation back;
              compact_ivfpq_index       probe results pinned identical)
              compact_bm25_index
    FSCK      index_report over all four legs, scan=True — the nightly
              run FAILS on replay duplication / missing components /
              stale generations, so the healers have a standing surface
    ACCURACY  check_ivfpq_recall       (codebook-drift watch; baseline-
                                        relative retrain recommendation)
              rebuild_bloom_index      (fill > 0.5 remediation: one corpus
                                        scan at a larger width, crash-
                                        resumable generational swap)

The point: neither nightly step's cost grows with the corpus. The inline
operators (`dedup_exact_against_bloom`, `minhash_dedup_against`) re-scan the
corpus every batch — correct, but at 100 TB that is the dominant nightly
cost; the indexes pay it once at build time.

Run: python examples/nightly_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sat_bucket_spark import get_spark
from sat_bucket_spark.operators.dedup import (
    append_to_bloom_index,
    append_to_minhash_index,
    build_bloom_index,
    build_minhash_index,
    compact_minhash_index,
    dedup_exact_against_bloom_index,
    minhash_dedup_against_index,
)


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="nightly-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="nightly_ingest_")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 3 != 0)

    # ---- one-time: persist the standing corpus's dedup state ----------
    bloom_idx = os.path.join(work, "bloom_index")
    mh_idx = os.path.join(work, "minhash_index")
    build_bloom_index(corpus, bloom_idx, key_cols=["text"])
    build_minhash_index(corpus, mh_idx, n_hashes=8, n_bands=4, shingle_size=8)
    print(f"indexes built under {work}")

    # ---- a nightly batch: exact dups + near-dups + genuinely new ------
    batch = (
        corpus.where(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")  # exact dups
        .unionByName(
            docs.where(F.col("doc_id") % 3 == 0).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.when(
                    F.col("doc_id") % 6 == 0,
                    F.concat(F.col("text"), F.lit(" tail")),  # near-dups
                ).otherwise(
                    F.concat(F.lit("fresh "), F.col("doc_id"), F.lit(" unseen"))
                ).alias("text"),
            )
        )
    )
    n_batch = batch.count()

    # 1. exact gate first — cheapest, zero corpus access: the probe's only
    #    inputs are the batch and the broadcast bitmap
    after_exact = dedup_exact_against_bloom_index(batch, bloom_idx)
    n_exact = after_exact.count()

    # 2. near-dup gate — candidates from the persisted band rows, verify
    #    against the persisted shingle sets; corpus text never rescanned
    survivors = minhash_dedup_against_index(after_exact, mh_idx, min_jaccard=0.5)

    # 3. stage survivors (the corpus store write you do anyway), then let
    #    the indexes learn them — staging first is the documented contract:
    #    index appends swap files under any still-lazy probe plan
    surv_path = os.path.join(work, "accepted")
    survivors.write.parquet(surv_path)
    accepted = spark.read.parquet(surv_path)
    n_accepted = accepted.count()
    append_to_bloom_index(accepted, bloom_idx)
    append_to_minhash_index(accepted, mh_idx)
    print(
        f"nightly: {n_batch} submitted -> {n_exact} past exact gate -> "
        f"{n_accepted} accepted and appended"
    )

    # an exact re-submission of accepted docs is now rejected by the
    # FIRST (cheapest) gate — no near-dup machinery even runs
    resubmit = accepted.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    n_resub = dedup_exact_against_bloom_index(resubmit, bloom_idx).count()
    print(f"re-submission survivors through the Bloom gate alone: {n_resub}")

    # ---- maintenance cadence: fold append fragmentation back ----------
    stats = compact_minhash_index(spark, mh_idx)
    print(
        f"compaction: {stats['band_partitions']} band partitions rewritten, "
        f"shingle files {stats['shingle_files'][0]} -> {stats['shingle_files'][1]}"
    )

    # ---- the THIRD axis: semantic dedup over the embedding table ------
    # same posture, different key space: the archive's embeddings were
    # PQ-encoded once; a nightly vector batch reads only its probed
    # clusters' (id, code) partitions, never the raw corpus vectors
    from sat_bucket_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
        semantic_dedup_against_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    archive = emb.where(F.col("vec_id") % 3 != 0)
    v_idx = os.path.join(work, "ivfpq_index")
    # store_vectors=True: the refine store feeds the nightly recall watch
    # (check_ivfpq_recall) and makes retrain_ivfpq_index self-sufficient
    build_ivfpq_index(
        archive, v_idx, dim=64, n_clusters=8, m=4, ksub=16, store_vectors=True
    )
    # build-night action: record the healthy reading as the standing
    # baseline (NEVER re-record on watch nights — that ratchets the
    # reference and compound drift never trips the gate)
    from sat_bucket_spark.operators.similarity import check_ivfpq_recall

    base_watch = check_ivfpq_recall(
        spark, v_idx, n_queries=100, record_baseline=True
    )
    print(f"ivfpq baseline recorded: {base_watch['recall']:.3f} @k=10")
    vbatch = archive.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"  # exact copies
    ).unionByName(
        emb.where(F.col("vec_id") % 3 == 0).select(
            (F.col("vec_id") + 2_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),  # novel
        )
    )
    v_surv = semantic_dedup_against_index(
        vbatch, v_idx, min_cosine=0.9, n_probe=2, adc_margin=None,
        verify_vectors=archive,  # exact-cosine verify over ADC candidates
    )
    v_path = os.path.join(work, "accepted_vecs")
    v_surv.write.parquet(v_path)
    n_vb, n_vs = vbatch.count(), spark.read.parquet(v_path).count()
    append_to_ivfpq_index(spark.read.parquet(v_path), v_idx)
    n_vc = compact_ivfpq_index(spark, v_idx)
    print(
        f"semantic nightly: {n_vb} vectors submitted -> {n_vs} accepted and "
        f"appended; {n_vc} code partitions compacted"
    )

    # ---- the FOURTH leg: the retrieval index learns the same survivors -
    # decontamination-by-retrieval / quality audits probe this index
    # instead of re-tokenizing the corpus; appends are exact sums and the
    # cadence folds posting fragmentation back (probe scores pinned
    # identical across the compaction)
    from sat_bucket_spark.operators.relevance import (
        append_to_bm25_index,
        build_bm25_index,
        compact_bm25_index,
    )

    bm25_idx = os.path.join(work, "bm25_index")
    build_bm25_index(corpus, bm25_idx)
    append_to_bm25_index(accepted, bm25_idx)
    bstats = compact_bm25_index(spark, bm25_idx)
    print(
        f"bm25 leg: appended {n_accepted} docs; posting files "
        f"{bstats['posting_files'][0]} -> {bstats['posting_files'][1]}"
    )

    # ---- standing fsck: the nightly run fails loudly on index damage ---
    from sat_bucket_spark.maintenance import index_report

    for leg, idx_dir in [
        ("bloom", bloom_idx), ("minhash", mh_idx),
        ("ivfpq", v_idx), ("bm25", bm25_idx),
    ]:
        r = index_report(spark, idx_dir, scan=True)
        if (
            leg == "bloom"
            and not r["healthy"]
            and all("bitmap saturated" in i for i in r["issues"])
        ):
            # the one unhealthy state with a packaged remediation: fill
            # > 0.5 -> rebuild at a larger width (one corpus scan,
            # crash-resumable generational swap; the standing index
            # serves until the commit), then re-verify instead of failing
            from sat_bucket_spark.operators.dedup import (
                load_bloom_index,
                rebuild_bloom_index,
            )

            full_corpus = corpus.select("doc_id", "text").unionByName(
                spark.read.parquet(surv_path).select("doc_id", "text")
            )
            rebuild_bloom_index(
                spark, bloom_idx, full_corpus,
                n_bits=int(load_bloom_index(spark, bloom_idx)[0]["n_bits"]) * 4,
            )
            print("bloom leg: saturated -> rebuilt at 4x width")
            r = index_report(spark, idx_dir, scan=True)
        if not r["healthy"]:
            raise SystemExit(f"nightly fsck: {leg} leg unhealthy: {r['issues']}")
        print(f"fsck {leg}: healthy ({r['components']})")
        if leg == "bloom":
            # the fill/FP reading rides the same scan=True report — no
            # second bitmap scan needed for the watch line
            print(f"bloom fill watch: {r['fill_factor']:.3f}")

    # ---- accuracy watch (r15): fsck sees STRUCTURE; this sees what
    # structure can't — recall drift against the build-night baseline
    # recorded above. Tonight's appends sit between the two readings, so
    # a drifted batch is exactly what would trip the recommendation.
    watch = check_ivfpq_recall(spark, v_idx, n_queries=100)
    print(
        f"ivfpq recall watch: {watch['recall']:.3f} @k={watch['k']} vs "
        f"baseline {watch['baseline']} ({watch['baseline_source']}) — "
        f"retrain_recommended={watch['retrain_recommended']}"
    )
    if watch["retrain_recommended"]:
        from sat_bucket_spark.operators.similarity import retrain_ivfpq_index

        retrain_ivfpq_index(spark, v_idx)
        check_ivfpq_recall(spark, v_idx, n_queries=100, record_baseline=True)
        print("ivfpq recall watch: retrained and baseline re-recorded")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
