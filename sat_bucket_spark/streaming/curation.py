"""Continuous corpus curation over Structured Streaming.

The batch curation operators (normalize, PII redaction, quality/token
stats, fingerprinting) are pure Column expressions, so they lift to
``readStream`` sources unchanged — this module packages the standard
continuous-ingest pipeline:

    raw documents -> normalize -> redact PII -> quality + token stats
        -> fingerprint -> watermark-bounded exact dedup

State: ONLY the dedup step keeps state (fingerprints within the watermark
window); everything upstream is stateless map work, so the pipeline
backpressures on scan/regex throughput and restarts from the checkpoint
with no recomputation. This is the shape of a crawl-ingest feed at scale:
late-arriving duplicates inside the watermark are dropped exactly, older
re-crawls are handled by the periodic batch dedup over the archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.pii import redact_pii
from sat_bucket_spark.operators.text import (
    add_fingerprint,
    add_quality_score,
    add_token_count,
    normalize_text,
)
from sat_bucket_spark.streaming.sessions import streaming_dedup_exact

__all__ = ["stream_dedup_against_indexes", "streaming_curate"]


def streaming_curate(
    stream: DataFrame,
    text: str = "text",
    time: str = "time",
    watermark: str = "1 hour",
    min_quality: float | None = None,
    redact: bool = True,
) -> DataFrame:
    """Continuous curation: normalize -> redact -> score -> dedup.

    Returns the curated stream with ``text`` rewritten (normalized,
    PII-redacted), plus ``n_tokens``, ``quality_score``, ``fingerprint``
    columns; duplicate fingerprints within the watermark are dropped
    (first-seen wins). ``min_quality`` optionally filters low-quality rows
    before they reach dedup state — cheaper than filtering downstream.
    """
    out = normalize_text(stream, text=text)
    if redact:
        out = redact_pii(out, text=text)
    out = add_token_count(out, text=text)
    out = add_quality_score(out, text=text)
    if min_quality is not None:
        out = out.where(F.col("quality_score") >= F.lit(float(min_quality)))
    out = add_fingerprint(out, text=text)
    return streaming_dedup_exact(out, ["fingerprint"], time=time, watermark=watermark)


def stream_dedup_against_indexes(
    stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    bloom_index_dir: str | None = None,
    minhash_index_dir: str | None = None,
    min_jaccard: float = 0.1,
    learn: bool = False,
    trigger: dict | None = None,
):
    """Continuous dedup against the STANDING ARCHIVE via the persisted
    indexes — the piece :func:`streaming_curate` explicitly defers
    ("older re-crawls are handled by the periodic batch dedup"): its
    watermark-bounded state catches duplicates within the window; this
    gate catches duplicates of the whole 100 TB corpus, because the
    probe's inputs are the micro-batch plus a few-MB Bloom bitmap and
    the batch-bounded MinHash index candidates — never the corpus.

    Per micro-batch (``foreachBatch``):

    1. exact gate: :func:`~sat_bucket_spark.operators.dedup.
       dedup_exact_against_bloom_index` on the text (zero corpus access;
       the filter's sized FP rate over-drops, the safe direction);
    2. near-dup gate: :func:`~sat_bucket_spark.operators.dedup.
       minhash_dedup_against_index` on what survives;
    3. survivors land in ``sink_dir/batch=<id>`` via per-batch dynamic
       overwrite — a REPLAYED batch (foreachBatch is at-least-once)
       rewrites its own partition instead of appending duplicates, so the
       sink is exactly-once by construction;
    4. with ``learn=True``, the STAGED survivors (re-read from the sink —
       the index-append lazy-reader contract) are appended to both
       indexes, so a duplicate arriving in a LATER micro-batch is dropped
       by the standing state, not just by the watermark window. Replays
       are correctness-safe here too: Bloom appends are idempotent (OR),
       and duplicate MinHash band/shingle rows only add redundant
       candidates — candidate sets are DISTINCT and survivors come from a
       left-anti join, so probe results are unchanged (only fragmentation
       grows; :func:`compact_minhash_index` reclaims it).

    Within-batch duplicates are NOT this gate's job — compose
    :func:`streaming_curate` (fingerprint dedup) upstream. Returns the
    started StreamingQuery; at least one index dir is required.

    Trigger-frequency economics: the Bloom gate's per-batch cost is
    corpus-size-INDEPENDENT (fixed-size bitmap), but the MinHash gate
    scans the index's 3-column bands table once per probe — measured
    sub-linear but growing (probe 2.8 s at 1x corpus -> 5.0 s at 10x on
    the standing sf1 rows). Size the trigger so batches amortize that
    scan (availableNow / minutes-level micro-batches for big corpora,
    not per-second triggers); the Bloom-first ordering already keeps
    exact dups out of the MinHash gate's input for free.
    """
    if bloom_index_dir is None and minhash_index_dir is None:
        raise ValueError("at least one of bloom/minhash index dirs is required")

    from sat_bucket_spark.operators.dedup import (
        append_to_bloom_index,
        append_to_minhash_index,
        dedup_exact_against_bloom_index,
        minhash_dedup_against_index,
    )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        surv = batch_df
        if bloom_index_dir is not None:
            surv = dedup_exact_against_bloom_index(surv, bloom_index_dir)
        if minhash_index_dir is not None:
            surv = minhash_dedup_against_index(
                surv, minhash_index_dir, min_jaccard=min_jaccard
            )
        # idempotent sink: the batch owns its partition; a replay
        # overwrites it rather than appending a second copy
        batch_sink = f"{sink_dir}/batch={batch_id}"
        surv.write.mode("overwrite").parquet(batch_sink)
        if learn:
            staged = spark.read.parquet(batch_sink)
            if staged.isEmpty():
                return
            if bloom_index_dir is not None:
                append_to_bloom_index(staged, bloom_index_dir)
            if minhash_index_dir is not None:
                append_to_minhash_index(staged, minhash_index_dir)

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
