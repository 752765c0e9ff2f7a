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

__all__ = ["streaming_curate"]


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
