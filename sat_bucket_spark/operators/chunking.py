"""Document chunking for training pipelines.

Long documents must be split into model-context-sized pieces before
tokenization; retrieval corpora additionally want overlapping windows so no
span straddles a chunk boundary unseen. This is a 1->N row fan-out with
pure-expression offsets:

    sequence(start offsets) -> transform(substr) -> posexplode

— all JVM-side (codegen), no UDF, no shuffle: chunking is a map-only
operator, so on 100 TB it scales with scan bandwidth and the output
partitioning is inherited from the input (each chunk stays on the worker
that read its document — exactly what the downstream tokenize/pack stage
wants).

Character-window chunking is the deterministic, engine-portable baseline
(DuckDB replays it with generate_series + substr). Word-window chunking
composes the same machinery over the token array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.text import tokens_expr

__all__ = ["chunk_documents", "chunk_offsets_expr"]


def chunk_offsets_expr(total_len: Column, chunk_size: int, stride: int) -> Column:
    """1-based start offsets covering [1, total_len] with the given stride.

    Empty input yields one offset (1) so every document produces >= 1 chunk
    (an empty chunk for an empty document — rows are never silently lost).
    The last window may be shorter than ``chunk_size``; a final stride that
    would start past the end is not emitted.
    """
    n_chunks = F.greatest(
        F.ceil((total_len - F.lit(chunk_size)) / F.lit(float(stride))).cast("long")
        + F.lit(1),
        F.lit(1),
    )
    return F.sequence(
        F.lit(0), n_chunks - F.lit(1), F.lit(1)
    ).cast("array<long>").alias("__chunk_ids")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 512,
    overlap: int = 0,
    unit: str = "char",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents into (overlapping) windows; one output row per chunk.

    Returns ``(id, chunk_id, n_chunks, chunk)`` (+ ``keep_cols`` passed
    through). ``chunk_id`` is 0-based and dense per document; ``overlap`` is
    how many units consecutive chunks share (stride = chunk_size - overlap).

    ``unit='char'`` windows raw characters — deterministic and replayable on
    any engine. ``unit='word'`` windows whitespace tokens and rejoins with a
    single space (normalizing intra-chunk whitespace, the standard
    pre-tokenization contract).
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size), got {overlap}")
    stride = chunk_size - overlap
    keep = list(keep_cols or [])

    if unit == "char":
        src = F.col(text_col)
        total = F.length(src)
    elif unit == "word":
        src = tokens_expr(text_col)
        total = F.size(src)
    else:
        raise ValueError(f"invalid unit {unit!r}; use 'char' or 'word'")

    # Stage source + length once; chunk_id explodes; the chunk substring is
    # derived from (chunk_id, staged source) after the explode so the explode
    # carries one small array, not per-chunk copies of the text.
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        src.alias("__src"),
        total.cast("long").alias("__len"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        "__src",
        "__len",
        F.explode(chunk_offsets_expr(F.col("__len"), chunk_size, stride)).alias(
            "chunk_id"
        ),
    )
    start = (F.col("chunk_id") * F.lit(stride) + F.lit(1)).cast("int")
    if unit == "char":
        chunk = F.col("__src").substr(start, F.lit(chunk_size))
    else:
        chunk = F.concat_ws(" ", F.slice(F.col("__src"), start, F.lit(chunk_size)))
    n_chunks = F.greatest(
        F.ceil((F.col("__len") - F.lit(chunk_size)) / F.lit(float(stride))).cast("long")
        + F.lit(1),
        F.lit(1),
    )
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col("chunk_id"),
        n_chunks.alias("n_chunks"),
        chunk.alias("chunk"),
    )
