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

__all__ = [
    "cdc_boundaries_expr",
    "chunk_documents",
    "chunk_documents_cdc",
    "chunk_offsets_expr",
]


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


def _window_hash_terms(base: int, window: int, mod: int) -> list[int]:
    """Precomputed ``base^j % mod`` multipliers for the window polynomial."""
    return [pow(base, j, mod) for j in range(window)]


def cdc_boundaries_expr(
    text: Column | str,
    window: int = 8,
    mask: int = 63,
    base: int = 257,
    mod: int = 1_000_000_007,
) -> Column:
    """Content-defined cut points (1-based char positions) of a document.

    A cut is placed after position ``i + window - 1`` whenever the
    polynomial hash of the ``window`` chars starting at ``i`` satisfies
    ``h % (mask+1) == 0`` — the FastCDC/rsync boundary rule. Expected chunk
    length is ~``mask+1`` chars. Because the decision depends only on a
    local window, an insertion early in a document shifts boundaries only
    until the next cut — unlike fixed-size chunking, where every later
    chunk changes — so chunk-level dedup survives edits.

    Engine-portable by construction: ``h = sum_j code(c[i+j]) * base^j %
    mod`` with literal multipliers, identical arithmetic in DuckDB. The char
    codes are bound once per row (HOF lambda-variable pattern); each
    position costs ``window`` multiply-adds.
    """
    t = F.col(text) if isinstance(text, str) else text
    terms = _window_hash_terms(base, window, mod)
    codes = F.transform(F.split(t, ""), lambda c: F.ascii(c))

    def hash_at(cs: Column, i: Column) -> Column:
        h = None
        for j, mult in enumerate(terms):
            term = F.element_at(cs, (i + F.lit(j)).cast("int")).cast("long") * F.lit(
                mult
            )
            h = term if h is None else h + term
        return h % F.lit(mod)

    def positions(cs: Column) -> Column:
        # Documents shorter than the window have no positions. sequence()
        # with stop < start infers a DESCENDING range, so clamp the stop to 1
        # and guard each element instead; the inner when() evaluates the
        # window hash only when the position is valid (no out-of-bounds
        # element_at on short docs).
        n_pos = F.size(cs) - F.lit(window - 1)
        return F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_pos, F.lit(1))),
                lambda i: F.when(
                    i <= n_pos,
                    F.when(
                        hash_at(cs, i) % F.lit(mask + 1) == 0,
                        (i + F.lit(window - 1)).cast("long"),
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        )

    return F.element_at(F.transform(F.array(codes), positions), 1)


def chunk_documents_cdc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    mask: int = 63,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents at content-defined boundaries; one row per chunk.

    Returns ``(id, chunk_id, n_chunks, chunk)`` (+ ``keep_cols``). Cut
    points come from :func:`cdc_boundaries_expr`; the text is sliced
    between consecutive cuts (document start and end are implicit bounds,
    so every document yields >= 1 chunk and chunks concatenate back to the
    original text). Map-only 1->N fan-out like :func:`chunk_documents` —
    no shuffle, scales with scan bandwidth; downstream exact-hash dedup of
    chunks removes repeated spans that survive document-level dedup.
    """
    t = F.col(text_col)
    # A boundary at the exact document end would duplicate the implicit
    # final cut; filter it rather than array_distinct (DuckDB's list_distinct
    # does not preserve order, so the oracle could not mirror a distinct).
    cuts = F.concat(
        F.array(F.lit(0).cast("long")),
        F.filter(
            cdc_boundaries_expr(t, window=window, mask=mask),
            lambda x: x < F.length(t).cast("long"),
        ),
        F.array(F.length(t).cast("long")),
    )
    keep = list(keep_cols or [])
    # Stage text + cut points once; explode the chunk ORDINAL; derive the
    # substring after the explode (same shape as chunk_documents: the explode
    # carries one small array per row, never per-chunk text copies; map-only).
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        t.alias("__src"),
        cuts.alias("__b"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        "__src",
        "__b",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("__b") - F.lit(1), F.lit(1)))
        ).alias("__i"),
    )
    lo = F.element_at(F.col("__b"), F.col("__i").cast("int"))
    hi = F.coalesce(
        F.element_at(F.col("__b"), (F.col("__i") + F.lit(1)).cast("int")), lo
    )
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        (F.col("__i") - F.lit(1)).cast("long").alias("chunk_id"),
        F.greatest(F.size("__b") - F.lit(1), F.lit(1)).cast("long").alias("n_chunks"),
        F.col("__src").substr((lo + F.lit(1)).cast("int"), (hi - lo).cast("int")).alias("chunk"),
    )
