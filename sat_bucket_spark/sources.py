"""Corpus sources: document tables from parquet / JSONL / CSV / raw text.

The bucket archive side of the engine is parquet-native; the curation side
ingests whatever a crawl or vendor drop ships. These readers normalize any
of the common document-corpus formats into the canonical documents frame
``(doc_id, text, ...metadata)`` so every downstream operator (dedup,
quality, chunking, packing) is format-agnostic.

All formats map to Spark's built-in distributed sources — splittable,
predicate/projection-aware where the format allows — plus a deterministic
content-derived ``doc_id`` when the source has none (md5 of the text:
stable across re-reads, re-orders, and engines — the same contract the
sampling/split operators rely on).

Scale notes: JSONL and CSV scans are schema-pinned (no inference pass over
100 TB — inference reads the whole input twice); ``text`` mode uses
``spark.read.text`` (one row per line) or ``wholetext`` (one row per file;
only for file-per-document layouts — a 10 GB file becomes one row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from sat_bucket_spark.operators.hashing import h64_expr

__all__ = ["read_corpus"]

_FORMATS = ("parquet", "orc", "jsonl", "csv", "text")


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
    schema: StructType | str | None = None,
    whole_files: bool = False,
    csv_options: dict | None = None,
) -> DataFrame:
    """Open a document corpus as a canonical ``(doc_id, text, ...)`` frame.

    - ``parquet`` / ``orc``: columnar fast paths (pushdown + pruning free).
    - ``jsonl``: one JSON object per line. Pass ``schema`` in production —
      without it Spark runs a full inference scan first (fine for samples,
      wrong for 100 TB).
    - ``csv``: header-on by default; same schema advice as jsonl.
    - ``text``: raw lines (or whole files with ``whole_files=True``); the
      single value column becomes ``text``.

    If the source lacks ``id_col``, a deterministic 60-bit content id is
    derived (md5-based ``h64``): identical text -> identical id, which makes
    downstream exact-dedup free (ids collide exactly for duplicate text) and
    keeps sampling/split assignment stable under re-ingest.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unknown corpus format {fmt!r}; use one of {_FORMATS}")
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        df = spark.read.orc(path)
    elif fmt == "jsonl":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.json(path)
    elif fmt == "csv":
        opts = {"header": "true", **(csv_options or {})}
        reader = spark.read.options(**opts)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.csv(path)
    else:
        if whole_files:
            df = spark.read.text(path, wholetext=True).withColumn(
                "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
            )
        else:
            df = spark.read.text(path)
        df = df.withColumnRenamed("value", text_col)

    if text_col not in df.columns:
        raise ValueError(
            f"corpus at {path} has no {text_col!r} column (found {df.columns})"
        )
    if id_col not in df.columns:
        df = df.withColumn(id_col, h64_expr(F.col(text_col)))
    return df
