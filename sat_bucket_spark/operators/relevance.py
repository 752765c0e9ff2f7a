"""TF-IDF / BM25 relevance scoring over a document corpus.

The retrieval-side companion of the curation operators: given a query
term list, score every document by BM25 (or classic TF-IDF) using corpus
statistics computed in the same job. Everything is relational:

    explode tokens -> (doc, term) term frequencies          [1 shuffle]
    term doc-frequencies for the query terms                [broadcast]
    per-doc score = sum over matched terms                  [1 shuffle]

Only rows whose term is IN the query survive the explode (an ``isin``
filter pushed to the token stream), so the shuffled volume is bounded by
query-term matches, not corpus token count. Corpus constants (N, avgdl)
ride along as broadcast scalars via a literal after one tiny aggregate.

BM25 is the standard ranking function (Robertson-Sparck Jones): the
docstring formula uses k1 saturation and b length normalization with the
plain-IDF variant ``ln((N - df + 0.5) / (df + 0.5) + 1)`` (Lucene's
non-negative form).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.parallel import ensure_parallelism
from sat_bucket_spark.operators.text import tokens_expr

__all__ = ["bm25_scores", "inverted_index", "tf_idf_scores"]


def _doc_terms(df: DataFrame, id_col: str, text: str, terms: list[str]) -> DataFrame:
    toks = F.transform(tokens_expr(F.lower(F.col(text))), lambda t: t)
    df = ensure_parallelism(df)
    exploded = df.select(
        F.col(id_col),
        F.size(tokens_expr(F.lower(F.col(text)))).cast("double").alias("__dl"),
        F.explode(toks).alias("__term"),
    )
    return exploded.where(F.col("__term").isin([t.lower() for t in terms]))


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document matching >= 1 query term.

    Returns ``(id, n_matched, score)`` sorted-stable (callers order). The
    corpus stats pass collects exactly two scalars (N, avgdl) plus one df
    per query term — driver data volume is O(len(query_terms)).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    stats = df.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(tokens_expr(F.lower(F.col(text))))).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 1.0)

    matches = _doc_terms(df, id_col, text, query_terms)
    tf = matches.groupBy(id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    dfreq = {
        r["__term"]: r["df"]
        for r in matches.select(id_col, "__term")
        .distinct()
        .groupBy("__term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    idf_expr = None
    for term in set(t.lower() for t in query_terms):
        idf = math.log((n_docs - dfreq.get(term, 0) + 0.5) / (dfreq.get(term, 0) + 0.5) + 1.0)
        branch = F.when(F.col("__term") == F.lit(term), F.lit(idf))
        idf_expr = branch if idf_expr is None else idf_expr.when(
            F.col("__term") == F.lit(term), F.lit(idf)
        )
    idf_expr = idf_expr.otherwise(F.lit(0.0))

    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.lit(avgdl)
    )
    contrib = idf_expr * (F.col("__tf") * F.lit(k1 + 1.0)) / denom
    return (
        tf.withColumn("__c", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            # decimal-exact sum: per-doc accumulation order cannot move the
            # result between engines (house determinism rule for float sums)
            F.round(
                F.sum(F.col("__c").cast("decimal(28,10)")).cast("double"), 6
            ).alias("score"),
        )
    )


def tf_idf_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Classic TF-IDF: sum over query terms of tf * ln(N / df).

    Same plan shape as BM25 without the saturation/length terms — kept
    separate because its formula is exactly replayable in ANSI SQL for the
    correctness oracle (BM25 is too, but TF-IDF is the textbook contract).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    n_docs = df.count()
    matches = _doc_terms(df, id_col, text, query_terms)
    tf = matches.groupBy(id_col, "__term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    dfreq = {
        r["__term"]: r["df"]
        for r in matches.select(id_col, "__term")
        .distinct()
        .groupBy("__term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    idf_expr = None
    for term in set(t.lower() for t in query_terms):
        idf = math.log(n_docs / dfreq[term]) if dfreq.get(term) else 0.0
        branch = F.when(F.col("__term") == F.lit(term), F.lit(idf))
        idf_expr = branch if idf_expr is None else idf_expr.when(
            F.col("__term") == F.lit(term), F.lit(idf)
        )
    idf_expr = idf_expr.otherwise(F.lit(0.0))
    return (
        tf.withColumn("__c", F.col("__tf") * idf_expr)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            # decimal-exact sum: per-doc accumulation order cannot move the
            # result between engines (house determinism rule for float sums)
            F.round(
                F.sum(F.col("__c").cast("decimal(28,10)")).cast("double"), 6
            ).alias("score"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Term -> sorted posting list (doc ids), with document-frequency bounds.

    The retrieval-side materialization of :func:`~sat_bucket_spark.operators.
    text.vocabulary`: one shuffle keyed by term builds
    ``(term, df, postings)``; ``min_df`` prunes hapax noise, ``max_df``
    prunes stopword-grade terms whose posting lists are the classic skew
    hazard (a term in every document collects the whole corpus into one
    group — cap it out before the collect_list).

    Postings are sorted ascending for deterministic, merge-friendly output.
    """
    toks = F.explode(
        F.array_distinct(tokens_expr(F.lower(F.col(text))))
    ).alias("term")
    per_term = (
        ensure_parallelism(df)
        .select(F.col(id_col), toks)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_sort(F.collect_list(id_col)).alias("postings"),
        )
    )
    out = per_term.where(F.col("df") >= F.lit(min_df))
    if max_df is not None:
        out = out.where(F.col("df") <= F.lit(max_df))
    return out
