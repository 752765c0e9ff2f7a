"""N-gram language-model scoring: the perplexity-style quality signal.

Production LLM pipelines (CCNet, Gopher, RedPajama lineage) filter web text
by language-model perplexity against a clean reference corpus. A full KenLM
is out of scope without its library; an add-k-smoothed BIGRAM model captures
the same signal — fluent reference-like text scores high average log-prob,
boilerplate/gibberish scores low — and every step is Column expressions
replayable by the DuckDB oracle.

Scale shape: training scans the (comparatively small) reference corpus
exactly TWICE — once for token counts (from whose persisted aggregate both
the vocabulary cut and the unigram table derive) and once for bigram
counts — and materializes the model driver-side; the model is two keyed tables,
both reference-bounded, that BROADCAST to the scoring side. Scoring a
100 TB corpus is then: tokenize + pair adjacent tokens ROW-LOCALLY
(``arrays_zip`` of the token array against its own tail — no ids, no
window, no shuffle), explode, three broadcast joins (vocab map + the two
count tables), and one groupBy on the document id with map-side partial
aggregation. Nothing corpus-sized ever shuffles except (doc_id, float)
pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_pairs_expr", "score_with_bigram_lm", "train_bigram_lm"]

UNK = "<unk>"


def _low_tokens(text_col: str) -> Column:
    from sat_bucket_spark.operators.text import tokens_expr

    return F.transform(tokens_expr(F.col(text_col)), lambda t: F.lower(t))


def bigram_pairs_expr(toks: Column) -> Column:
    """Adjacent (w1, w2) pairs of a token array — row-local, no ids.

    ``arrays_zip(toks[0:n-1], toks[1:n-1])``: the canonical zip-with-tail.
    Empty for arrays shorter than 2.
    """
    n = F.size(toks)
    return F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )


def _map_unk(exploded: DataFrame, col: str, vocab: DataFrame) -> DataFrame:
    """Replace out-of-vocabulary values of ``col`` with UNK (broadcast join)."""
    v = vocab.select(F.col("tok").alias(col)).withColumn(f"__in_{col}", F.lit(True))
    return exploded.join(F.broadcast(v), col, "left").withColumn(
        col, F.when(F.col(f"__in_{col}"), F.col(col)).otherwise(F.lit(UNK))
    ).drop(f"__in_{col}")


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
) -> tuple[DataFrame, DataFrame, int]:
    """(unigram counts, bigram counts, V) of an UNK-mapped bigram model.

    The vocabulary is the ``vocab_size`` most frequent lowercased tokens
    (count-desc, token-asc tie-break — a deterministic cut); everything
    else maps to ``<unk>``. V counts the DISTINCT mapped reference tokens
    (UNK included exactly when the reference itself overflows the
    vocabulary — the oracle recomputes the same V).
    Counts are over the mapped streams, so unigram and bigram mass are
    consistent.

    The returned tables are MATERIALIZED to the driver (local relations):
    they are reference-bounded — at most ``vocab_size + 1`` unigrams and
    ``(V+1)^2`` bigrams — and the scoring side broadcast-joins them, which
    collects them to the driver regardless. Materializing here means each
    aggregation (vocab, unigram counts, bigram counts) runs EXACTLY ONCE,
    ``V`` falls out of the unigram collect for free, and every later join
    against the model replays a LocalRelation instead of re-running the
    reference aggregation.
    """
    spark = corpus.sparkSession
    low = _low_tokens(text_col)
    raw = corpus.select(F.explode(low).alias("tok"))
    # Distinct-token counts, persisted: the vocabulary cut AND the unigram
    # table both derive from this one aggregate, so the reference corpus is
    # exploded for unigram purposes exactly once. The cache is
    # distinct-token-sized (not corpus-sized) and released before return.
    tok_counts = raw.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    try:
        vocab_rows = (
            tok_counts.orderBy(F.col("c").desc(), F.col("tok").asc())
            .limit(vocab_size)
            .select("tok")
            .collect()
        )
        vocab = spark.createDataFrame(vocab_rows, schema="tok string")
        # Unigram counts of the UNK-mapped stream = token counts re-keyed by
        # the mapped token — a job over the cached counts, no corpus rescan.
        uni_rows = (
            _map_unk(tok_counts.select(F.col("tok").alias("w1"), "c"), "w1", vocab)
            .groupBy("w1")
            .agg(F.sum("c").alias("c1"))
            .collect()
        )
    finally:
        tok_counts.unpersist()
    unigrams = spark.createDataFrame(uni_rows, schema="w1 string, c1 bigint")
    pairs = corpus.select(
        F.explode(bigram_pairs_expr(low)).alias("__p")
    ).select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    pairs = _map_unk(_map_unk(pairs, "w1", vocab), "w2", vocab)
    big_rows = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).collect()
    bigrams = spark.createDataFrame(big_rows, schema="w1 string, w2 string, c12 bigint")
    return unigrams, bigrams, len(uni_rows)


def score_with_bigram_lm(
    df: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    add_k: float = 0.5,
) -> DataFrame:
    """Average bigram log-probability per document vs a reference corpus.

    ``avg_logp = mean over bigrams of ln((c(w1,w2)+k) / (c(w1)+k*V))`` with
    add-k smoothing; higher = more reference-like. Documents with fewer
    than two tokens get ``n_bigrams = 0`` and NULL ``avg_logp`` (no
    evidence — the caller decides their fate; they are never silently
    dropped). Returns ``(id, n_bigrams, avg_logp)``.

    OOV tokens take the UNK statistics and unseen bigrams the smoothed
    floor, so every document is scorable, and the whole computation
    replays in ANSI SQL (the ``score_bigram_lm`` oracle re-trains AND
    re-scores).
    """
    unigrams, bigrams, v = train_bigram_lm(
        corpus, text_col=text_col, vocab_size=vocab_size
    )
    vocab = unigrams.select(F.col("w1").alias("tok")).where(F.col("tok") != UNK)

    low = _low_tokens(text_col)
    pairs = df.select(
        F.col(id_col), F.explode(bigram_pairs_expr(low)).alias("__p")
    ).select(id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    pairs = _map_unk(_map_unk(pairs, "w1", vocab), "w2", vocab)
    scored = (
        pairs.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(unigrams), "w1", "left")
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k * v))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__logp"), 6).alias("avg_logp"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
    )
