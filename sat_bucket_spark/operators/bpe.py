"""Byte-pair encoding: learn merges from a corpus, tokenize with them.

The regex "BPE-ish" counter (text.add_bpe_token_count) approximates token
counts; mixture weighting, packing budgets and cost estimates eventually
need the REAL subword segmentation. This module implements classic BPE
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016 — public):

- :func:`learn_bpe_merges` — the distributed part is ONE aggregation: the
  corpus collapses to a (word, frequency) table (groupBy + count, shuffle
  volume = distinct words), whose top slice is collected. Merge learning
  then runs driver-side over that bounded frequency dict — the standard
  formulation: pair statistics are weighted by word frequency, so a 50k-word
  vocabulary summarizes a 100 TB corpus exactly as well as the corpus
  itself up to the vocabulary cut. Ties break deterministically
  (count desc, pair lexicographic), so the merge table is reproducible.
- :func:`apply_bpe` — tokenization is embarrassingly parallel: an
  Arrow-batched ``mapInPandas`` stage with the merge-rank dict broadcast
  via closure (merge tables are KBs). Within a batch, segmentations are
  memoized per word — Zipf means a few thousand distinct words cover most
  running text, so the per-row cost collapses to dict lookups. Greedy
  lowest-rank-first merging (the exact learner inverse), end-of-word
  marker ``</w>`` preserved so detokenization is lossless.

Scale shape: learning = one shuffle bounded by distinct words + a driver
loop over a bounded dict; application = map-only, no shuffle, memoized.
A Python stage rather than Column expressions because the merge loop is
inherently iterative per word — the industry shape (tokenizers ride
inside Arrow UDFs on Spark) with the batch memoization that makes it
tractable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["learn_bpe_merges", "apply_bpe", "bpe_segment_word"]

EOW = "</w>"


def _word_freqs(
    corpus: DataFrame, text_col: str, max_words: int
) -> list[tuple[str, int]]:
    from sat_bucket_spark.operators.text import tokens_expr

    toks = corpus.select(
        F.explode(
            F.transform(tokens_expr(F.col(text_col)), lambda t: F.lower(t))
        ).alias("w")
    )
    rows = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def learn_bpe_merges(
    corpus: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge table from the corpus.

    One Spark aggregation (word frequencies, top ``max_words``), then the
    classic driver-side loop: repeatedly merge the most frequent adjacent
    symbol pair (frequency-weighted across words; ties broken by pair
    lexicographic order for determinism). Returns the merge list in
    learned order — position IS the merge rank.
    """
    freqs = _word_freqs(corpus, text_col, max_words)
    # word -> symbol tuple, seeded at character level + end-of-word marker
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in freqs:
        vocab[tuple(w) + (EOW,)] = vocab.get(tuple(w) + (EOW,), 0) + c

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing repeats: further merges memorize single words
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one lowercased word with a merge-rank dict (greedy
    lowest-rank-first — the exact inverse of the learner's order)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "bpe_tokens",
    count_only: bool = False,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table.

    Returns ``(id, out: array<string>)`` — or ``(id, n_bpe_tokens: long)``
    with ``count_only=True``, which skips shipping the token arrays back
    through Arrow when only budgets/mixture weights are needed.

    Map-only ``mapInPandas``; per-batch word-segmentation memo (Zipf makes
    repeated words dominate, so per-row work is mostly dict hits).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = (
        f"{id_col} long, n_bpe_tokens long"
        if count_only
        else f"{id_col} long, {out} array<string>"
    )

    def _tok(batches):
        import re

        word_re = re.compile(r"\S+")
        memo: dict[str, list[str]] = {}

        def seg(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = bpe_segment_word(w, ranks)
                memo[w] = got
            return got

        for pdf in batches:
            ids, vals = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = word_re.findall(text.lower()) if text is not None else []
                toks: list[str] = []
                for w in words:
                    toks.extend(seg(w))
                ids.append(doc_id)
                vals.append(len(toks) if count_only else toks)
            col = "n_bpe_tokens" if count_only else out
            yield pd.DataFrame({id_col: ids, col: vals})

    return df.select(id_col, text_col).mapInPandas(_tok, schema=schema)
