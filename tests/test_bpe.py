"""Tests: BPE merge learning and subword tokenization."""

from __future__ import annotations

import pytest

from sat_bucket_spark.operators.bpe import (
    EOW,
    apply_bpe,
    bpe_segment_word,
    learn_bpe_merges,
)


@pytest.fixture(scope="module")
def toy_corpus(spark):
    # Sennrich-style frequency structure: shared suffixes dominate
    rows = []
    doc = 0
    for word, n in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for _ in range(n):
            rows.append((doc, word))
            doc += 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestLearn:
    def test_first_merge_is_es(self, toy_corpus):
        merges = learn_bpe_merges(toy_corpus, n_merges=10)
        # 'e s' occurs 9 times (newest 6 + widest 3) — the classic result
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")

    def test_deterministic(self, toy_corpus):
        a = learn_bpe_merges(toy_corpus, n_merges=8)
        b = learn_bpe_merges(toy_corpus, n_merges=8)
        assert a == b

    def test_stops_when_nothing_repeats(self, spark):
        df = spark.createDataFrame([(1, "abc xyz")], ["doc_id", "text"])
        merges = learn_bpe_merges(df, n_merges=1000)
        # singleton words can't justify 1000 merges
        assert len(merges) < 20

    def test_frequent_word_becomes_one_token(self, spark):
        rows = [(i, "the quick the lazy the dog the") for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        merges = learn_bpe_merges(df, n_merges=50)
        ranks = {p: i for i, p in enumerate(merges)}
        assert bpe_segment_word("the", ranks) == ["the" + EOW]


class TestSegment:
    def test_lossless_concatenation(self, toy_corpus):
        merges = learn_bpe_merges(toy_corpus, n_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in ["lowest", "newer", "wide", "unseen", "low"]:
            toks = bpe_segment_word(w, ranks)
            assert "".join(toks) == w + EOW

    def test_suffix_sharing(self, toy_corpus):
        merges = learn_bpe_merges(toy_corpus, n_merges=6)
        ranks = {p: i for i, p in enumerate(merges)}
        # est</w> should have merged into a shared suffix unit
        toks = bpe_segment_word("newest", ranks)
        assert any(t.startswith("est") for t in toks)

    def test_unknown_chars_stay_atomic(self, toy_corpus):
        merges = learn_bpe_merges(toy_corpus, n_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        toks = bpe_segment_word("zzz", ranks)
        assert "".join(toks) == "zzz" + EOW


class TestApply:
    def test_tokens_and_counts_agree(self, spark, toy_corpus):
        merges = learn_bpe_merges(toy_corpus, n_merges=10)
        docs = spark.createDataFrame(
            [(1, "newest lowest"), (2, "the low"), (3, ""), (4, None)],
            ["doc_id", "text"],
        )
        toks = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(docs, merges).collect()}
        counts = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in apply_bpe(docs, merges, count_only=True).collect()
        }
        for i in (1, 2, 3, 4):
            assert counts[i] == len(toks[i])
        assert toks[3] == [] and toks[4] == []
        # reconstruction: strip EOW markers, join
        rebuilt = "".join(toks[1]).replace(EOW, " ").strip()
        assert rebuilt == "newest lowest"

    def test_matches_direct_segmentation(self, spark, toy_corpus):
        merges = learn_bpe_merges(toy_corpus, n_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        docs = spark.createDataFrame([(1, "Newest WIDEST")], ["doc_id", "text"])
        toks = apply_bpe(docs, merges).collect()[0]["bpe_tokens"]
        want = bpe_segment_word("newest", ranks) + bpe_segment_word("widest", ranks)
        assert toks == want

    def test_real_documents_sanity(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        merges = learn_bpe_merges(docs, n_merges=200, max_words=2000)
        out = apply_bpe(docs, merges, count_only=True)
        rows = out.collect()
        assert len(rows) == docs.count()
        from sat_bucket_spark.operators.text import add_token_count

        ws = {r["doc_id"]: r["n_tokens"] for r in add_token_count(docs).collect()}
        for r in rows:
            # subword count >= whitespace word count, and bounded by chars
            if ws[r["doc_id"]] > 0:
                assert r["n_bpe_tokens"] >= ws[r["doc_id"]]
