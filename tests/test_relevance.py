"""BM25 / TF-IDF scoring tests vs hand-computed values."""

from __future__ import annotations

import math

import pytest

from sat_bucket_spark.operators.relevance import bm25_scores, tf_idf_scores

DOCS = [
    (1, "spark query engine"),
    (2, "query engine query plan"),
    (3, "unrelated text entirely"),
    (4, "spark spark spark"),
]


class TestTfIdf:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        rows = {r["doc_id"]: r for r in tf_idf_scores(df, ["spark", "query"]).collect()}
        n = 4
        idf_spark = math.log(n / 2)  # docs 1, 4
        idf_query = math.log(n / 2)  # docs 1, 2
        assert rows[1]["n_matched"] == 2
        assert rows[1]["score"] == pytest.approx(idf_spark + idf_query, abs=1e-6)
        assert rows[2]["score"] == pytest.approx(2 * idf_query, abs=1e-6)
        assert rows[4]["score"] == pytest.approx(3 * idf_spark, abs=1e-6)
        assert 3 not in rows  # no match, no row

    def test_case_insensitive_and_validation(self, spark):
        df = spark.createDataFrame([(1, "Spark SPARK")], ["doc_id", "text"])
        row = tf_idf_scores(df, ["spark"]).collect()[0]
        assert row["n_matched"] == 1 and row["score"] == 0.0  # idf = ln(1/1) = 0
        with pytest.raises(ValueError):
            tf_idf_scores(df, [])


class TestBM25:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        k1, b = 1.2, 0.75
        rows = {r["doc_id"]: r for r in bm25_scores(df, ["spark"], k1=k1, b=b).collect()}
        n, dfq = 4, 2
        avgdl = (3 + 4 + 3 + 3) / 4
        idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1)

        def score(tf, dl):
            return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        assert rows[1]["score"] == pytest.approx(score(1, 3), abs=1e-5)
        assert rows[4]["score"] == pytest.approx(score(3, 3), abs=1e-5)
        assert set(rows) == {1, 4}

    def test_saturation_monotonic(self, spark):
        # BM25 grows sublinearly in tf: doc with tf=3 scores < 3x doc with tf=1
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        rows = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["spark"]).collect()}
        assert rows[4] > rows[1]
        assert rows[4] < 3 * rows[1]


class TestInvertedIndex:
    def test_postings(self, spark):
        from sat_bucket_spark.operators.relevance import inverted_index

        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        rows = {r["term"]: r for r in inverted_index(df).collect()}
        assert rows["query"]["postings"] == [1, 2]
        assert rows["query"]["df"] == 2  # distinct docs, not occurrences
        assert rows["spark"]["postings"] == [1, 4]
        assert rows["engine"]["postings"] == [1, 2]

    def test_df_bounds(self, spark):
        from sat_bucket_spark.operators.relevance import inverted_index

        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        terms = {r["term"] for r in inverted_index(df, min_df=2, max_df=2).collect()}
        assert terms == {"spark", "query", "engine"}
