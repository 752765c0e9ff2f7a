"""Deterministic hash sampling / split assignment tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.operators.sampling import assign_splits, hash_sample

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestHashSample:
    def test_deterministic_and_stable_under_repartition(self, spark, documents):
        a = {r["doc_id"] for r in hash_sample(documents, "doc_id", 0.3).select("doc_id").collect()}
        b = {
            r["doc_id"]
            for r in hash_sample(documents.repartition(7), "doc_id", 0.3)
            .select("doc_id")
            .collect()
        }
        assert a == b
        assert a  # non-empty

    def test_fraction_roughly_honored(self, spark, documents):
        n = documents.count()
        k = hash_sample(documents, "doc_id", 0.5).count()
        assert 0.35 * n <= k <= 0.65 * n

    def test_nested_samples(self, spark, documents):
        # same salt: smaller fraction is a subset of the larger
        s10 = {r["doc_id"] for r in hash_sample(documents, "doc_id", 0.1).collect()}
        s50 = {r["doc_id"] for r in hash_sample(documents, "doc_id", 0.5).collect()}
        assert s10 <= s50

    def test_salt_gives_independent_draw(self, spark, documents):
        a = {r["doc_id"] for r in hash_sample(documents, "doc_id", 0.5, salt="a").collect()}
        b = {r["doc_id"] for r in hash_sample(documents, "doc_id", 0.5, salt="b").collect()}
        assert a != b

    def test_rejects_bad_fraction(self, documents):
        with pytest.raises(ValueError):
            hash_sample(documents, "doc_id", 1.5)


class TestAssignSplits:
    def test_total_disjoint_stable(self, spark, documents):
        out = assign_splits(documents, "doc_id").select("doc_id", "split")
        rows = out.collect()
        assert len(rows) == documents.count()  # total: every row labeled
        labels = {r["split"] for r in rows}
        assert labels <= {"train", "val", "test"}
        again = {(r["doc_id"], r["split"]) for r in out.collect()}
        assert {(r["doc_id"], r["split"]) for r in rows} == again

    def test_proportions(self, spark, documents):
        counts = dict(
            assign_splits(documents, "doc_id", {"a": 0.5, "b": 0.5})
            .groupBy("split")
            .count()
            .collect()
        )
        n = documents.count()
        assert abs(counts.get("a", 0) / n - 0.5) < 0.15

    def test_rejects_bad_weights(self, documents):
        with pytest.raises(ValueError):
            assign_splits(documents, "doc_id", {"a": 0.5, "b": 0.2})

    def test_plan_pure_expressions(self, spark, documents):
        out = assign_splits(hash_sample(documents, "doc_id", 0.5), "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan  # no shuffle, no UDF
