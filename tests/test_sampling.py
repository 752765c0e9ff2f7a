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


class TestLeakageSafeSplits:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(rows, ["id_a", "id_b"])

    def test_no_cluster_straddles_splits(self, spark, documents):
        from sat_bucket_spark.operators.sampling import leakage_safe_splits

        # chain clusters spanning wide id ranges — the shapes most likely
        # to straddle under per-id hashing
        rows = [(i, i + 250) for i in range(0, 200, 3)] + [(5, 490), (8, 321)]
        out = leakage_safe_splits(documents, self._pairs(spark, rows)).select(
            "doc_id", "split_group", "split"
        )
        per_group = (
            out.groupBy("split_group")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1)
            .count()
        )
        assert per_group == 0  # the whole point
        labels = {r["split"] for r in out.select("split").distinct().collect()}
        assert labels <= {"train", "val", "test"} and len(labels) >= 2

    def test_singletons_match_assign_splits_exactly(self, spark, documents):
        from sat_bucket_spark.operators.sampling import (
            assign_splits,
            leakage_safe_splits,
        )

        pairs = self._pairs(spark, [(1, 2), (2, 3)])
        safe = leakage_safe_splits(documents, pairs).select("doc_id", "split")
        plain = assign_splits(documents, "doc_id").select(
            "doc_id", F.col("split").alias("plain")
        )
        diff = (
            safe.join(plain, "doc_id")
            .where(~F.col("doc_id").isin(1, 2, 3))
            .where(F.col("split") != F.col("plain"))
            .count()
        )
        assert diff == 0  # unclustered docs: identical to per-id assignment

    def test_cluster_members_share_the_min_id_key(self, spark, documents):
        from sat_bucket_spark.operators.sampling import leakage_safe_splits

        out = leakage_safe_splits(documents, self._pairs(spark, [(7, 9), (9, 11)]))
        got = {
            r["doc_id"]: r["split_group"]
            for r in out.where(F.col("doc_id").isin(7, 9, 11)).collect()
        }
        assert got == {7: 7, 9: 7, 11: 7}


class TestMixSources:
    def _docs(self, spark):
        rows = [(i, f"s{i % 4}") for i in range(400)] + [(1000 + i, "other") for i in range(50)]
        return spark.createDataFrame(rows, ["doc_id", "source"])

    def test_mixture_and_binding_source(self, spark):
        from sat_bucket_spark.operators.sampling import mix_sources

        df = self._docs(spark)
        # equal 100-row sources, weights 4:3:2:1 -> s-with-0.4 binds (keeps all 100)
        out = mix_sources(
            df, {"s0": 0.4, "s1": 0.3, "s2": 0.2, "s3": 0.1}, id_col="doc_id"
        )
        got = {r["source"]: r["n"] for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
        assert got["s0"] == 100  # binding source keeps everything
        assert "other" not in got  # unlisted sources dropped
        # hash sampling is approximate: rate*n +- a loose binomial bound
        for s, target in [("s1", 75), ("s2", 50), ("s3", 25)]:
            assert abs(got.get(s, 0) - target) <= 30

    def test_deterministic(self, spark):
        from sat_bucket_spark.operators.sampling import mix_sources

        df = self._docs(spark)
        w = {"s0": 0.5, "s1": 0.5}
        a = sorted(r["doc_id"] for r in mix_sources(df, w, id_col="doc_id").collect())
        b = sorted(r["doc_id"] for r in mix_sources(df, w, id_col="doc_id").collect())
        assert a == b and len(a) > 0

    def test_absent_source_ignored(self, spark):
        from sat_bucket_spark.operators.sampling import mix_sources

        df = self._docs(spark)
        out = mix_sources(df, {"s0": 0.5, "nope": 0.5}, id_col="doc_id")
        got = {r["source"] for r in out.select("source").distinct().collect()}
        assert got == {"s0"}


class TestCapPerGroup:
    def test_caps_each_group(self, spark, documents):
        from sat_bucket_spark.operators.sampling import cap_per_group

        out = cap_per_group(documents, ["source"], 5, "doc_id")
        counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        orig = {r["source"]: r["n"] for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts
        for s, n in counts.items():
            assert n == min(orig[s], 5)

    def test_deterministic_and_salted(self, spark, documents):
        from sat_bucket_spark.operators.sampling import cap_per_group

        a = sorted(r["doc_id"] for r in cap_per_group(documents, ["source"], 5, "doc_id").collect())
        b = sorted(r["doc_id"] for r in cap_per_group(documents, ["source"], 5, "doc_id").collect())
        c = sorted(r["doc_id"] for r in cap_per_group(documents, ["source"], 5, "doc_id", salt="x").collect())
        assert a == b
        assert a != c  # different salt -> different deterministic pick

    def test_rank_col_keeps_best(self, spark, documents):
        from sat_bucket_spark.operators.sampling import cap_per_group

        ranked = cap_per_group(
            documents, ["source"], 3, "doc_id", rank_col=F.col("n_chars").desc()
        )
        kept = {(r["source"], r["doc_id"]) for r in ranked.collect()}
        pdf = documents.select("source", "doc_id", "n_chars").toPandas()
        for s, grp in pdf.groupby("source"):
            top = set(
                grp.sort_values(["n_chars", "doc_id"], ascending=[False, True])
                .head(3)["doc_id"]
            )
            assert {d for (src, d) in kept if src == s} == top

    def test_rejects_nonpositive_cap(self, spark, documents):
        from sat_bucket_spark.operators.sampling import cap_per_group

        with pytest.raises(ValueError):
            cap_per_group(documents, ["source"], 0, "doc_id")


class TestQuantileCuration:
    def test_filter_keeps_top_fraction_per_group(self, spark, documents):
        from sat_bucket_spark.operators.sampling import filter_by_group_quantile
        from sat_bucket_spark.operators.text import add_quality_score

        docs = add_quality_score(documents)
        out = filter_by_group_quantile(
            docs, "quality_score", 0.4, group_cols=["lang"], id_col="doc_id"
        )
        per_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        orig = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        for lang, n in per_lang.items():
            # top ~60% kept per group (percent_rank >= 0.4)
            assert abs(n - 0.6 * orig[lang]) <= max(2, 0.05 * orig[lang])
        # the kept minimum per group must be >= the dropped maximum per group
        kept_min = {r["lang"]: r["m"] for r in out.groupBy("lang").agg(F.min("quality_score").alias("m")).collect()}
        dropped = docs.join(out.select("doc_id"), "doc_id", "left_anti")
        dropped_max = {r["lang"]: r["m"] for r in dropped.groupBy("lang").agg(F.max("quality_score").alias("m")).collect()}
        for lang in dropped_max:
            assert kept_min[lang] >= dropped_max[lang]

    def test_bucket_sizes_equal_frequency(self, spark, documents):
        from sat_bucket_spark.operators.sampling import assign_quality_buckets
        from sat_bucket_spark.operators.text import add_quality_score

        docs = add_quality_score(documents)
        out = assign_quality_buckets(
            docs, "quality_score", n_buckets=4, group_cols=["lang"], id_col="doc_id"
        )
        sizes = out.groupBy("lang", "quality_bucket").agg(F.count("*").alias("n")).collect()
        by_lang = {}
        for r in sizes:
            by_lang.setdefault(r["lang"], []).append(r["n"])
        for lang, ns in by_lang.items():
            assert len(ns) == 4
            assert max(ns) - min(ns) <= 1  # NTILE equal-frequency contract
        # bucket 4 holds the best: its min must be >= bucket 1's max per lang
        b = out.groupBy("lang").agg(
            F.min(F.when(F.col("quality_bucket") == 4, F.col("quality_score"))).alias("hi_min"),
            F.max(F.when(F.col("quality_bucket") == 1, F.col("quality_score"))).alias("lo_max"),
        ).collect()
        for r in b:
            assert r["hi_min"] >= r["lo_max"]

    def test_validation(self, spark, documents):
        from sat_bucket_spark.operators.sampling import (
            assign_quality_buckets,
            filter_by_group_quantile,
        )

        with pytest.raises(ValueError):
            filter_by_group_quantile(documents, "n_chars", 1.5)
        with pytest.raises(ValueError):
            filter_by_group_quantile(documents, "n_chars", 0.5, keep="middle")
        with pytest.raises(ValueError):
            assign_quality_buckets(documents, "n_chars", 0)


class TestQuantileScalePath:
    def test_approx_filter_close_to_exact(self, spark, documents):
        from sat_bucket_spark.operators.sampling import filter_by_group_quantile
        from sat_bucket_spark.operators.text import add_quality_score

        docs = add_quality_score(documents)
        exact = filter_by_group_quantile(
            docs, "quality_score", 0.4, group_cols=["lang"], id_col="doc_id"
        )
        approx = filter_by_group_quantile(
            docs, "quality_score", 0.4, group_cols=["lang"], exact=False
        )
        ne, na = exact.count(), approx.count()
        assert abs(ne - na) <= max(3, 0.1 * ne)
        # the approx plan must have NO window sort: only agg + broadcast join
        plan = approx._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "percentile_approx" in plan and "Broadcast" in plan

    def test_approx_buckets_close_to_exact(self, spark, documents):
        from sat_bucket_spark.operators.sampling import assign_quality_buckets
        from sat_bucket_spark.operators.text import add_quality_score

        docs = add_quality_score(documents)
        exact = {
            r["doc_id"]: r["quality_bucket"]
            for r in assign_quality_buckets(
                docs, "quality_score", 4, group_cols=["lang"], id_col="doc_id"
            ).collect()
        }
        approx = {
            r["doc_id"]: r["quality_bucket"]
            for r in assign_quality_buckets(
                docs, "quality_score", 4, group_cols=["lang"], exact=False
            ).collect()
        }
        assert set(approx.values()) <= {1, 2, 3, 4}
        agree = sum(1 for d in exact if exact[d] == approx[d]) / len(exact)
        assert agree > 0.8  # ties at boundaries may land one tile apart


class TestSaltedCap:
    def test_two_phase_output_identical(self, spark, documents):
        """salt_buckets changes only the physical sort distribution: the
        selected row set must equal the single-phase rank exactly, for both
        the hash rank and a caller-supplied quality rank."""
        from sat_bucket_spark.operators.sampling import cap_per_group

        a = sorted(r["doc_id"] for r in cap_per_group(documents, ["source"], 7, "doc_id").collect())
        b = sorted(
            r["doc_id"]
            for r in cap_per_group(
                documents, ["source"], 7, "doc_id", salt_buckets=8
            ).collect()
        )
        assert a == b
        c = sorted(
            r["doc_id"]
            for r in cap_per_group(
                documents, ["source"], 7, "doc_id",
                rank_col=F.col("n_chars").desc(), salt_buckets=8,
            ).collect()
        )
        d = sorted(
            r["doc_id"]
            for r in cap_per_group(
                documents, ["source"], 7, "doc_id", rank_col=F.col("n_chars").desc()
            ).collect()
        )
        assert c == d

    def test_phase_one_spreads_partitioning(self, spark, documents):
        from sat_bucket_spark.operators.sampling import cap_per_group

        plan = (
            cap_per_group(documents, ["source"], 5, "doc_id", salt_buckets=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # two ranking exchanges: (group, cell) then (group)
        assert "__cell" in plan
        assert plan.count("Exchange hashpartitioning") >= 2


class TestTemperatureMixture:
    def test_alpha_extremes(self, spark):
        from sat_bucket_spark.operators.sampling import temperature_mixture_weights

        rows = [(i, "big") for i in range(90)] + [(i + 1000, "small") for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        # alpha=1: natural proportions
        w1 = temperature_mixture_weights(df, alpha=1.0)
        assert w1 == {"big": 0.9, "small": 0.1}
        # alpha=0: uniform
        w0 = temperature_mixture_weights(df, alpha=0.0)
        assert w0 == {"big": 0.5, "small": 0.5}
        # alpha=0.5: between, small up-weighted
        wh = temperature_mixture_weights(df, alpha=0.5)
        assert 0.1 < wh["small"] < 0.5 and abs(sum(wh.values()) - 1) < 1e-8

    def test_mixture_realizes_proportions(self, spark):
        from sat_bucket_spark.operators.sampling import (
            mix_sources_temperature,
            temperature_mixture_weights,
        )

        rows = [(i, "big") for i in range(400)] + [
            (i + 10_000, "small") for i in range(100)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = mix_sources_temperature(df, "doc_id", alpha=0.5).groupBy("source").count()
        got = {r["source"]: r["count"] for r in out.collect()}
        w = temperature_mixture_weights(df, alpha=0.5)
        # binding source (small, up-weighted most) keeps everything
        assert got["small"] == 100
        # realized ratio tracks the alpha proportions (hash-draw tolerance)
        target_big = 100 / w["small"] * w["big"]
        assert abs(got["big"] - target_big) / target_big < 0.15

    def test_invalid_alpha(self, spark):
        from sat_bucket_spark.operators.sampling import temperature_mixture_weights

        df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
        with pytest.raises(ValueError, match="alpha"):
            temperature_mixture_weights(df, alpha=-0.1)
