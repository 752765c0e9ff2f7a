"""Tests: one-pass profiling, key-skew report, robust MAD outliers,
PassJoin edit-distance pairs, and the large-large kNN join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.operators.profiling import key_skew_report, profile_columns
from sat_bucket_spark.operators.robust import add_robust_zscore, mad_outlier_filter
from sat_bucket_spark.operators.dedup import edit_distance_pairs
from sat_bucket_spark.operators.similarity import knn_join


# ---------------------------------------------------------------------------
# profile_columns
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mixed_df(spark):
    rows = [
        (1, "alpha", 10.0),
        (2, "beta", 20.0),
        (3, None, 20.0),
        (4, "alpha", None),
        (5, "gamma", 40.0),
    ]
    return spark.createDataFrame(rows, ["id", "name", "score"])


class TestProfileColumns:
    def test_stats(self, mixed_df):
        out = {r["column"]: r.asDict() for r in profile_columns(mixed_df).collect()}
        assert set(out) == {"id", "name", "score"}
        for p in out.values():
            assert p["n_rows"] == 5
        assert out["name"]["n_null"] == 1
        assert out["name"]["n_distinct"] == 3  # NULL excluded
        assert out["name"]["min_str"] == "alpha"
        assert out["name"]["max_str"] == "gamma"
        assert out["name"]["min_num"] is None and out["name"]["mean_num"] is None
        assert out["score"]["n_null"] == 1
        assert out["score"]["n_distinct"] == 3
        assert out["score"]["min_num"] == 10.0
        assert out["score"]["max_num"] == 40.0
        assert out["score"]["mean_num"] == 22.5  # avg over non-null
        assert out["score"]["min_str"] is None
        assert out["id"]["n_null"] == 0 and out["id"]["n_distinct"] == 5

    def test_plan_shape(self, mixed_df):
        """Approx mode: strictly one scan, no join, no EXPAND. Exact mode:
        two scalar agg subplans over the scan recombined by a broadcast
        nested-loop join of 1-row tables — and NO row-fanout Expand (the
        slow shape Catalyst picks when distinct + regular aggs share one
        agg)."""
        approx_plan = (
            profile_columns(mixed_df, approx=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in approx_plan and "Expand" not in approx_plan
        # Exact mode: the distinct subplan may Expand (narrow count buffers,
        # the cheap shape) but the regular-stats subplan must not, and the
        # two 1-row results recombine via broadcast.
        exact = profile_columns(mixed_df)
        exact_plan = exact._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in exact_plan

    def test_approx_mode(self, mixed_df):
        out = {r["column"]: r for r in profile_columns(mixed_df, approx=True).collect()}
        # HLL at this cardinality is exact
        assert out["name"]["n_distinct"] == 3

    def test_unknown_column(self, mixed_df):
        with pytest.raises(ValueError, match="nope"):
            profile_columns(mixed_df, columns=["nope"])


class TestKeySkewReport:
    def test_shares_and_ranks(self, spark):
        rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, ["k"])
        out = key_skew_report(df, "k", top=2).collect()
        assert [(r["k"], r["n"], r["share"], r["rank"]) for r in out] == [
            ("a", 6, 0.6, 1),
            ("b", 3, 0.3, 2),
        ]

    def test_tie_break_deterministic(self, spark):
        df = spark.createDataFrame([("b",), ("a",)], ["k"])
        out = key_skew_report(df, ["k"], top=5).collect()
        assert [r["k"] for r in out] == ["a", "b"]


# ---------------------------------------------------------------------------
# robust z-score / MAD outliers
# ---------------------------------------------------------------------------


class TestRobust:
    def test_against_numpy(self, spark):
        vals = [1.0, 2.0, 2.0, 3.0, 4.0, 100.0]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "v"])
        out = {r["i"]: r for r in add_robust_zscore(df, "v").collect()}
        med = float(np.median(vals))
        mad = float(np.median(np.abs(np.array(vals) - med)))
        assert out[0]["median_v"] == pytest.approx(med)
        assert out[0]["mad_v"] == pytest.approx(mad)
        z5 = 0.6745 * (100.0 - med) / mad
        assert out[5]["robust_z"] == pytest.approx(z5, abs=1e-6)

    def test_grouped_filter(self, spark):
        rows = [("g1", float(v)) for v in [10, 11, 12, 11, 10, 1000]] + [
            ("g2", float(v)) for v in [5, 5, 5, 5]
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        inl = mad_outlier_filter(df, "v", by="g").collect()
        assert all(r["v"] != 1000.0 for r in inl)
        # zero-MAD group g2: all values on the median stay
        assert sum(1 for r in inl if r["g"] == "g2") == 4
        outl = mad_outlier_filter(df, "v", by="g", keep="outliers").collect()
        assert [(r["g"], r["v"]) for r in outl] == [("g1", 1000.0)]

    def test_zero_mad_off_median_is_outlier(self, spark):
        df = spark.createDataFrame(
            [("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 9.0)], ["g", "v"]
        )
        flagged = {
            (r["v"], r["is_outlier"])
            for r in mad_outlier_filter(df, "v", by="g", keep="flag").collect()
        }
        assert (9.0, True) in flagged and (5.0, False) in flagged

    def test_grouped_single_shuffle(self, spark):
        """Both percentile windows must reuse ONE exchange on the group key."""
        df = spark.createDataFrame([("g", float(i)) for i in range(10)], ["g", "v"])
        plan = (
            add_robust_zscore(df, "v", by="g")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1

    def test_bad_keep(self, spark):
        df = spark.createDataFrame([("g", 1.0)], ["g", "v"])
        with pytest.raises(ValueError, match="keep"):
            mad_outlier_filter(df, "v", keep="bogus")


# ---------------------------------------------------------------------------
# edit_distance_pairs (PassJoin)
# ---------------------------------------------------------------------------


def _brute_pairs(rows, d, max_len=256):
    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(
                    dp[j] + 1,
                    dp[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
                prev, dp[j] = dp[j], cur
        return dp[n]

    norm = [(i, t.strip().lower()[:max_len]) for i, t in rows]
    out = set()
    for ai in range(len(norm)):
        for bi in range(ai + 1, len(norm)):
            ia, ka = norm[ai]
            ib, kb = norm[bi]
            if ka and kb and abs(len(ka) - len(kb)) <= d and lev(ka, kb) <= d:
                out.add((min(ia, ib), max(ia, ib), lev(ka, kb)))
    return out


class TestEditDistancePairs:
    def test_matches_brute_force(self, spark):
        rows = [
            (0, "the quick brown fox"),
            (1, "the quick brown fx"),  # 1 deletion
            (2, "the quikc brown fox"),  # transposition = 2 (sub+sub)
            (3, "a completely different sentence"),
            (4, "The Quick Brown Fox"),  # case-normalized exact dup
            (5, "the quick brown foxx"),  # 1 insertion
            (6, "short"),
            (7, "shirt"),  # 1 substitution
            (8, "sh"),
            (9, "s"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, max_distance=2).collect()
        }
        assert got == _brute_pairs(rows, 2)

    def test_recall_under_shifty_edits(self, spark):
        """Insertions near the front shift every later chunk — the +/-d probe
        shifts must still find the pair (the PassJoin guarantee)."""
        base = "abcdefghijklmnopqrstuvwxyz0123456789" * 3
        rows = [(0, base), (1, "XY" + base)]  # 2 inserts at position 0
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = edit_distance_pairs(df, max_distance=2).collect()
        assert [(r["id_a"], r["id_b"], r["dist"]) for r in got] == [(0, 1, 2)]

    def test_random_fuzz_vs_brute(self, spark):
        rng = np.random.default_rng(7)
        alphabet = "abcdef "
        docs = []
        for i in range(30):
            n = int(rng.integers(5, 25))
            docs.append((i, "".join(rng.choice(list(alphabet), n))))
        # seed some near-dups
        docs.append((100, docs[0][1] + "x"))
        docs.append((101, docs[1][1][1:]))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, max_distance=2).collect()
        }
        assert got == _brute_pairs(docs, 2)

    def test_duplicate_heavy_corpus_matches_brute(self, spark):
        """r8 distinct-key engine: exact copies take the within class
        (direct key equi-join, no PassJoin work), near-dups the across
        class — output must equal brute force on a corpus where every
        text appears 4x."""
        texts = [
            "the quick brown fox",
            "the quick brown fx",      # distance 1 from the first
            "a different sentence",
            "a different sentenc",     # distance 1 from the third
            "unrelated content here",
        ]
        rows = [(10 * i + c, t) for i, t in enumerate(texts) for c in range(4)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, max_distance=2).collect()
        }
        truth = _brute_pairs(rows, 2)
        assert got == truth
        # non-vacuous: both classes fired (dist-0 copies and dist-1 pairs)
        assert {d for _, _, d in got} == {0, 1}

    def test_bad_distance(self, spark):
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="max_distance"):
            edit_distance_pairs(df, max_distance=0)


# ---------------------------------------------------------------------------
# knn_join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(60)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestKnnJoin:
    def test_self_knn_excludes_self_and_ranks(self, vec_df):
        out = knn_join(
            vec_df.selectExpr("vec_id as query_id", "embedding as query_vec"),
            vec_df,
            dim=8,
            k=3,
            n_clusters=4,
            n_probe=4,  # probe everything -> exact
            exclude_self=True,
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        pdf = vec_df.toPandas()
        X = np.array(pdf["embedding"].tolist())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cos = Xn @ Xn.T
        for q, rows in by_q.items():
            rows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rows] == [1, 2, 3]
            assert all(r["vec_id"] != q for r in rows)
            # top neighbor must match brute force (probe-all -> exact)
            cands = [(round(cos[q, j], 6), j) for j in range(len(X)) if j != q]
            cands.sort(key=lambda t: (-t[0], t[1]))
            assert rows[0]["vec_id"] == cands[0][1]
            assert rows[0]["cosine"] == pytest.approx(cands[0][0], abs=1e-6)

    def test_no_broadcast_of_left(self, vec_df, spark):
        """With auto-broadcast off, the cell join must be a shuffled join —
        the operator never requires either side to fit in memory."""
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = knn_join(
                vec_df.selectExpr("vec_id as query_id", "embedding as query_vec"),
                vec_df,
                dim=8,
                k=2,
                n_clusters=4,
                n_probe=1,
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            # the probe-pairs table broadcast is fine; the corpus-side join
            # must not be a broadcast of corpus or query rows
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_distinct_query_table(self, vec_df, spark):
        queries = vec_df.where(F.col("vec_id") < 5).selectExpr(
            "vec_id + 1000 as query_id", "embedding as query_vec"
        )
        out = knn_join(queries, vec_df, dim=8, k=1, n_clusters=4, n_probe=4)
        rows = out.collect()
        assert {r["query_id"] for r in rows} == {1000, 1001, 1002, 1003, 1004}
        # probe-all exact: nearest neighbor of an identical vector is itself
        for r in rows:
            assert r["vec_id"] == r["query_id"] - 1000
            assert r["cosine"] == pytest.approx(1.0, abs=1e-6)


class TestEditDistanceRecallProperty:
    def test_directed_mutations_always_found(self, spark):
        """Stronger than random fuzz: apply exactly <= d random edits
        (insert/delete/substitute at random positions) to random base
        strings — the PassJoin pigeonhole guarantees every such pair is
        a candidate, so every pair MUST appear in the output."""
        from sat_bucket_spark.operators.dedup import edit_distance_pairs

        rng = np.random.default_rng(11)
        alphabet = list("abcdefghij ")
        rows = []
        expected = set()
        for i in range(25):
            n = int(rng.integers(8, 60))
            base = "".join(rng.choice(alphabet, n))
            rows.append((2 * i, base))
            s = list(base)
            for _ in range(int(rng.integers(1, 3))):  # 1..2 edits
                op = rng.integers(0, 3)
                pos = int(rng.integers(0, max(len(s), 1)))
                if op == 0 and len(s) > 1:
                    del s[pos]
                elif op == 1:
                    s.insert(pos, str(rng.choice(alphabet)))
                else:
                    if pos < len(s):
                        s[pos] = str(rng.choice(alphabet))
            mutated = "".join(s)
            rows.append((2 * i + 1, mutated))
            # the pair is expected iff still within distance 2 after
            # normalization (substitute-with-same-char reduces distance)
            got = _brute_pairs([(2 * i, base), (2 * i + 1, mutated)], 2)
            expected |= got
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        found = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, max_distance=2).collect()
        }
        # every directed mutation pair must be recalled…
        missing = {(a, b, d) for (a, b, d) in expected if b == a + 1} - found
        assert not missing, f"PassJoin missed guaranteed pairs: {missing}"
        # …and nothing outside the brute-force truth may appear
        truth = _brute_pairs(rows, 2)
        assert found == truth

    def test_no_cartesian_in_plan(self, spark):
        from sat_bucket_spark.operators.dedup import edit_distance_pairs

        df = spark.createDataFrame(
            [(i, f"document number {i}") for i in range(20)], ["doc_id", "text"]
        )
        plan = (
            edit_distance_pairs(df, max_distance=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestEditCollapseRouting:
    def test_forced_modes_identical(self, spark):
        from sat_bucket_spark.operators.dedup import edit_distance_pairs

        texts = ["the quick brown fox", "the quick brown fx", "other text", "other test"]
        rows = [(10 * i + c, t) for i, t in enumerate(texts) for c in range(3)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        a = sorted(tuple(r) for r in edit_distance_pairs(df, max_distance=2, collapse=True).collect())
        b = sorted(tuple(r) for r in edit_distance_pairs(df, max_distance=2, collapse=False).collect())
        assert a == b and len(a) > 0

    def test_routing_modes_emit_identical_schema(self, spark):
        # the dist dtype must not flip with the route: collapse='auto'
        # picks a physical plan from measured duplicate fraction, and a
        # data-dependent schema breaks fixed-schema parquet appends
        from sat_bucket_spark.operators.dedup import edit_distance_pairs

        df = spark.createDataFrame(
            [(1, "hello"), (2, "hello"), (3, "hallo"), (4, "world")],
            ["doc_id", "text"],
        )
        schemas = {
            str(mode): edit_distance_pairs(
                df, max_distance=1, collapse=mode
            ).schema.simpleString()
            for mode in (True, False, "auto")
        }
        assert len(set(schemas.values())) == 1, schemas
