"""Bigram-LM quality scoring vs an independent Python implementation."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest


def _ref_scores(corpus_texts, test_rows, vocab_size, add_k):
    toks = lambda t: [w.lower() for w in t.split() if w]
    raw = Counter()
    for t in corpus_texts:
        raw.update(toks(t))
    vocab = {
        w for w, _ in sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    }
    m = lambda w: w if w in vocab else "<unk>"
    uni, bi = Counter(), Counter()
    for t in corpus_texts:
        ws = [m(w) for w in toks(t)]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    v = len(uni)
    out = {}
    for doc_id, t in test_rows:
        ws = [m(w) for w in toks(t)]
        ps = list(zip(ws, ws[1:]))
        if not ps:
            out[doc_id] = (0, None)
            continue
        lp = [
            math.log((bi.get(p, 0) + add_k) / (uni.get(p[0], 0) + add_k * v))
            for p in ps
        ]
        out[doc_id] = (len(ps), round(sum(lp) / len(lp), 6))
    return out


class TestBigramLm:
    def test_matches_python_reference(self, spark):
        from sat_bucket_spark.operators.lm import score_with_bigram_lm

        rng = random.Random(31)
        words = [f"w{i}" for i in range(40)]
        corpus_texts = [
            " ".join(rng.choices(words, k=rng.randint(3, 20))) for _ in range(60)
        ]
        test_rows = [
            (i, " ".join(rng.choices(words + ["zzz"], k=rng.randint(0, 15))))
            for i in range(40)
        ]
        corpus = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus_texts)], ["doc_id", "text"]
        )
        test = spark.createDataFrame(test_rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
            for r in score_with_bigram_lm(
                test, corpus, vocab_size=25, add_k=0.5
            ).collect()
        }
        want = _ref_scores(corpus_texts, test_rows, vocab_size=25, add_k=0.5)
        assert set(got) == set(want)
        for d in want:
            assert got[d][0] == want[d][0], d
            if want[d][1] is None:
                assert got[d][1] is None
            else:
                assert got[d][1] == pytest.approx(want[d][1], abs=2e-6), d

    def test_fluent_beats_gibberish(self, spark):
        from sat_bucket_spark.operators.lm import score_with_bigram_lm

        corpus = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
            ["doc_id", "text"],
        )
        test = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "xq zz vv kk pp")], ["doc_id", "text"]
        )
        rows = {
            r["doc_id"]: r["avg_logp"]
            for r in score_with_bigram_lm(test, corpus, vocab_size=50).collect()
        }
        assert rows[1] > rows[2]

    def test_model_tables_broadcast(self, spark):
        from sat_bucket_spark.operators.lm import score_with_bigram_lm

        corpus = spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"])
        test = spark.createDataFrame([(1, "a b x")], ["doc_id", "text"])
        plan = (
            score_with_bigram_lm(test, corpus)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan

    def test_train_collects_only_the_vocab(self, spark):
        """r6 shape (same-session A/B receipts in lm.py docstring): training
        launches ONE bounded collect — the vocab_size+1 probe — and the
        model count tables stay lazy, so the scoring action runs both
        reference aggregations in parallel instead of serializing three
        driver round trips. V is exact with no separate count job."""
        from sat_bucket_spark.operators.lm import train_bigram_lm

        corpus = spark.createDataFrame(
            [(i, "a b c a b d e " * 3) for i in range(20)], ["doc_id", "text"]
        )
        sc = spark.sparkContext
        sc.setJobGroup("lm-train-gate", "one vocab collect, nothing else")
        unigrams, bigrams, v = train_bigram_lm(corpus, vocab_size=4)
        sc.setJobGroup("lm-train-gate-done", "")
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("lm-train-gate"))
        # 1 collect; AQE may split it into per-shuffle jobs (<=3)
        assert n_jobs <= 3, n_jobs
        # the model tables are LAZY — the vocab inside them is the only
        # local relation; nothing was shipped to the driver yet
        for t in (unigrams, bigrams):
            plan = t._jdf.queryExecution().executedPlan().toString()
            assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
        # V = distinct mapped tokens (UNK included on overflow: 5 distinct
        # tokens, vocab_size=4 -> 4 + UNK), with no extra job
        assert v == 5
        assert v == len(unigrams.collect())
