"""Tests for round-2 curation operators: PII, chunking, stratified sampling,
sketches/heavy-hitters."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.operators.chunking import chunk_documents
from sat_bucket_spark.operators.pii import (
    PII_TYPES,
    add_pii_counts,
    pii_summary,
    redact_pii,
)
from sat_bucket_spark.operators.sampling import stratified_hash_sample
from sat_bucket_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    heavy_hitters,
)


class TestPII:
    SAMPLES = [
        (1, "reach me at alice.smith+work@example.co.uk today"),
        (2, "card 4111-1111-1111-1111 expires soon"),
        (3, "ssn 123-45-6789 on file"),
        (4, "call (555) 867-5309 or 555.867.5309"),
        (5, "host 192.168.0.1 and 10.0.0.255"),
        (6, "nothing sensitive here"),
        (7, "two mails: a@b.io and c@d.org; ip 1.2.3.4"),
    ]

    def test_counts(self, spark):
        df = spark.createDataFrame(self.SAMPLES, ["doc_id", "text"])
        rows = {r["doc_id"]: r for r in add_pii_counts(df).collect()}
        assert rows[1]["n_email"] == 1
        assert rows[2]["n_credit_card"] == 1
        assert rows[3]["n_ssn"] == 1
        assert rows[4]["n_phone"] == 2
        assert rows[5]["n_ipv4"] == 2
        assert all(rows[6][f"n_{t}"] == 0 for t in PII_TYPES)
        assert rows[7]["n_email"] == 2 and rows[7]["n_ipv4"] == 1

    def test_redact(self, spark):
        df = spark.createDataFrame(self.SAMPLES, ["doc_id", "text"])
        out = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
        assert out[1] == "reach me at [EMAIL] today"
        assert out[2] == "card [CREDIT_CARD] expires soon"
        assert out[3] == "ssn [SSN] on file"
        assert out[4] == "call [PHONE] or [PHONE]"
        assert out[5] == "host [IPV4] and [IPV4]"
        assert out[6] == "nothing sensitive here"
        # redacted text carries no residual digits/@ from the original PII
        assert "@" not in out[7] and "1.2.3.4" not in out[7]

    def test_redact_subset_and_out_col(self, spark):
        df = spark.createDataFrame(self.SAMPLES, ["doc_id", "text"])
        out = {
            r["doc_id"]: r["clean"]
            for r in redact_pii(df, types=["email"], out="clean").collect()
        }
        assert out[1] == "reach me at [EMAIL] today"
        assert out[3] == "ssn 123-45-6789 on file"  # ssn untouched

    def test_unknown_type_raises(self, spark):
        df = spark.createDataFrame(self.SAMPLES, ["doc_id", "text"])
        with pytest.raises(ValueError):
            add_pii_counts(df, types=["email", "passport"])
        with pytest.raises(ValueError):
            redact_pii(df, types=["nope"])

    def test_summary(self, spark):
        df = spark.createDataFrame(self.SAMPLES, ["doc_id", "text"])
        row = pii_summary(df).collect()[0]
        assert row["docs_email"] == 2 and row["total_email"] == 3
        assert row["docs_ipv4"] == 2 and row["total_ipv4"] == 3
        assert row["docs_ssn"] == 1


class TestChunking:
    def test_char_chunks_cover_text(self, spark):
        text = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = sorted(
            chunk_documents(df, chunk_size=10, overlap=0).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk"] for r in rows] == ["abcdefghij", "klmnopqrst", "uvwxyz"]
        assert all(r["n_chunks"] == 3 for r in rows)
        assert [r["chunk_id"] for r in rows] == [0, 1, 2]

    def test_overlap(self, spark):
        df = spark.createDataFrame([(1, "0123456789")], ["doc_id", "text"])
        rows = sorted(
            chunk_documents(df, chunk_size=4, overlap=2).collect(),
            key=lambda r: r["chunk_id"],
        )
        chunks = [r["chunk"] for r in rows]
        # stride 2: starts 0,2,4,6,8 -> ceil((10-4)/2)+1 = 4 chunks
        assert chunks == ["0123", "2345", "4567", "6789"]
        for a, b in zip(chunks, chunks[1:]):
            assert a[-2:] == b[:2]

    def test_exact_fit_no_trailing_chunk(self, spark):
        df = spark.createDataFrame([(1, "12345678")], ["doc_id", "text"])
        rows = chunk_documents(df, chunk_size=4, overlap=0).collect()
        assert sorted(r["chunk"] for r in rows) == ["1234", "5678"]

    def test_empty_doc_yields_one_empty_chunk(self, spark):
        df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
        rows = chunk_documents(df, chunk_size=4).collect()
        assert len(rows) == 1 and rows[0]["chunk"] == "" and rows[0]["n_chunks"] == 1

    def test_word_unit_normalizes_whitespace(self, spark):
        df = spark.createDataFrame([(1, "a  b\tc d e")], ["doc_id", "text"])
        rows = sorted(
            chunk_documents(df, chunk_size=2, overlap=0, unit="word").collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk"] for r in rows] == ["a b", "c d", "e"]

    def test_keep_cols_passthrough(self, spark):
        df = spark.createDataFrame([(1, "abcd", "en")], ["doc_id", "text", "lang"])
        rows = chunk_documents(df, chunk_size=2, keep_cols=["lang"]).collect()
        assert all(r["lang"] == "en" for r in rows)

    def test_bad_params(self, spark):
        df = spark.createDataFrame([(1, "abcd")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_size=0)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_size=4, overlap=4)
        with pytest.raises(ValueError):
            chunk_documents(df, unit="sentence")


class TestStratifiedSample:
    def _docs(self, spark, n=3000):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "en")
            .when(F.col("id") % 3 == 1, "de")
            .otherwise("fr")
            .alias("lang"),
        )

    def test_fractions_and_determinism(self, spark):
        df = self._docs(spark)
        out = stratified_hash_sample(
            df, "doc_id", "lang", {"en": 0.5, "de": 0.2}, default_fraction=0.0
        )
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert "fr" not in counts  # default 0 drops unmapped strata
        assert counts["en"] == pytest.approx(500, rel=0.15)
        assert counts["de"] == pytest.approx(200, rel=0.25)
        # deterministic: identical plan -> identical rows
        ids1 = sorted(r["doc_id"] for r in out.collect())
        ids2 = sorted(r["doc_id"] for r in out.collect())
        assert ids1 == ids2

    def test_nested_samples(self, spark):
        df = self._docs(spark)
        small = stratified_hash_sample(df, "doc_id", "lang", {"en": 0.2}, 0.0)
        big = stratified_hash_sample(df, "doc_id", "lang", {"en": 0.6}, 0.0)
        s = {r["doc_id"] for r in small.collect()}
        b = {r["doc_id"] for r in big.collect()}
        assert s <= b  # same salt -> monotone thresholds nest

    def test_validation(self, spark):
        df = self._docs(spark, 10)
        with pytest.raises(ValueError):
            stratified_hash_sample(df, "doc_id", "lang", {"en": 1.5})
        with pytest.raises(ValueError):
            stratified_hash_sample(df, "doc_id", "lang", {}, default_fraction=-0.1)


class TestSketches:
    def test_approx_distinct_tolerance(self, spark):
        df = spark.range(20000).select((F.col("id") % 3777).alias("v"))
        est = approx_distinct(df, ["v"], rsd=0.02).collect()[0]["n_distinct_v"]
        assert est == pytest.approx(3777, rel=0.1)

    def test_approx_distinct_grouped(self, spark):
        df = spark.range(10000).select(
            (F.col("id") % 2).alias("g"), (F.col("id") % 500).alias("v")
        )
        rows = {r["g"]: r["n_distinct_v"] for r in approx_distinct(df, ["v"], group_by=["g"]).collect()}
        for g in (0, 1):
            assert rows[g] == pytest.approx(250, rel=0.1)

    def test_approx_quantiles(self, spark):
        df = spark.range(1, 10001).select(F.col("id").cast("double").alias("x"))
        row = approx_quantiles(df, "x", [0.5, 0.9], accuracy=10000).collect()[0]
        assert row["q_0_5"] == pytest.approx(5000, rel=0.01)
        assert row["q_0_9"] == pytest.approx(9000, rel=0.01)
        with pytest.raises(ValueError):
            approx_quantiles(df, "x", [1.5])

    def test_heavy_hitters_global_exact(self, spark):
        data = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 30 + [("d",)] * 5
        df = spark.createDataFrame(data, ["v"])
        rows = heavy_hitters(df, "v", k=3).orderBy("rank").collect()
        # tie between b and c broken by value asc
        assert [(r["v"], r["n"], r["rank"]) for r in rows] == [
            ("a", 50, 1), ("b", 30, 2), ("c", 30, 3),
        ]

    def test_heavy_hitters_global_plan_is_take_ordered(self, spark):
        df = spark.createDataFrame([("a",)] * 10, ["v"])
        plan = heavy_hitters(df, "v", k=2)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrdered" in plan

    def test_heavy_hitters_grouped(self, spark):
        data = [(1, "x")] * 4 + [(1, "y")] * 2 + [(2, "z")] * 3 + [(2, "x")] * 3
        df = spark.createDataFrame(data, ["g", "v"])
        rows = heavy_hitters(df, "v", k=1, group_by=["g"]).collect()
        got = {r["g"]: (r["v"], r["n"]) for r in rows}
        assert got == {1: ("x", 4), 2: ("x", 3)}  # tie at g=2 -> value asc

    def test_heavy_hitters_validation(self, spark):
        df = spark.createDataFrame([("a",)], ["v"])
        with pytest.raises(ValueError):
            heavy_hitters(df, "v", k=0)


class TestNormalizeText:
    def test_all_passes(self, spark):
        from sat_bucket_spark.operators.text import normalize_text

        df = spark.createDataFrame(
            [(1, "“Hi” – there…  \tok\x01\x7f  end")],
            ["doc_id", "text"],
        )
        out = normalize_text(df).collect()[0]["text"]
        assert out == '"Hi" - there... ok end'

    def test_flags_off(self, spark):
        from sat_bucket_spark.operators.text import normalize_text

        df = spark.createDataFrame([(1, "A  B’s")], ["doc_id", "text"])
        out = normalize_text(
            df, collapse_whitespace=False, normalize_punct=False
        ).collect()[0]["text"]
        assert out == "A  B’s"
        low = normalize_text(df, lowercase=True, out="norm").collect()[0]["norm"]
        assert low == "a b's"


class TestChunkingProperties:
    def test_random_coverage_roundtrip(self, spark):
        """Non-overlapping chunks concatenate back to the original text;
        overlapping chunks agree on their shared prefix/suffix."""
        import numpy as np

        rng = np.random.default_rng(11)
        alphabet = np.array(list("abcdefgh "))
        rows = []
        for i in range(40):
            n = int(rng.integers(0, 200))
            rows.append((i, "".join(rng.choice(alphabet, n))))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        texts = dict(rows)

        out = chunk_documents(df, chunk_size=30, overlap=0).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
        for doc, chunks in by_doc.items():
            joined = "".join(chunks[i] for i in range(len(chunks)))
            assert joined == texts[doc]

        out2 = chunk_documents(df, chunk_size=30, overlap=10).collect()
        by_doc2 = {}
        for r in out2:
            by_doc2.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
        for doc, chunks in by_doc2.items():
            for i in range(len(chunks) - 1):
                a, b = chunks[i], chunks[i + 1]
                assert a[20:] == b[: len(a[20:])]  # stride-20 overlap agrees


class TestClassifier:
    def test_matches_local_reference(self, spark):
        import hashlib

        from sat_bucket_spark.operators.classify import (
            classify_documents,
            seeded_classifier_weights,
        )

        w, bias = seeded_classifier_weights(n_features=16, seed=3)
        rows = [
            (0, "the quick brown fox"),
            (1, ""),
            (2, "  spaced   out   tokens "),
            (3, "Repeat repeat REPEAT"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["quality_prob"], r["keep"])
            for r in classify_documents(df, w, bias, threshold=0.5).collect()
        }

        def h31(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % (2**31 - 1)

        for doc_id, text in rows:
            toks = [t.lower() for t in text.split()]
            mean = sum(w[h31(t) % 16] for t in toks) / len(toks) if toks else 0.0
            score = round(1.0 / (1.0 + np.exp(-(bias + mean))), 6)
            assert got[doc_id][0] == pytest.approx(score, abs=1e-9)
            assert got[doc_id][1] == (score >= 0.5)

    def test_map_only_plan(self, spark):
        from sat_bucket_spark.operators.classify import (
            classify_documents,
            seeded_classifier_weights,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        w, bias = seeded_classifier_weights()
        out = classify_documents(docs, w, bias)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan

    def test_empty_doc_scores_prior(self, spark):
        from sat_bucket_spark.operators.classify import (
            classifier_score_expr,
            seeded_classifier_weights,
        )
        from pyspark.sql import functions as F

        w, bias = seeded_classifier_weights()
        df = spark.createDataFrame([("",), ("   ",)], ["text"])
        prior = round(float(1.0 / (1.0 + np.exp(-bias))), 6)
        for r in df.select(classifier_score_expr("text", w, bias).alias("s")).collect():
            assert r["s"] == pytest.approx(prior, abs=1e-9)


class TestLineFilter:
    def test_rules(self, spark):
        from sat_bucket_spark.operators.text import filter_lines

        rows = [
            (1, "this line stays fine\nno\nanother good line here"),
            (2, "enable javascript to view\nreal content with words"),
            (3, "Lorem Ipsum dolor sit\nplain words in a line"),
            (4, "x"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: r["text"] for r in filter_lines(df).collect()}
        assert got[1] == "this line stays fine\nanother good line here"
        assert got[2] == "real content with words"
        assert got[3] == "plain words in a line"  # case-insensitive marker
        assert got[4] == ""  # everything dropped -> empty

    def test_terminal_punct_rule(self, spark):
        from sat_bucket_spark.operators.text import filter_lines

        df = spark.createDataFrame(
            [(1, "a proper sentence ends here.\nno terminal punctuation line")],
            ["doc_id", "text"],
        )
        out = filter_lines(df, require_terminal_punct=True).collect()[0]["text"]
        assert out == "a proper sentence ends here."

    def test_map_only_plan(self, spark):
        from sat_bucket_spark.operators.text import filter_lines

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = filter_lines(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestParagraphDedup:
    def test_boilerplate_removed_everywhere(self, spark):
        from sat_bucket_spark.operators.dedup import remove_repeated_paragraphs

        rows = [
            (1, "unique alpha\nCOMMON FOOTER\nunique beta"),
            (2, "other text\nCOMMON FOOTER"),
            (3, "only unique content"),
            (4, "COMMON FOOTER"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: r["text"] for r in remove_repeated_paragraphs(df).collect()}
        assert got[1] == "unique alpha\nunique beta"
        assert got[2] == "other text"
        assert got[3] == "only unique content"
        assert got[4] == ""  # fully boilerplate -> empty, row kept

    def test_within_doc_repeat_not_boilerplate(self, spark):
        from sat_bucket_spark.operators.dedup import remove_repeated_paragraphs

        # "twice" repeats only WITHIN doc 1 -> not cross-document boilerplate
        df = spark.createDataFrame(
            [(1, "twice\ntwice\nmiddle"), (2, "unrelated")], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r["text"] for r in remove_repeated_paragraphs(df).collect()}
        assert got[1] == "twice\ntwice\nmiddle"

    def test_max_occurrences(self, spark):
        from sat_bucket_spark.operators.dedup import remove_repeated_paragraphs

        df = spark.createDataFrame(
            [(1, "shared"), (2, "shared"), (3, "shared")], ["doc_id", "text"]
        )
        kept2 = remove_repeated_paragraphs(df, max_occurrences=3).collect()
        assert all(r["text"] == "shared" for r in kept2)


class TestAssignShards:
    def test_partition_and_determinism(self, spark):
        from sat_bucket_spark.operators.sampling import assign_shards

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = assign_shards(docs, "doc_id", n_shards=4).select("doc_id", "shard", "shard_pos")
        rows = a.collect()
        assert {r["shard"] for r in rows} <= set(range(4))
        # positions within each shard are 1..n_shard, no gaps
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        b = {(r["doc_id"], r["shard"], r["shard_pos"]) for r in assign_shards(
            docs, "doc_id", n_shards=4
        ).select("doc_id", "shard", "shard_pos").collect()}
        assert b == {(r["doc_id"], r["shard"], r["shard_pos"]) for r in rows}

    def test_order_decorrelated_from_id(self, spark):
        from sat_bucket_spark.operators.sampling import assign_shards

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = assign_shards(docs, "doc_id", n_shards=1).collect()
        ordered_ids = [r["doc_id"] for r in sorted(rows, key=lambda r: r["shard_pos"])]
        assert ordered_ids != sorted(ordered_ids)  # hash order, not id order


class TestCDCChunking:
    def test_chunks_concatenate_to_original(self, spark):
        from sat_bucket_spark.operators.chunking import chunk_documents_cdc

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = chunk_documents_cdc(docs).collect()
        rebuilt = {}
        for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
            rebuilt[r["doc_id"]] = rebuilt.get(r["doc_id"], "") + r["chunk"]
        orig = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert rebuilt == orig
        assert len(out) > len(orig)  # non-vacuous: real splitting happened

    def test_edge_documents(self, spark):
        """Empty, shorter-than-window, and uniform docs each yield one chunk."""
        from sat_bucket_spark.operators.chunking import chunk_documents_cdc

        df = spark.createDataFrame(
            [(1, ""), (2, "ab"), (3, "x" * 7)], ["doc_id", "text"]
        )
        out = chunk_documents_cdc(df).collect()
        got = {r["doc_id"]: (r["n_chunks"], r["chunk"]) for r in out}
        assert got == {1: (1, ""), 2: (1, "ab"), 3: (1, "x" * 7)}

    def test_boundaries_resync_after_edit(self, spark):
        """The CDC property: a 1-char prefix insert shifts boundaries only
        until the next cut — most docs' later boundaries re-align (+1)."""
        from sat_bucket_spark.operators.chunking import cdc_boundaries_expr

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        edited = docs.withColumn("text", F.concat(F.lit("X"), F.col("text")))
        b1 = {r["doc_id"]: r["b"] for r in docs.select(
            "doc_id", cdc_boundaries_expr("text").alias("b")).collect()}
        b2 = {r["doc_id"]: r["b"] for r in edited.select(
            "doc_id", cdc_boundaries_expr("text").alias("b")).collect()}
        multi = [d for d in b1 if len(b1[d]) >= 2]
        resynced = sum(
            1 for d in multi if set(x + 1 for x in b1[d][1:]) & set(b2[d])
        )
        assert resynced / len(multi) > 0.8

    def test_map_only_no_shuffle(self, spark):
        from sat_bucket_spark.operators.chunking import chunk_documents_cdc

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            chunk_documents_cdc(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCDCAdversarialRoundtrip:
    def test_roundtrip_on_adversarial_strings(self, spark):
        """One batched check over hand-built adversarial inputs: marker-dense
        text, window-length runs, newline/tab soup, high-codepoint chars,
        exact multiples of the window, and boundary-at-end shapes."""
        cases = [
            "", "a", "ab" * 3, "x" * 8, "x" * 9, "x" * 64,
            "\n\t " * 40, "abcdefgh" * 16,
            "".join(chr(33 + (i * 7) % 90) for i in range(500)),
            "é" * 30 + "中文" * 20 + "🙂" * 5,
            "a b c d e f g h " * 32,
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(cases)], ["doc_id", "text"]
        )
        from sat_bucket_spark.operators.chunking import chunk_documents_cdc

        out = chunk_documents_cdc(df).collect()
        rebuilt = {}
        for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
            rebuilt[r["doc_id"]] = rebuilt.get(r["doc_id"], "") + r["chunk"]
        for i, t in enumerate(cases):
            assert rebuilt[i] == t, f"case {i} failed roundtrip"
        # chunk_id density and n_chunks consistency
        for r in out:
            assert 0 <= r["chunk_id"] < r["n_chunks"]


class TestTokenMassMixture:
    def test_mass_vs_rows_pick_different_binding_sources(self, spark):
        from sat_bucket_spark.operators.sampling import mix_sources

        rows = [(i, "a", 10) for i in range(400)] + [
            (1000 + i, "b", 100) for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
        # by rows: b (200 rows) binds -> a downsamples to ~200 rows
        by_rows = mix_sources(df, {"a": 0.5, "b": 0.5}, id_col="doc_id")
        n_rows = {r["source"]: r["count"] for r in by_rows.groupBy("source").count().collect()}
        assert n_rows["b"] == 200 and n_rows["a"] < 400
        # by mass: a (4000 tokens) binds -> a keeps ALL, b downsamples to
        # ~4000 tokens (rate 0.2 in expectation)
        by_mass = mix_sources(df, {"a": 0.5, "b": 0.5}, id_col="doc_id", mass_col="n_tokens")
        mass = {
            r["source"]: r["sum(n_tokens)"]
            for r in by_mass.groupBy("source").sum("n_tokens").collect()
        }
        assert mass["a"] == 4000  # binding source keeps everything
        assert 1500 <= mass["b"] <= 7000  # ~4000 in expectation, hash draw


class TestBlocklist:
    def test_word_boundary_matching(self, spark):
        from sat_bucket_spark.operators.text import blocklist_matches

        df = spark.createDataFrame(
            [
                (1, "the forbidden phrase appears here"),
                (2, "forbiddenphrase as one word must not match"),
                (3, "ends with FORBIDDEN Phrase"),      # case-insensitive
                (4, "has   forbidden   phrase   spaced"),  # ws-normalized
                (5, "clean document"),
            ],
            ["doc_id", "text"],
        )
        hits = blocklist_matches(df, ["forbidden phrase", "quarantine"])
        got = sorted((r["doc_id"], r["term"]) for r in hits.collect())
        assert got == [
            (1, "forbidden phrase"), (3, "forbidden phrase"),
            (4, "forbidden phrase"),
        ]

    def test_mixed_lengths_and_dedup(self, spark):
        from sat_bucket_spark.operators.text import blocklist_matches

        df = spark.createDataFrame(
            [(1, "bad bad word and a bad word again")], ["doc_id", "text"]
        )
        hits = blocklist_matches(df, ["bad", "bad word", "never here three"])
        got = sorted((r["doc_id"], r["term"]) for r in hits.collect())
        # one row per (doc, term) no matter how many occurrences
        assert got == [(1, "bad"), (1, "bad word")]

    def test_terms_as_dataframe(self, spark):
        from sat_bucket_spark.operators.text import blocklist_matches

        df = spark.createDataFrame([(1, "spam offer inside")], ["doc_id", "text"])
        terms = spark.createDataFrame(
            [("  SPAM  Offer ",), ("other",)], ["phrase"]
        )
        got = blocklist_matches(df, terms).collect()
        assert [(r["doc_id"], r["term"]) for r in got] == [(1, "spam offer")]

    def test_filter_blocklist_drops_matches_only(self, spark):
        from sat_bucket_spark.operators.text import filter_blocklist

        df = spark.createDataFrame(
            [(1, "contains spam offer"), (2, "fine"), (3, "also spam offer")],
            ["doc_id", "text"],
        )
        kept = filter_blocklist(df, ["spam offer"])
        assert sorted(r["doc_id"] for r in kept.collect()) == [2]
        assert kept.columns == df.columns

    def test_empty_blocklist_rejected(self, spark):
        import pytest as _pytest

        from sat_bucket_spark.operators.text import blocklist_matches

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with _pytest.raises(ValueError, match="empty blocklist"):
            blocklist_matches(df, ["", "   "])

    def test_broadcast_join_in_plan(self, spark):
        from sat_bucket_spark.operators.text import blocklist_matches

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = blocklist_matches(df, ["a b"])._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan  # pure Column expressions


class TestNfcNormalize:
    def test_composes_combining_marks(self, spark):
        from sat_bucket_spark.operators.text import add_nfc_normalized

        df = spark.createDataFrame(
            [(1, "café"), (2, "plain"), (3, None)], ["doc_id", "text"]
        )
        out = {r["doc_id"]: r["text"] for r in add_nfc_normalized(df).collect()}
        assert out[1] == "caf\u00e9"  # decomposed -> precomposed
        assert out[2] == "plain"
        assert out[3] is None

    def test_nfkc_folds_compatibility_forms(self, spark):
        from sat_bucket_spark.operators.text import add_nfc_normalized

        # fullwidth latin + ligature fold under NFKC, survive NFC
        df = spark.createDataFrame([(1, "Ａ ﬁ")], ["doc_id", "text"])
        nfc = add_nfc_normalized(df).collect()[0]["text"]
        nfkc = add_nfc_normalized(df, form="NFKC").collect()[0]["text"]
        assert nfc == "Ａ ﬁ"
        assert nfkc == "A fi"

    def test_invalid_form(self, spark):
        import pytest as _pytest

        from sat_bucket_spark.operators.text import add_nfc_normalized

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with _pytest.raises(ValueError, match="normalization form"):
            add_nfc_normalized(df, form="NFX")
