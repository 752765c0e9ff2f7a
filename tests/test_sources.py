"""Corpus source reader tests."""

from __future__ import annotations

import json

import pytest

from sat_bucket_spark.sources import read_corpus


@pytest.fixture()
def corpus_rows():
    return [
        {"doc_id": 1, "text": "alpha beta", "lang": "en"},
        {"doc_id": 2, "text": "gamma delta", "lang": "de"},
        {"doc_id": 3, "text": "alpha beta", "lang": "en"},
    ]


def test_parquet_passthrough(spark, tmp_path, corpus_rows):
    d = str(tmp_path / "p")
    spark.createDataFrame(corpus_rows).write.parquet(d)
    df = read_corpus(spark, d, fmt="parquet")
    assert df.count() == 3 and "doc_id" in df.columns


def test_jsonl_with_schema(spark, tmp_path, corpus_rows):
    f = tmp_path / "c.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in corpus_rows))
    df = read_corpus(
        spark, str(f), fmt="jsonl", schema="doc_id LONG, text STRING, lang STRING"
    )
    got = sorted((r["doc_id"], r["text"]) for r in df.collect())
    assert got[0] == (1, "alpha beta") and len(got) == 3


def test_csv(spark, tmp_path):
    f = tmp_path / "c.csv"
    f.write_text("doc_id,text\n1,hello there\n2,more text\n")
    df = read_corpus(spark, str(f), fmt="csv", schema="doc_id LONG, text STRING")
    assert df.count() == 2
    assert {r["text"] for r in df.collect()} == {"hello there", "more text"}


def test_text_lines_derive_content_id(spark, tmp_path):
    f = tmp_path / "c.txt"
    f.write_text("one line\nanother line\none line\n")
    df = read_corpus(spark, str(f), fmt="text")
    rows = df.collect()
    assert len(rows) == 3 and all(r["doc_id"] is not None for r in rows)
    ids = {}
    for r in rows:
        ids.setdefault(r["text"], set()).add(r["doc_id"])
    # identical text -> identical derived id; distinct text -> distinct id
    assert all(len(v) == 1 for v in ids.values())
    assert ids["one line"] != ids["another line"]


def test_whole_files(spark, tmp_path):
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "a.txt").write_text("doc A\nline two")
    (tmp_path / "docs" / "b.txt").write_text("doc B")
    df = read_corpus(spark, str(tmp_path / "docs"), fmt="text", whole_files=True)
    rows = {r["source_file"]: r["text"] for r in df.collect()}
    assert rows == {"a.txt": "doc A\nline two", "b.txt": "doc B"}


def test_missing_text_col_raises(spark, tmp_path):
    d = str(tmp_path / "p2")
    spark.createDataFrame([(1, "x")], ["doc_id", "body"]).write.parquet(d)
    with pytest.raises(ValueError):
        read_corpus(spark, d, fmt="parquet")


def test_unknown_format(spark):
    with pytest.raises(ValueError):
        read_corpus(spark, "/tmp/x", fmt="xml")


class TestWarc:
    """WARC/WET web-archive ingestion (ISO 28500; Common Crawl layout)."""

    RECS = [
        {"type": "warcinfo", "payload": b"software: fixture\r\n"},
        {
            "type": "response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hello</html>",
            "WARC-Target-URI": "http://example.com/a",
        },
        {
            "type": "conversion",
            "payload": "extracted text one".encode(),
            "WARC-Target-URI": "http://example.com/a",
            "WARC-Date": "2026-01-01T00:00:00Z",
        },
        {
            "type": "conversion",
            "payload": "extracted text two éè".encode(),
            "WARC-Target-URI": "http://example.com/b",
            "WARC-Date": "2026-01-02T00:00:00Z",
        },
    ]

    def _archive_dir(self, tmp_path):
        from sat_bucket_spark.warc import build_warc_bytes

        d = tmp_path / "crawl"
        d.mkdir(exist_ok=True)
        # one plain file, one per-record-gzipped file (the CC layout)
        (d / "seg-0.warc").write_bytes(build_warc_bytes(self.RECS[:2]))
        (d / "seg-1.warc.gz").write_bytes(
            build_warc_bytes(self.RECS[2:], gzip_members=True)
        )
        return str(d)

    def test_parser_round_trip_plain_and_gzip(self):
        from sat_bucket_spark.warc import build_warc_bytes, iter_warc_records

        for gz in (False, True):
            got = list(
                iter_warc_records(build_warc_bytes(self.RECS, gzip_members=gz))
            )
            assert [r["headers"]["warc-type"] for r in got] == [
                "warcinfo", "response", "conversion", "conversion",
            ]
            assert got[1]["payload"].endswith(b"</html>")
            assert got[3]["payload"].decode() == "extracted text two éè"

    def test_parser_streams_across_chunk_boundaries(self):
        """Payloads larger than the inflate chunk exercise the incremental
        multi-member reader."""
        from sat_bucket_spark.warc import build_warc_bytes, iter_warc_records

        recs = [
            {"type": "conversion", "payload": bytes([i % 251]) * 700_000}
            for i in range(3)
        ]
        for gz in (False, True):
            got = list(
                iter_warc_records(build_warc_bytes(recs, gzip_members=gz))
            )
            assert [r["payload"] for r in got] == [r["payload"] for r in recs]

    def test_truncated_strict_raises_lenient_salvages(self):
        from sat_bucket_spark.warc import build_warc_bytes, iter_warc_records

        data = build_warc_bytes(self.RECS)
        trunc = data[:-30]
        with pytest.raises(ValueError, match="truncated"):
            list(iter_warc_records(trunc))
        assert len(list(iter_warc_records(trunc, strict=False))) == 3

    def test_read_warc_all_records(self, spark, tmp_path):
        from sat_bucket_spark.warc import read_warc

        df = read_warc(spark, self._archive_dir(tmp_path))
        rows = df.collect()
        assert sorted(r["warc_type"] for r in rows) == [
            "conversion", "conversion", "response", "warcinfo",
        ]
        by_type = {r["warc_type"]: r for r in rows}
        assert by_type["response"]["target_uri"] == "http://example.com/a"
        assert by_type["response"]["source_file"] == "seg-0.warc"
        assert by_type["conversion"]["source_file"] == "seg-1.warc.gz"

    def test_read_warc_type_filter_and_http_strip(self, spark, tmp_path):
        from sat_bucket_spark.warc import read_warc

        df = read_warc(
            spark,
            self._archive_dir(tmp_path),
            record_types=("response",),
            strip_http_headers=True,
        )
        rows = df.collect()
        assert len(rows) == 1
        assert bytes(rows[0]["payload"]) == b"<html>hello</html>"
        assert rows[0]["content_length"] == len(b"<html>hello</html>")

    def test_read_wet_canonical_documents(self, spark, tmp_path):
        from sat_bucket_spark.warc import read_wet

        docs = read_wet(spark, self._archive_dir(tmp_path)).orderBy("url")
        rows = docs.collect()
        assert [r["url"] for r in rows] == [
            "http://example.com/a", "http://example.com/b",
        ]
        assert rows[0]["text"] == "extracted text one"
        assert rows[1]["text"] == "extracted text two éè"
        assert rows[0]["fetch_date"] == "2026-01-01T00:00:00Z"
        # deterministic content id: same text => same id across re-reads
        again = read_wet(spark, self._archive_dir(tmp_path)).orderBy("url").collect()
        assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in again]


class TestWarcStreaming:
    """Continuous crawl ingestion: the WARC parse in Structured Streaming."""

    def _write_seg(self, d, name, urls):
        from sat_bucket_spark.warc import build_warc_bytes

        recs = [
            {
                "type": "conversion",
                "payload": f"text of {u}".encode(),
                "WARC-Target-URI": u,
                "WARC-Date": "2026-08-01T00:00:00Z",
            }
            for u in urls
        ]
        (d / name).write_bytes(build_warc_bytes(recs, gzip_members=True))

    def test_streaming_parse_and_incremental_pickup(self, spark, tmp_path):
        from sat_bucket_spark.warc import read_wet

        crawl = tmp_path / "crawl"
        crawl.mkdir()
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        self._write_seg(crawl, "seg-0.warc.gz", ["u/a", "u/b"])

        docs = read_wet(spark, str(crawl), streaming=True)
        assert docs.isStreaming

        def run():
            q = (
                docs.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        got = {
            r["url"]: r["text"] for r in spark.read.parquet(out).collect()
        }
        assert got == {"u/a": "text of u/a", "u/b": "text of u/b"}

        # a new segment arrives; the checkpoint makes pickup incremental —
        # the second run parses ONLY the new file (sink appends)
        self._write_seg(crawl, "seg-1.warc.gz", ["u/c"])
        run()
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 3  # not 5: seg-0 was not re-parsed
        assert {r["url"] for r in rows} == {"u/a", "u/b", "u/c"}


def test_orc(spark, tmp_path, corpus_rows):
    src = str(tmp_path / "docs_orc")
    spark.createDataFrame(corpus_rows).write.orc(src)
    df = read_corpus(spark, src, fmt="orc")
    assert sorted((r["doc_id"], r["text"]) for r in df.collect()) == sorted(
        (d["doc_id"], d["text"]) for d in corpus_rows
    )


def test_corrupt_gzip_member_strict_and_salvage():
    """zlib-level corruption follows the same strict/salvage contract as
    WARC-format corruption (ValueError, never a raw zlib.error)."""
    import gzip

    from sat_bucket_spark.warc import build_warc_bytes, iter_warc_records

    good = build_warc_bytes(
        [{"type": "conversion", "payload": b"fine"}], gzip_members=True
    )
    # append a second "member" of garbage that starts with the gzip magic
    corrupt = good + b"\x1f\x8b" + b"\x00" * 40
    with pytest.raises(ValueError, match="corrupt gzip"):
        list(iter_warc_records(corrupt))
    salvaged = list(iter_warc_records(corrupt, strict=False))
    assert len(salvaged) == 1 and salvaged[0]["payload"] == b"fine"


def test_warc_parser_never_leaks_raw_errors():
    """Fuzz: arbitrary truncations/corruptions of a valid archive either
    parse, raise ValueError (strict), or salvage a prefix (lenient) — no
    other exception type ever escapes, and salvage yields only intact
    records."""
    import random

    from sat_bucket_spark.warc import build_warc_bytes, iter_warc_records

    recs = [
        {"type": "conversion", "payload": bytes([i]) * (17 * i + 3)}
        for i in range(6)
    ]
    rng = random.Random(5)
    for gz in (False, True):
        data = build_warc_bytes(recs, gzip_members=gz)
        for _ in range(80):
            mode = rng.randrange(3)
            if mode == 0:  # truncate
                mutated = data[: rng.randrange(len(data))]
            elif mode == 1:  # flip a byte
                i = rng.randrange(len(data))
                mutated = data[:i] + bytes([data[i] ^ 0xFF]) + data[i + 1 :]
            else:  # splice garbage into the middle
                i = rng.randrange(len(data))
                mutated = data[:i] + bytes(rng.randrange(256) for _ in range(9)) + data[i:]
            try:
                strict_out = list(iter_warc_records(mutated))
            except ValueError:
                strict_out = None
            except Exception as e:  # noqa: BLE001
                raise AssertionError(f"strict leaked {type(e).__name__}: {e}")
            try:
                lenient = list(iter_warc_records(mutated, strict=False))
            except Exception as e:  # noqa: BLE001
                raise AssertionError(f"lenient raised {type(e).__name__}: {e}")
            if strict_out is not None:
                assert lenient == strict_out


class TestWarcPathsOnly:
    """r6 rework: tasks stream archives from paths — bytes never ship as rows."""

    def test_iter_warc_records_accepts_file_object(self, tmp_path):
        from sat_bucket_spark.warc import build_warc_bytes, iter_warc_records

        recs = [
            {"type": "warcinfo", "payload": b"software: fixture\r\n"},
            {"type": "conversion", "payload": b"hello world",
             "WARC-Target-URI": "http://example.com/a"},
        ]
        p = tmp_path / "a.warc.gz"
        p.write_bytes(build_warc_bytes(recs, gzip_members=True))
        with open(p, "rb") as fh:
            got = list(iter_warc_records(fh))
        assert [r["payload"] for r in got] == [b"software: fixture\r\n", b"hello world"]
        # and plain (non-gzip) via file object too
        p2 = tmp_path / "a.warc"
        p2.write_bytes(build_warc_bytes(recs))
        with open(p2, "rb") as fh:
            assert len(list(iter_warc_records(fh))) == 2

    def test_plan_ships_paths_not_content(self, spark, tmp_path):
        from sat_bucket_spark.warc import build_warc_bytes, read_warc

        (tmp_path / "x.warc").write_bytes(
            build_warc_bytes([{"type": "conversion", "payload": b"t"}])
        )
        df = read_warc(spark, str(tmp_path))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # binaryFile scan is column-pruned to path: the 'content' column
        # (and with it the 2 GiB cap + triple copy) never materializes
        assert "ReadSchema: struct<path:string>" in plan, plan

    def test_large_multi_member_archive_streams(self, spark, tmp_path):
        """64 MB synthetic multi-member gzip — far past the Arrow comfort
        zone the old content-shipping path would have materialized 3x."""
        import gzip

        from sat_bucket_spark.warc import read_warc

        payload = b"x" * (1 << 20)  # 1 MiB per record
        block = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload
            + b"\r\n\r\n"
        )
        member = gzip.compress(block)
        n = 64
        with open(tmp_path / "big.warc.gz", "wb") as fh:
            for _ in range(n):  # ~64 MiB decompressed, one member per record
                fh.write(member)
        from pyspark.sql import functions as F

        df = read_warc(spark, str(tmp_path), batch_records=8)
        agg = df.groupBy().agg(
            F.count("*").alias("n"), F.sum("content_length").alias("total")
        ).collect()[0]
        assert agg["n"] == n
        assert agg["total"] == n * len(payload)


class TestOpenInputSchemes:
    """_open_input must translate Hadoop scheme aliases before pyarrow
    (regression: s3a:// URIs from Spark's listings hit from_uri raw)."""

    def test_hadoop_aliases_translate(self, monkeypatch):
        import sat_bucket_spark.warc as warc_mod
        from sat_bucket_spark.warc import _open_input

        seen = []

        class _FakeFS:
            def open_input_stream(self, p):
                return ("stream", p)

        def fake_from_uri(uri):
            seen.append(uri)
            return _FakeFS(), uri.split("://", 1)[1]

        monkeypatch.setattr(warc_mod, "_filesystem_from_uri", fake_from_uri)
        for alias, want in [
            ("s3a://bkt/a.warc.gz", "s3://bkt/a.warc.gz"),
            ("s3n://bkt/b.warc", "s3://bkt/b.warc"),
            ("s3://bkt/c.warc", "s3://bkt/c.warc"),
            ("abfss://c@acct.dfs.example.com/d.warc", "abfs://c@acct.dfs.example.com/d.warc"),
            ("gs://bkt/e.warc", "gs://bkt/e.warc"),
        ]:
            seen.clear()
            kind, p = _open_input(alias)
            assert seen == [want], alias
            assert kind == "stream" and p == want.split("://", 1)[1]

    def test_unsupported_scheme_names_the_problem(self, monkeypatch):
        import sat_bucket_spark.warc as warc_mod
        from sat_bucket_spark.warc import _open_input

        def fake_from_uri(uri):
            raise OSError("unrecognized filesystem")

        monkeypatch.setattr(warc_mod, "_filesystem_from_uri", fake_from_uri)
        with pytest.raises(ValueError, match="supported schemes"):
            _open_input("weird://x/y.warc")

    def test_local_paths_untouched(self, tmp_path):
        from sat_bucket_spark.warc import _open_input

        f = tmp_path / "x.bin"
        f.write_bytes(b"abc")
        with _open_input(str(f)) as fh:
            assert fh.read() == b"abc"
        with _open_input(f.as_uri()) as fh:
            assert fh.read() == b"abc"
