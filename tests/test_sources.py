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
