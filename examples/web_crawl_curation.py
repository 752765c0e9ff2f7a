#!/usr/bin/env python
"""Web-crawl curation: WET archives -> filtered, span-deduped documents.

The Common Crawl-style front half of a training-data pipeline, end to end:

    WET archives (multi-member gzip)
      -> read_wet (streaming WARC parse, file-grain parallelism)
      -> gopher_quality_flags (document-level quality rules + rejection
         breakdown: WHY documents drop, not just how many)
      -> remove_duplicate_spans (substring-level exact dedup — the copied
         passage embedded mid-page that paragraph dedup can't see)
      -> canonical curated documents table

Fixture crawl data is synthesized on the fly (two .warc.gz segments with
boilerplate pages, a copied passage, and junk pages), so the example runs
anywhere with no network.

Run: python examples/web_crawl_curation.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sat_bucket_spark import get_spark, read_wet
from sat_bucket_spark.operators.dedup import remove_duplicate_spans
from sat_bucket_spark.operators.text import gopher_quality_flags
from sat_bucket_spark.warc import build_warc_bytes

PASSAGE = (
    "the quick brown fox jumps over the lazy dog and that is a passage "
    "every mirror of this page carries verbatim with it"
)


def _write_crawl(d: str) -> None:
    """Two WET segments: good pages, mirrored-passage pages, junk pages."""

    def conv(url: str, text: str) -> dict:
        return {
            "type": "conversion",
            "payload": text.encode(),
            "WARC-Target-URI": url,
            "WARC-Date": "2026-08-01T00:00:00Z",
        }

    def body(topic: str) -> str:
        # distinct per-page prose (unique topic words) so only the mirrored
        # PASSAGE is corpus-duplicated
        return " ".join(
            f"this {topic} page number {i} is about {topic} and the ways a"
            f" {topic} engine of kind {i} can be built to sort {topic} fast"
            for i in range(4)
        )

    seg0 = [
        conv("http://a.example/good1", body("database")),
        conv("http://a.example/mirror1", body("storage") + " " + PASSAGE),
        conv("http://a.example/junk-symbols", "#### #### " * 40),
        conv("http://a.example/junk-short", "too short"),
    ]
    seg1 = [
        conv("http://b.example/good2", body("compiler")),
        conv("http://b.example/mirror2", PASSAGE + " " + body("network")),
        conv(
            "http://b.example/junk-bullets",
            "\n".join(["- a bullet item of the list"] * 30),
        ),
    ]
    for i, recs in enumerate([seg0, seg1]):
        with open(os.path.join(d, f"seg-{i}.warc.gz"), "wb") as f:
            f.write(build_warc_bytes(recs, gzip_members=True))


def main(workdir: str) -> None:
    spark = get_spark(app_name="web-crawl-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    crawl = os.path.join(workdir, "crawl")
    os.makedirs(crawl, exist_ok=True)
    _write_crawl(crawl)

    # 1. ingest: WARC records -> canonical documents frame
    docs = read_wet(spark, crawl)
    print(f"ingested {docs.count()} pages from the WET segments")

    # 2. quality gate with a rejection breakdown
    flags = gopher_quality_flags(docs, min_words=20, min_stopword_hits=1)
    breakdown = flags.select(
        *[
            F.sum((~F.col(c)).cast("long")).alias(c)
            for c in flags.columns
            if c.startswith("ok_")
        ]
    )
    print("rejections per rule:")
    breakdown.show(truncate=False)

    # 3. the full pipeline as an OBSERVED funnel: quality gate then
    #    substring-level dedup (the mirrored passage survives quality
    #    filtering on BOTH pages; keep-first removal excises the copy) —
    #    one write produces every stage count, zero extra jobs
    from sat_bucket_spark.operators.metrics import observe_funnel

    funnel = observe_funnel(
        docs,
        [
            (
                "quality",
                lambda d: d.join(
                    flags.where("keep").select("doc_id"), "doc_id", "left_semi"
                ),
            ),
            (
                "span_dedup",
                lambda d: remove_duplicate_spans(
                    d, k=8, min_count=2, removed_count_col="n_removed"
                ).where(F.length("text") > 0),
            ),
        ],
    )
    out_dir = os.path.join(workdir, "curated")
    funnel.df.write.mode("overwrite").parquet(out_dir)
    print(f"funnel (one job): {funnel.counts()}")

    curated = spark.read.parquet(out_dir)
    curated.select("url", "n_removed", F.length("text").alias("n_chars")).show(
        truncate=60
    )
    total = curated.agg(F.sum("n_removed")).first()[0]
    print(f"span dedup removed {total} duplicated tokens across the corpus")

    # 4. the RAW-archive route: crawls without a WET sidecar ship response
    #    records with HTML bodies; read_warc_html splits the HTTP head
    #    (honoring its charset ahead of any <meta>), strips boilerplate,
    #    and lands the same documents shape — including a windows-1252
    #    page that a UTF-8-only decode would have mangled
    from sat_bucket_spark.warc import read_warc_html

    raw_dir = os.path.join(workdir, "raw_crawl")
    os.makedirs(raw_dir, exist_ok=True)
    cp1252_body = (
        b"<div class='nav'><a href='/'>Home</a>"
        b"<a href='http://d.example/ref'>source</a></div>"
        b"<p>\x93quoted\x94 content paragraph with enough plain words to "
        b"survive the boilerplate heuristic</p>"
    )
    responses = [
        {
            "type": "response",
            "WARC-Target-URI": "http://c.example/legacy",
            "Content-Type": "application/http; msgtype=response",
            "payload": (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=windows-1252\r\n\r\n"
                + cp1252_body
            ),
        },
        {
            "type": "response",
            "WARC-Target-URI": "http://c.example/modern",
            "Content-Type": "application/http; msgtype=response",
            "payload": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + (
                    "<p>modern utf-8 page with café and enough words to "
                    'keep</p><a href="http://d.example/ref">cite</a>'
                    '<a href="http://c.example/legacy">sibling</a>'
                ).encode("utf-8")
            ),
        },
    ]
    with open(os.path.join(raw_dir, "raw-0.warc.gz"), "wb") as f:
        f.write(build_warc_bytes(responses, gzip_members=True))
    html_docs = read_warc_html(spark, raw_dir)
    html_docs.select("url", "title", "n_kept", "text").show(truncate=60)
    legacy = html_docs.where(F.col("url").endswith("legacy")).first()
    assert "“quoted”" in legacy.text, "cp1252 page must decode via its header charset"

    # 5. crawl authority: outgoing links -> host graph -> directed
    #    PageRank — the quality-weighting signal (a page on a
    #    widely-linked host outranks link-farm output even when their
    #    text features tie)
    from sat_bucket_spark.operators.graph import pagerank
    from sat_bucket_spark.operators.htmltext import html_links
    from sat_bucket_spark.operators.urls import host_link_edges
    from sat_bucket_spark.warc import read_warc

    pages = read_warc(
        spark, raw_dir, record_types=("response",), parse_http=True
    ).withColumnRenamed("target_uri", "url")
    linked = html_links(pages, url_col="url")
    authority = pagerank(
        host_link_edges(linked), src="src_host", dst="dst_host",
        directed=True, iterations=6,
    )
    print("host authority (directed PageRank over the crawl's link graph):")
    authority.orderBy(F.desc("rank")).show(truncate=False)

    # 6. tomorrow's crawl arrives: refresh authority WARM instead of
    #    re-ranking cold — the standing ranks seed the refresh, so a few
    #    rounds land where a cold run needs many (rounds are the cost at
    #    scale: each one shuffles the full link graph)
    from sat_bucket_spark.operators.graph import update_pagerank

    edges = host_link_edges(linked)
    new_links = spark.createDataFrame(
        [("hub.example", "fresh-a.example"), ("hub.example", "fresh-b.example")],
        ["src_host", "dst_host"],
    )
    refreshed = update_pagerank(
        authority, edges.unionByName(new_links),
        src="src_host", dst="dst_host", directed=True, iterations=2,
    )
    print("warm-refreshed authority after the nightly link batch:")
    refreshed.orderBy(F.desc("rank")).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="crawl_ex_")
    try:
        main(work)
    finally:
        if len(sys.argv) <= 1:
            shutil.rmtree(work, ignore_errors=True)
