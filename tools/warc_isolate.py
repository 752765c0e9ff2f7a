#!/usr/bin/env python
"""Isolated warm-rep probe for the warc_html_curate bench key.

Replicates bench.py's fixture and timed region exactly, runs N warm reps
in ONE process, and brackets them with the bench's own smallfiles canary
so the reading carries its storage context. Attribution tool for the r16
window: code is byte-identical to r15, so warm reps tracking the canary
pins the bench delta on storage state, not the engine.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    import bench as bench_mod
    from sat_bucket_spark.session import get_spark
    from sat_bucket_spark.operators.graph import pagerank
    from sat_bucket_spark.operators.metrics import observe_funnel
    from sat_bucket_spark.operators.text import gopher_quality_flags
    from sat_bucket_spark.operators.urls import (
        host_link_edges,
        url_dedup,
        url_host_expr,
    )
    from sat_bucket_spark.warc import build_warc_bytes, read_warc_html
    from sat_bucket_spark.writers import write_jsonl_shards
    from sat_bucket_spark.operators.dedup import remove_duplicate_spans

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="warc-isolate",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    canary_dir = _tempfile.mkdtemp(prefix="warc_iso_canary_")
    sf_pre = bench_mod._smallfiles_canary_median(spark, canary_dir)
    print(f"smallfiles_pre={sf_pre} (ref {bench_mod.SMALLFILES_CANARY_REF_SEC})", flush=True)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    hfixture = docs.select(
        "doc_id",
        F.concat("text", F.lit(" htmldoc"), F.col("doc_id")).alias("text"),
    ).collect()

    def _resp(doc_id, text):
        ref = f"http://h{(doc_id * 7 + 1) % 12}.example/x".encode()
        nav = (
            b"<div class='nav'><a href='/'>Home</a> <a href='/a'>A</a>"
            b" <a href='" + ref + b"'>Ref</a></div>"
        )
        if doc_id % 13 == 0:
            body = (
                b"<p>\x93legacy\x94 "
                + text.encode("cp1252", errors="replace")
                + b"</p>"
            )
            ctype = "text/html; charset=windows-1252"
        else:
            body = b"<p>" + text.encode() + b"</p>"
            ctype = "text/html; charset=utf-8"
        head = f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
        return {
            "type": "response",
            "WARC-Target-URI": f"http://h{doc_id % 13}.example/d{doc_id}",
            "Content-Type": "application/http; msgtype=response",
            "payload": head + nav + body,
        }

    def _mirror(rec, doc_id):
        out = dict(rec)
        out["WARC-Target-URI"] = (
            f"http://H{doc_id % 13}.EXAMPLE/d{doc_id}/"
            "?utm_source=probe&gclid=x#m"
        )
        out["payload"] = rec["payload"] + b"<p>mirror of this page</p>"
        return out

    secs = []
    for rep in range(reps):
        hwork = _tempfile.mkdtemp(prefix="warc_iso_")
        try:
            hcrawl = os.path.join(hwork, "crawl")
            os.makedirs(hcrawl)
            n_hseg = 8
            for s in range(n_hseg):
                recs = []
                for i, r in enumerate(hfixture):
                    if i % n_hseg != s:
                        continue
                    rec = _resp(r["doc_id"], r["text"])
                    recs.append(rec)
                    if r["doc_id"] % 9 == 0:
                        recs.append(_mirror(rec, r["doc_id"]))
                with open(os.path.join(hcrawl, f"seg-{s}.warc.gz"), "wb") as fh:
                    fh.write(build_warc_bytes(recs, gzip_members=True))

            hstaging = os.path.join(hwork, "staged")
            hexport = os.path.join(hwork, "export")
            t0 = time.perf_counter()
            read_warc_html(spark, hcrawl, links=True).write.parquet(hstaging)
            hstaged = spark.read.parquet(hstaging)
            hedges = host_link_edges(hstaged, url_col="url", links_col="links")
            hranks = pagerank(
                hedges, src="src_host", dst="dst_host",
                damping=0.85, iterations=4, directed=True,
            )
            keep_hosts = hranks.where(F.col("rank") >= 0.02).select(
                F.col("node").alias("__keep_host")
            )
            hfunnel = observe_funnel(
                hstaged.select("doc_id", "url", "text"),
                [
                    (
                        "url_dedup",
                        lambda d: url_dedup(d, url_col="url", id_col="doc_id")
                        .where("kept")
                        .select("doc_id", "url", "text"),
                    ),
                    (
                        "quality",
                        lambda d: gopher_quality_flags(
                            d, min_words=20, min_stopword_hits=1,
                            passthrough=("url", "text"),
                        ).where("keep").select("doc_id", "url", "text"),
                    ),
                    (
                        "authority",
                        lambda d: d.join(
                            F.broadcast(keep_hosts),
                            url_host_expr(F.col("url")) == F.col("__keep_host"),
                            "left_semi",
                        ),
                    ),
                    (
                        "dup_spans",
                        lambda d: remove_duplicate_spans(
                            d, k=4, min_count=2, removed_count_col="n_removed"
                        ),
                    ),
                ],
            )
            write_jsonl_shards(hfunnel.df, hexport, n_shards=8, compression=None)
            secs.append(round(time.perf_counter() - t0, 3))
            print(f"rep {rep}: {secs[-1]}s", flush=True)
        finally:
            _shutil.rmtree(hwork, ignore_errors=True)
        bench_mod._release_state(spark)

    sf_post = bench_mod._smallfiles_canary_median(spark, canary_dir)
    _shutil.rmtree(canary_dir, ignore_errors=True)
    print(
        f"SUMMARY median={statistics.median(secs)} min={min(secs)} reps={secs} "
        f"smallfiles pre={sf_pre} post={sf_post}",
        flush=True,
    )


if __name__ == "__main__":
    main()
