"""HTML text extraction + boilerplate removal (operators/htmltext.py).

Pure-Python units first (parser semantics pinned on hand fixtures), then
the Spark stage (schema, NULL contract, binary/string inputs), then the
crawl composition: WARC response records -> html_to_text -> documents.
"""

from __future__ import annotations

import pytest

from sat_bucket_spark.operators.htmltext import (
    decode_html_bytes,
    extract_blocks,
    html_text,
    html_to_text,
    main_text,
)

PAGE = """<html><head>
<title>  The   Example &amp; Page </title>
<style>p { color: red }</style>
<meta charset="utf-8">
</head><body>
<div class="nav"><a href="/">Home</a> <a href="/about">About</a></div>
<h1>Big News</h1>
<p>The first paragraph has exactly eight useful words.</p>
<script>var trap = "<p>not text</p>";</script>
<p>Second paragraph also carries more than five words
   across a line break.</p>
<div class="footer"><a href="/tos">Terms</a> &#169; 2026</div>
</body></html>"""


class TestExtractBlocks:
    def test_blocks_and_title(self):
        blocks, title = extract_blocks(PAGE)
        texts = [b["text"] for b in blocks]
        assert title == "The Example & Page"
        assert texts == [
            "Home About",
            "Big News",
            "The first paragraph has exactly eight useful words.",
            "Second paragraph also carries more than five words across a line break.",
            "Terms © 2026",
        ]

    def test_link_density_counts(self):
        blocks, _ = extract_blocks(PAGE)
        nav = blocks[0]
        # "Home" + "About" are fully inside <a>: all stripped chars linked
        assert nav["link_chars"] == nav["n_chars"] == len("Home") + len("About")
        para = blocks[2]
        assert para["link_chars"] == 0
        assert para["n_words"] == 8

    def test_script_style_content_never_leaks(self):
        assert "trap" not in html_text(PAGE)
        assert "color" not in html_text(PAGE)

    def test_nested_skip_tags(self):
        html = "<div>keep <svg><g><text>drop</text></g></svg> more</div>"
        blocks, _ = extract_blocks(html)
        assert [b["text"] for b in blocks] == ["keep more"]

    def test_void_tags_break_blocks(self):
        blocks, _ = extract_blocks("<p>one line<br>two line<hr/>three</p>")
        assert [b["text"] for b in blocks] == ["one line", "two line", "three"]

    def test_table_cells_are_blocks(self):
        blocks, _ = extract_blocks(
            "<table><tr><td>cell a</td><td>cell b</td></tr></table>"
        )
        assert [b["text"] for b in blocks] == ["cell a", "cell b"]

    def test_entities_and_charrefs(self):
        blocks, _ = extract_blocks("<p>fish &amp; chips &#8212; &lt;tag&gt;</p>")
        assert blocks[0]["text"] == "fish & chips — <tag>"

    def test_unclosed_tags_tolerated(self):
        blocks, _ = extract_blocks("<div><p>alpha<p>beta")
        assert [b["text"] for b in blocks] == ["alpha", "beta"]

    def test_empty_and_non_html(self):
        assert extract_blocks("")[0] == []
        blocks, _ = extract_blocks("just plain words, no tags")
        assert [b["text"] for b in blocks] == ["just plain words, no tags"]

    def test_inline_tags_do_not_split(self):
        blocks, _ = extract_blocks("<p>one <b>bold</b> and <i>italic</i> run</p>")
        assert [b["text"] for b in blocks] == ["one bold and italic run"]


class TestMainText:
    def test_boilerplate_dropped(self):
        text = main_text(PAGE)
        lines = text.split("\n")
        assert lines == [
            "The first paragraph has exactly eight useful words.",
            "Second paragraph also carries more than five words across a line break.",
        ]

    def test_link_density_threshold(self):
        # 6 words (passes min_words) but half the characters are linked
        html = (
            "<p><a href='x'>linked words here now</a> plain words</p>"
            "<p>fully plain text with six words</p>"
        )
        kept = main_text(html, min_words=5, max_link_density=0.4)
        assert kept == "fully plain text with six words"

    def test_min_words_knob(self):
        html = "<p>short one</p><p>this block has the five words</p>"
        assert main_text(html, min_words=2).count("\n") == 1
        assert main_text(html, min_words=5) == "this block has the five words"

    def test_main_subset_of_all(self):
        all_words = set(html_text(PAGE).split())
        main_words = set(main_text(PAGE).split())
        assert main_words <= all_words


class TestDecode:
    def test_utf8(self):
        assert decode_html_bytes("café".encode("utf-8")) == "café"

    def test_declared_charset(self):
        raw = '<meta charset="iso-8859-1"><p>café</p>'.encode("latin-1")
        assert "café" in decode_html_bytes(raw)

    def test_fallback_never_fails(self):
        # 0xFF alone is invalid UTF-8 and no charset declared -> the
        # windows-1252 fallback never raises
        out = decode_html_bytes(b"\xff plain")
        assert out.endswith(" plain")

    def test_bogus_declared_charset_falls_through(self):
        raw = b'<meta charset="not-a-codec"><p>\xff</p>'
        assert decode_html_bytes(raw)  # cp1252 fallback, no raise

    def test_windows_1252_meta(self):
        # curly quotes + en dash: cp1252 bytes 0x93/0x94/0x96 are INVALID
        # UTF-8 and undefined in iso-8859-1 proper
        raw = b'<meta charset="windows-1252"><p>\x93quoted\x94 \x96 dash</p>'
        out = decode_html_bytes(raw)
        assert "“quoted” – dash" in out

    def test_latin1_label_upgraded_to_cp1252(self):
        # WHATWG: pages declaring iso-8859-1 really mean windows-1252
        raw = b'<meta charset="iso-8859-1"><p>\x93hi\x94</p>'
        assert "“hi”" in decode_html_bytes(raw)

    def test_meta_declaration_beats_utf8_sniff(self):
        # 0xC3 0xA9 is VALID UTF-8 ("é") but the page says cp1252,
        # where those bytes are "Ã©" — the declaration must win
        raw = b'<meta charset="windows-1252"><p>caf\xc3\xa9</p>'
        assert "cafÃ©" in decode_html_bytes(raw)

    def test_http_header_beats_meta(self):
        raw = b'<meta charset="utf-8"><p>\x93x\x94</p>'
        out = decode_html_bytes(raw, declared="windows-1252")
        assert "“x”" in out

    def test_bom_beats_everything(self):
        raw = b"\xef\xbb\xbf" + '<meta charset="iso-8859-1"><p>café</p>'.encode("utf-8")
        assert "café" in decode_html_bytes(raw, declared="iso-8859-1")
        utf16 = "\ufeff<p>caf\u00e9</p>".encode("utf-16-le")
        assert "café" in decode_html_bytes(utf16)

    def test_bogus_http_header_falls_to_meta(self):
        raw = '<meta charset="utf-8"><p>café</p>'.encode("utf-8")
        assert "café" in decode_html_bytes(raw, declared="not-a-codec")


@pytest.fixture(scope="module")
def html_df(spark):
    rows = [
        (1, PAGE),
        (2, "<p>tiny</p>"),
        (3, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload string")


class TestSparkStage:
    def test_main_mode_with_meta(self, spark, html_df):
        out = html_to_text(html_df, mode="main").orderBy("doc_id").collect()
        r1, r2, r3 = out
        assert r1.text.split("\n")[0].startswith("The first paragraph")
        assert r1.title == "The Example & Page"
        assert r1.n_blocks == 5 and r1.n_kept == 2
        assert 0.0 < r1.link_density < 0.4
        assert r2.text == "" and r2.n_kept == 0  # too short, dropped
        assert r3.text is None and r3.n_blocks is None  # NULL contract

    def test_all_mode(self, spark, html_df):
        out = html_to_text(html_df, mode="all").orderBy("doc_id").collect()
        assert out[0].n_kept == out[0].n_blocks == 5
        assert out[1].text == "tiny"

    def test_binary_input(self, spark):
        df = spark.createDataFrame(
            [(1, PAGE.encode("utf-8")), (2, b"\xff<p>latin fallback body text here</p>")],
            "doc_id long, payload binary",
        )
        out = html_to_text(df, mode="main").orderBy("doc_id").collect()
        assert out[0].text.startswith("The first paragraph")
        assert "latin fallback body text here" in out[1].text

    def test_strict_raises_on_null(self, spark, html_df):
        with pytest.raises(Exception):
            html_to_text(html_df, mode="main", strict=True).collect()

    def test_meta_false_schema(self, spark, html_df):
        out = html_to_text(html_df, meta=False)
        assert out.columns == ["doc_id", "payload", "text"]

    def test_bad_mode(self, html_df):
        with pytest.raises(ValueError):
            html_to_text(html_df, mode="nope")


class TestWarcComposition:
    def test_warc_response_to_documents(self, spark, tmp_path):
        from sat_bucket_spark.warc import build_warc_bytes, read_warc

        pages = [
            (
                "http://example.com/a",
                "<html><body><div><a href='/'>nav</a></div>"
                "<p>alpha page body with enough words to keep</p></body></html>",
            ),
            (
                "http://example.com/b",
                "<html><body><p>beta page body also has enough words</p></body></html>",
            ),
        ]
        records = [
            {
                "type": "response",
                "WARC-Target-URI": uri,
                "Content-Type": "application/http; msgtype=response",
                "payload": (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + html.encode("utf-8")
                ),
            }
            for uri, html in pages
        ]
        path = tmp_path / "crawl.warc"
        path.write_bytes(build_warc_bytes(records))

        raw = read_warc(spark, str(path), strip_http_headers=True).where(
            "warc_type = 'response'"
        )
        docs = html_to_text(raw, html_col="payload", mode="main")
        rows = {r.target_uri: r.text for r in docs.collect()}
        assert rows["http://example.com/a"] == (
            "alpha page body with enough words to keep"
        )
        assert rows["http://example.com/b"] == (
            "beta page body also has enough words"
        )


class TestReadWarcHtml:
    """Raw-WARC HTML route (warc.read_warc_html): response records ->
    charset-aware decode -> boilerplate removal -> documents frame."""

    @staticmethod
    def _crawl(tmp_path):
        from sat_bucket_spark.warc import build_warc_bytes

        body_utf8 = (
            '<meta charset="utf-8"><p>utf eight page body with café and '
            "enough plain words to survive the gate</p>"
        ).encode("utf-8")
        # windows-1252 page: curly quotes 0x93/0x94 are INVALID UTF-8; the
        # HTTP header is the only charset declaration
        body_cp1252 = (
            b"<p>\x93windows page\x94 body carries enough plain words "
            b"to survive the quality gate</p>"
        )
        # header lies (none) but <meta> declares cp1252
        body_meta_only = (
            b'<meta charset="windows-1252"><p>\x96 meta declared page body '
            b"with enough plain words to survive the gate</p>"
        )
        def resp(uri, ctype, body):
            head = f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
            return {
                "type": "response",
                "WARC-Target-URI": uri,
                "Content-Type": "application/http; msgtype=response",
                "payload": head + body,
            }

        records = [
            resp("http://x/utf8", "text/html; charset=UTF-8", body_utf8),
            resp("http://x/cp1252", "text/html; charset=windows-1252", body_cp1252),
            resp("http://x/meta", "text/html", body_meta_only),
            resp("http://x/gif", "image/gif", b"GIF89a\x01\x00\x01\x00"),
            {
                "type": "request",
                "WARC-Target-URI": "http://x/utf8",
                "payload": b"GET /utf8 HTTP/1.1\r\n\r\n",
            },
        ]
        path = tmp_path / "crawl.warc"
        path.write_bytes(build_warc_bytes(records))
        return str(path)

    def test_html_route_and_charset_survival(self, spark, tmp_path):
        from sat_bucket_spark.warc import read_warc_html

        docs = read_warc_html(spark, self._crawl(tmp_path))
        rows = {r.url: r for r in docs.collect()}
        # the integrity gate: non-UTF-8 pages SURVIVE with correct text
        assert set(rows) == {"http://x/utf8", "http://x/cp1252", "http://x/meta"}
        assert "café" in rows["http://x/utf8"].text
        assert "“windows page”" in rows["http://x/cp1252"].text
        assert "– meta declared" in rows["http://x/meta"].text
        # doc ids are content-derived and non-null for decoded pages
        assert all(r.doc_id is not None for r in rows.values())
        assert all(r.n_kept >= 1 for r in rows.values())

    def test_non_html_dropped_early(self, spark, tmp_path):
        from sat_bucket_spark.warc import read_warc_html

        urls = [r.url for r in read_warc_html(spark, self._crawl(tmp_path)).collect()]
        assert "http://x/gif" not in urls

    def test_headerless_html_sniffed_by_markup(self, spark, tmp_path):
        from sat_bucket_spark.warc import build_warc_bytes, read_warc_html

        rec = {
            "type": "response",
            "WARC-Target-URI": "http://x/bare",
            "payload": (
                b"HTTP/1.1 200 OK\r\n\r\n"
                b"<p>bare page with no content type but enough words here</p>"
            ),
        }
        path = tmp_path / "bare.warc"
        path.write_bytes(build_warc_bytes([rec]))
        rows = read_warc_html(spark, str(path)).collect()
        assert len(rows) == 1 and rows[0].text.startswith("bare page")

    def test_headerless_binary_record_never_aborts(self, spark, tmp_path):
        # A headerless response whose body is raw binary (e.g. an image
        # served without a Content-Type) hits the markup sniff; the 64-byte
        # prefix decode must map every byte (ISO-8859-1), not raise
        # MALFORMED_CHARACTER_CODING and abort the whole job.
        from sat_bucket_spark.warc import build_warc_bytes, read_warc_html

        records = [
            {
                "type": "response",
                "WARC-Target-URI": "http://x/noisy",
                "payload": (
                    b"HTTP/1.1 200 OK\r\n\r\n"
                    b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + bytes(range(256))
                ),
            },
            {
                "type": "response",
                "WARC-Target-URI": "http://x/ok",
                "payload": (
                    b"HTTP/1.1 200 OK\r\n\r\n"
                    b"<p>good page beside the binary one with enough words</p>"
                ),
            },
        ]
        path = tmp_path / "noisy.warc"
        path.write_bytes(build_warc_bytes(records))
        rows = read_warc_html(spark, str(path)).collect()
        assert [r.url for r in rows] == ["http://x/ok"]


class TestLinks:
    def test_extract_links_order_dedup_and_schemes(self):
        from sat_bucket_spark.operators.htmltext import extract_links

        html = (
            '<a href="http://a.example/1">one</a>'
            '<a href="mailto:x@y">mail</a>'
            '<a href="javascript:void(0)">js</a>'
            '<a href="#frag">frag</a>'
            '<a href="http://b.example/2">two</a>'
            '<a href="http://a.example/1">dup</a>'
            '<script><a href="http://evil.example/x">skipped</a></script>'
        )
        assert extract_links(html) == ["http://a.example/1", "http://b.example/2"]

    def test_relative_resolution(self):
        from sat_bucket_spark.operators.htmltext import extract_links

        html = '<a href="/about">a</a><a href="../up">b</a><a href="https://x.example/z">c</a>'
        got = extract_links(html, base_url="http://site.example/dir/page.html")
        assert got == [
            "http://site.example/about",
            "http://site.example/up",
            "https://x.example/z",
        ]

    def test_html_links_operator(self, spark):
        from sat_bucket_spark.operators.htmltext import html_links

        df = spark.createDataFrame(
            [
                (1, "http://s.example/p", '<a href="/rel">r</a><a href="http://t.example/q">t</a>'),
                (2, "http://s.example/q", None),
            ],
            "doc_id long, url string, payload string",
        )
        rows = {r.doc_id: r.links for r in html_links(df, url_col="url").collect()}
        assert rows[1] == ["http://s.example/rel", "http://t.example/q"]
        assert rows[2] is None

    def test_html_to_text_links_same_decode(self, spark):
        """html_to_text(links_col=...) emits the SAME links html_links
        would — one decode pass instead of two — and a malformed payload
        yields NULL links alongside NULL text."""
        from sat_bucket_spark.operators.htmltext import html_links, html_to_text

        df = spark.createDataFrame(
            [
                (
                    1,
                    "http://s.example/p",
                    '<a href="/rel">r</a><p>body</p><a href="http://t.example/q">t</a>',
                ),
                (2, "http://s.example/q", None),
            ],
            "doc_id long, url string, payload string",
        )
        combined = {
            r.doc_id: (r.links, r.text)
            for r in html_to_text(
                df, links_col="links", links_base_col="url", min_words=1
            ).collect()
        }
        standalone = {
            r.doc_id: r.links for r in html_links(df, url_col="url").collect()
        }
        assert combined[1][0] == standalone[1]
        assert combined[1][0] == ["http://s.example/rel", "http://t.example/q"]
        assert combined[2] == (None, None)

    def test_read_warc_html_links(self, spark, tmp_path):
        """links=True resolves relative hrefs against the record URI in
        the same decode pass; links=False keeps the r8 schema."""
        from sat_bucket_spark.warc import build_warc_bytes, read_warc_html

        body = (
            b'<a href="/nav">n</a><p>page body with enough plain words '
            b'to survive</p><a href="http://other.example/x">o</a>'
        )
        rec = {
            "type": "response",
            "WARC-Target-URI": "http://site.example/a/b",
            "Content-Type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body,
        }
        p = tmp_path / "c.warc"
        p.write_bytes(build_warc_bytes([rec]))
        row = read_warc_html(spark, str(p), links=True).collect()[0]
        assert row.links == ["http://site.example/nav", "http://other.example/x"]
        assert "links" not in read_warc_html(spark, str(p)).columns

    def test_host_link_edges(self, spark):
        from sat_bucket_spark.operators.urls import host_link_edges

        df = spark.createDataFrame(
            [
                ("http://A.example/p", ["http://b.example/x", "http://a.example/self", "nota url"]),
                ("http://a.example/q", ["http://b.example/y"]),  # same host edge -> distinct
                ("http://c.example/r", None),
            ],
            "url string, links array<string>",
        )
        edges = sorted(
            (r.src_host, r.dst_host) for r in host_link_edges(df).collect()
        )
        # hosts lowercase; self-edge dropped; null links row contributes nothing
        assert edges == [("a.example", "b.example")]

    def test_crawl_to_pagerank_composition(self, spark, tmp_path):
        """Raw crawl -> html_links -> host graph -> directed PageRank:
        the authority pipeline end to end on a hand-built link structure."""
        from sat_bucket_spark.operators.graph import pagerank
        from sat_bucket_spark.operators.htmltext import html_links
        from sat_bucket_spark.operators.urls import host_link_edges
        from sat_bucket_spark.warc import build_warc_bytes, read_warc

        def page(host, links):
            body = "".join(f'<a href="{u}">l</a>' for u in links).encode()
            return {
                "type": "response",
                "WARC-Target-URI": f"http://{host}/",
                "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body,
            }

        # hub.example is linked by everyone; leaf.example links out only
        recs = [
            page("a.example", ["http://hub.example/x"]),
            page("b.example", ["http://hub.example/y", "http://a.example/"]),
            page("leaf.example", ["http://hub.example/z"]),
        ]
        p = tmp_path / "c.warc"
        p.write_bytes(build_warc_bytes(recs))
        pages = read_warc(
            spark, str(p), record_types=("response",), parse_http=True
        ).withColumnRenamed("target_uri", "url")
        linked = html_links(pages, url_col="url")
        pr = {
            r.node: r.rank
            for r in pagerank(
                host_link_edges(linked), src="src_host", dst="dst_host",
                directed=True, iterations=6,
            ).collect()
        }
        assert pr["hub.example"] == max(pr.values())  # everyone links the hub
        assert abs(sum(pr.values()) - 1.0) < 1e-9  # dangling hub mass conserved


class TestReadWarcHtmlStreaming:
    def test_streaming_matches_batch(self, spark, tmp_path):
        """The raw-HTML route in Structured Streaming: same mapInPandas
        stages, availableNow trigger, output equals the batch read."""
        from sat_bucket_spark.warc import read_warc_html

        crawl_path = TestReadWarcHtml._crawl(tmp_path)
        import os, shutil

        crawl = tmp_path / "crawl_dir"
        crawl.mkdir()
        shutil.copy(crawl_path, crawl / "seg-0.warc")

        batch = {
            (r.url, r.text)
            for r in read_warc_html(spark, str(crawl)).collect()
        }
        stream = read_warc_html(spark, str(crawl), streaming=True)
        assert stream.isStreaming
        out = str(tmp_path / "out")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r.url, r.text) for r in spark.read.parquet(out).collect()}
        assert got == batch and len(got) == 3

    def test_streaming_authority_gate(self, spark, tmp_path):
        """The crawl-authority pattern under Structured Streaming: rank
        the host graph BATCH-side (PageRank is iterative — not a
        streaming operator), then gate the streamed pages with a
        stream-static semi-join against the small rank table. Mirrors
        bench.py's warc_html_curate authority stage."""
        from pyspark.sql import functions as F

        from sat_bucket_spark.operators.graph import pagerank
        from sat_bucket_spark.operators.urls import host_link_edges, url_host_expr
        from sat_bucket_spark.warc import build_warc_bytes, read_warc_html

        def page(host, links):
            body = (
                "".join(f'<a href="{u}">l</a>' for u in links)
                + "<p>a body with several plain words in it</p>"
            ).encode()
            return {
                "type": "response",
                "WARC-Target-URI": f"http://{host}/p",
                "Content-Type": "application/http; msgtype=response",
                "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body,
            }

        # nobody links noise.example; everyone links hub.example
        recs = [
            page("a.example", ["http://hub.example/x"]),
            page("b.example", ["http://hub.example/y", "http://a.example/"]),
            page("noise.example", ["http://hub.example/z", "http://a.example/"]),
            page("hub.example", ["http://a.example/", "http://b.example/"]),
        ]
        crawl = tmp_path / "crawl"
        crawl.mkdir()
        (crawl / "seg-0.warc").write_bytes(build_warc_bytes(recs))

        ranked = pagerank(
            host_link_edges(read_warc_html(spark, str(crawl), links=True)),
            src="src_host", dst="dst_host", directed=True, iterations=4,
        )
        floor = 0.15 / 4 + 1e-9  # teleport floor of the 4-host graph
        keep = ranked.where(F.col("rank") > floor).select(
            F.col("node").alias("__keep_host")
        )
        stream = read_warc_html(spark, str(crawl), streaming=True).join(
            F.broadcast(keep),
            url_host_expr(F.col("url")) == F.col("__keep_host"),
            "left_semi",
        )
        out = str(tmp_path / "out")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept_urls = {r.url for r in spark.read.parquet(out).collect()}
        assert kept_urls == {
            "http://a.example/p",
            "http://b.example/p",
            "http://hub.example/p",
        }
