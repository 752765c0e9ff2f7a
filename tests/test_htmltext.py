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

    def test_latin1_fallback(self):
        # 0xFF is invalid UTF-8 and no charset declared -> latin-1 never fails
        out = decode_html_bytes(b"\xff\xfe plain")
        assert out.endswith(" plain")

    def test_bogus_declared_charset_falls_through(self):
        raw = b'<meta charset="not-a-codec"><p>\xff</p>'
        assert decode_html_bytes(raw)  # latin-1 fallback, no raise


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
