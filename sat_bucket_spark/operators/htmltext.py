"""HTML text extraction and boilerplate removal for crawl curation.

The missing step between raw-crawl ingestion (``warc.read_warc`` yields
HTTP ``response`` payload bytes) and the text-quality operators
(``operators.text``): segment an HTML document into text blocks with the
tolerant stdlib parser, score each block by word count and link density,
and keep the content blocks.  The heuristic is the boilerpipe / jusText
family (Kohlschuetter et al., WSDM 2010; Pomikalek 2011) reduced to its
two strongest, language-independent signals: boilerplate blocks are
short and link-dense, content blocks are long and link-sparse.

Reference parity: sat-bucket has no HTML stage (its granules are science
payloads); this module serves the LLM-pipeline charter the same way
``warc.py`` does — crawl-in, documents-frame out.

Scale posture: the parse is per-row independent and runs Arrow-batched
inside ``mapInPandas`` — a map-only stage, no shuffle, parallel in the
input splits; at 100 TB the cost is pure CPU that scales with executors.
``html.parser`` is tolerant by construction (script/style content is
CDATA-moded, unclosed tags never raise), so one malformed page degrades
to NULL text instead of failing the task.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = [
    "extract_blocks",
    "extract_links",
    "html_text",
    "html_links",
    "main_text",
    "decode_html_bytes",
    "html_to_text",
]

# Content inside these elements is never document text.
_SKIP_TAGS = {
    "script", "style", "noscript", "template", "svg", "head",
    "iframe", "object", "audio", "video", "canvas", "map",
}
# Elements whose start OR end tag terminates the current text block.
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "br", "button",
    "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "menu", "nav", "ol", "option", "p",
    "pre", "section", "select", "table", "tbody", "td", "textarea",
    "tfoot", "th", "thead", "tr", "ul",
}


class _BlockParser(HTMLParser):
    """Segment HTML into whitespace-collapsed text blocks.

    Each block records its visible text, raw character count, and the
    raw characters contributed from inside ``<a>`` elements (the link-
    density numerator).  ``<title>`` is captured separately — it lives
    inside ``<head>``, which is otherwise skipped wholesale.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self.title_parts: list[str] = []
        self.hrefs: list[str] = []
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._skip_depth = 0
        self._a_depth = 0
        self._in_title = False

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "n_words": len(text.split()),
                    "n_chars": self._chars,
                    "link_chars": min(self._link_chars, self._chars),
                }
            )
        self._parts = []
        self._chars = 0
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag == "title":
            self._in_title = True
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._a_depth += 1
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        # Void/self-closed elements (<br/>, <hr/>) break blocks but do
        # not open a skip or link scope.
        if self._skip_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
            return
        if tag in _SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._skip_depth or not data:
            return
        self._parts.append(data)
        n = len(data.strip())
        self._chars += n
        if self._a_depth:
            self._link_chars += n

    def close(self):
        super().close()
        self._flush()


def extract_blocks(html: str) -> tuple[list[dict], str]:
    """Parse ``html`` into ``(blocks, title)``.

    Each block is ``{text, n_words, n_chars, link_chars}`` in document
    order; ``title`` is the whitespace-collapsed ``<title>`` content
    (empty string when absent).
    """
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    title = " ".join("".join(parser.title_parts).split())
    return parser.blocks, title


def html_text(html: str) -> str:
    """All visible text, one line per block (no boilerplate removal)."""
    blocks, _ = extract_blocks(html)
    return "\n".join(b["text"] for b in blocks)


def extract_links(html: str, base_url: str | None = None) -> list[str]:
    """Outgoing ``<a href>`` targets, document order, first-seen deduped.

    Relative hrefs resolve against ``base_url`` when given (stdlib
    ``urljoin``); only ``http(s)`` results are kept — mailto/javascript/
    fragment-only links are navigation chrome, not crawl edges. Links
    inside skipped elements (``<script>``, ``<svg>``, …) never count.
    """
    from urllib.parse import urljoin

    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    seen: set[str] = set()
    out: list[str] = []
    for href in parser.hrefs:
        href = href.strip()
        if base_url is not None:
            try:
                href = urljoin(base_url, href)
            except ValueError:
                continue
        if not href.lower().startswith(("http://", "https://")):
            continue
        if href not in seen:
            seen.add(href)
            out.append(href)
    return out


def html_links(
    df: DataFrame,
    html_col: str = "payload",
    url_col: str | None = None,
    out: str = "links",
    charset_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Outgoing-link column from an HTML column (``binary`` or ``string``).

    ``url_col`` names the page URL used to resolve relative hrefs (a raw
    crawl's links are mostly relative, and a host graph without them is
    missing its intra-site edges). Output appends ``out`` as
    ``array<string>``; undecodable rows yield NULL (``strict=True``
    raises). Map-only Arrow-batched stage, no shuffle — compose with
    ``urls.host_link_edges`` + ``graph.pagerank`` for crawl authority.
    """
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    is_binary = dict(df.dtypes)[html_col] == "binary"
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out, ArrayType(StringType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = pdf[url_col] if url_col is not None else [None] * len(pdf)
            charsets = (
                pdf[charset_col] if charset_col is not None else [None] * len(pdf)
            )
            links: list = []
            for raw, base, declared in zip(pdf[html_col], urls, charsets):
                try:
                    if raw is None:
                        raise ValueError("null payload")
                    if declared is not None and not isinstance(declared, str):
                        declared = None
                    html = (
                        decode_html_bytes(bytes(raw), declared=declared)
                        if is_binary
                        else str(raw)
                    )
                    base = base if isinstance(base, str) else None
                    links.append(extract_links(html, base_url=base))
                except Exception:
                    if strict:
                        raise
                    links.append(None)
            res = pdf.copy()
            res[out] = links
            yield res

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # single-file inputs otherwise decode serially in one Python worker;
    # no-op when the source is already split (see ensure_parallelism)
    return ensure_parallelism(df).mapInPandas(run, schema=out_schema)


def main_text(
    html: str,
    min_words: int = 5,
    max_link_density: float = 0.4,
) -> str:
    """Content text only: drop short or link-dense blocks.

    A block survives iff it has at least ``min_words`` words AND its
    link density (characters inside ``<a>`` / total characters) is at
    most ``max_link_density`` — the two-signal reduction of the
    jusText/boilerpipe classifiers.  Navigation bars, button rows, and
    footers are short and link-dense; paragraphs are neither.
    """
    blocks, _ = extract_blocks(html)
    kept = [
        b["text"]
        for b in blocks
        if b["n_words"] >= min_words
        and b["link_chars"] <= max_link_density * max(b["n_chars"], 1)
    ]
    return "\n".join(kept)


_CHARSET_RE = re.compile(
    # the HTML5 prescan looks only at <meta> declarations (plain or
    # http-equiv Content-Type); a bare charset= in body text must not
    # hijack the decode now that the sniff outranks UTF-8
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)",
    re.I,
)

# WHATWG encoding-label mapping (the subset that matters for crawls): pages
# declaring latin-1/ascii are decoded as windows-1252 — its strict superset
# that real browsers use, and what the authors of such pages actually emit
# (0x93/0x94 curly quotes etc. are cp1252, undefined in iso-8859-1 proper).
_CHARSET_ALIASES = {
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "l1": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "windows-1252": "cp1252",
    "x-cp1252": "cp1252",
    "unicode": "utf-16",  # legacy IE label
}


def _try_decode(payload: bytes, label: str) -> str | None:
    codec = _CHARSET_ALIASES.get(label.strip().lower(), label.strip())
    try:
        return payload.decode(codec, errors="replace")
    except (LookupError, ValueError):
        # LookupError: unknown label. ValueError: labels the codec
        # machinery rejects outright (an embedded NUL, e.g. from a
        # mangled header) — same contract, fall through to the next rule
        return None


def decode_html_bytes(payload: bytes, declared: str | None = None) -> str:
    """Decode an HTML payload: BOM, declared charset, ``<meta charset>``,
    UTF-8, windows-1252 — in that order, per the HTML5 precedence rules.

    ``declared`` is the transport-level charset (the HTTP Content-Type
    header a WARC record carries); it outranks the in-document ``<meta>``
    declaration, and both outrank sniffing — a windows-1252 page whose
    byte sequence happens to be valid UTF-8 (``0xC3 0xA9`` is cp1252
    ``Ã©``) would otherwise silently mis-decode and degrade every
    downstream text signal. A BOM outranks everything (it IS the
    encoding). Labeled decodes use ``errors='replace'``; the final
    windows-1252 fallback never fails, so every payload decodes to
    SOMETHING and malformed pages degrade instead of killing a task.
    Unknown/bogus labels fall through to the next rule.
    """
    if payload[:3] == b"\xef\xbb\xbf":
        return payload[3:].decode("utf-8", errors="replace")
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return payload.decode("utf-16", errors="replace")
    if declared:
        out = _try_decode(payload, declared)
        if out is not None:
            return out
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        out = _try_decode(payload, m.group(1).decode("ascii", errors="replace"))
        if out is not None:
            return out
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("cp1252", errors="replace")


def html_to_text(
    df: DataFrame,
    html_col: str = "payload",
    out: str = "text",
    mode: str = "main",
    min_words: int = 5,
    max_link_density: float = 0.4,
    meta: bool = True,
    strict: bool = False,
    charset_col: str | None = None,
    links_col: str | None = None,
    links_base_col: str | None = None,
) -> DataFrame:
    """Extract text from an HTML column (``binary`` or ``string``).

    ``charset_col`` names an optional string column carrying the
    transport-declared charset (e.g. parsed from a WARC record's HTTP
    ``Content-Type``); it feeds :func:`decode_html_bytes`'s precedence
    chain ahead of the in-document ``<meta>`` declaration. NULL entries
    mean "no declaration" for that row.

    ``links_col`` additionally emits the page's outgoing links
    (``array<string>``, :func:`extract_links`, relative hrefs resolved
    against ``links_base_col``) from the SAME decode — a crawl pipeline
    that wants both text and the link graph must not pay a second
    payload decode pass (that is :func:`html_links`'s standalone cost).

    ``mode='main'`` applies the boilerplate heuristic (:func:`main_text`);
    ``mode='all'`` keeps every block (:func:`html_text`).  With
    ``meta=True`` the output also carries ``title``, ``n_blocks`` (all
    non-empty blocks), ``n_kept`` (blocks surviving the heuristic), and
    ``link_density`` (document-level link chars / total chars) — the
    inputs a downstream quality gate wants.  Undecodable rows yield NULL
    text (``strict=True`` raises instead).

    Map-only: one Arrow-batched ``mapInPandas`` stage, no shuffle.
    """
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    if mode not in ("main", "all"):
        raise ValueError(f"mode must be 'main' or 'all', got {mode!r}")
    is_binary = dict(df.dtypes)[html_col] == "binary"

    fields = list(df.schema.fields) + [StructField(out, StringType())]
    if meta:
        fields += [
            StructField("title", StringType()),
            StructField("n_blocks", IntegerType()),
            StructField("n_kept", IntegerType()),
            StructField("link_density", DoubleType()),
        ]
    if links_col is not None:
        from pyspark.sql.types import ArrayType

        fields += [StructField(links_col, ArrayType(StringType()))]
    out_schema = StructType(fields)
    keep_all = mode == "all"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, titles, n_blocks, n_kept, densities = [], [], [], [], []
            out_links: list = []
            charsets = (
                pdf[charset_col] if charset_col is not None else [None] * len(pdf)
            )
            bases = (
                pdf[links_base_col]
                if links_base_col is not None
                else [None] * len(pdf)
            )
            for raw, declared, base in zip(pdf[html_col], charsets, bases):
                try:
                    if raw is None:
                        raise ValueError("null payload")
                    if declared is not None and not isinstance(declared, str):
                        declared = None  # NaN from a null charset cell
                    html = (
                        decode_html_bytes(bytes(raw), declared=declared)
                        if is_binary
                        else str(raw)
                    )
                    row_links = (
                        extract_links(
                            html, base_url=base if isinstance(base, str) else None
                        )
                        if links_col is not None
                        else None
                    )
                    blocks, title = extract_blocks(html)
                    kept = [
                        b
                        for b in blocks
                        if keep_all
                        or (
                            b["n_words"] >= min_words
                            and b["link_chars"]
                            <= max_link_density * max(b["n_chars"], 1)
                        )
                    ]
                    chars = sum(b["n_chars"] for b in blocks)
                    links = sum(b["link_chars"] for b in blocks)
                    texts.append("\n".join(b["text"] for b in kept))
                    titles.append(title)
                    n_blocks.append(len(blocks))
                    n_kept.append(len(kept))
                    densities.append(links / chars if chars else 0.0)
                    out_links.append(row_links)
                except Exception:
                    if strict:
                        raise
                    texts.append(None)
                    titles.append(None)
                    n_blocks.append(None)
                    n_kept.append(None)
                    densities.append(None)
                    out_links.append(None)
            res = pdf.copy()
            res[out] = texts
            if meta:
                res["title"] = titles
                res["n_blocks"] = pd.array(n_blocks, dtype="Int32")
                res["n_kept"] = pd.array(n_kept, dtype="Int32")
                res["link_density"] = pd.array(densities, dtype="float64")
            if links_col is not None:
                res[links_col] = out_links
            yield res

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # single-file inputs otherwise decode serially in one Python worker;
    # no-op when the source is already split (see ensure_parallelism)
    return ensure_parallelism(df).mapInPandas(run, schema=out_schema)
