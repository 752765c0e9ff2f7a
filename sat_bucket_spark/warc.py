"""WARC / WET web-archive ingestion (Common Crawl-style corpora).

WARC (ISO 28500 — public spec) is the container format web crawls ship in:
a file is a sequence of records, each a ``WARC/1.x`` version line, CRLF
header lines, a blank line, ``Content-Length`` bytes of block, and a
trailing ``CRLF CRLF``. Crawl providers gzip each record as its own gzip
member and concatenate the members, so a ``.warc.gz`` is a multi-member
gzip stream; WET files are WARC files whose ``conversion`` records carry
extracted plain text.

Spark mapping: ``spark.read.format("binaryFile")`` distributes one row per
archive file, but only its ``path`` column is consumed — each
``mapInPandas`` task OPENS the file itself (local / ``pyarrow.fs`` for
object stores) and walks the records with a streaming parser, yielding
bounded-size record batches. Shipping the ``content`` column instead would
materialize every ~1 GB segment as a JVM row, an Arrow cell AND a Python
``bytes`` (~3x the compressed size per task) and hit ``binaryFile``'s
2 GiB content cap; the path-only read has neither cost (binaryFile's cap
check lives in its content materialization, which column pruning
eliminates). WARC is not block-splittable (records are variable-length and
the gzip members aren't indexed), so the parallel grain is the FILE —
exactly how crawl archives are shipped (~1 GB segments; a 100 TB crawl is
~10^5 files, far more than any cluster's task slots). Both compressed and
decompressed bytes are consumed incrementally: peak memory per task is one
read chunk (256 KiB) plus one in-flight record, independent of archive
size — oversized archives (>2 GiB) are fine.

Reference scope: beyond sat-bucket (no web-archive source there); the
format knowledge is the public ISO 28500 spec / Common Crawl docs.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sat_bucket_spark.operators.hashing import h64_expr

__all__ = [
    "iter_warc_records",
    "read_warc",
    "read_warc_html",
    "read_wet",
    "build_warc_bytes",
]

_GZIP_MAGIC = b"\x1f\x8b"


class _RecordStream:
    """Incremental line/byte reader over raw or multi-member-gzip input.

    Accepts bytes OR any binary file-like object with ``.read(n)`` (a local
    file, a ``pyarrow.fs`` input stream) — the archive is never required to
    be in memory. Keeps only one raw read chunk and a bounded decompressed
    buffer alive — a record is parsed and handed out before the next one
    is inflated.
    """

    _CHUNK = 1 << 18

    def __init__(self, source):
        if isinstance(source, (bytes, bytearray, memoryview)):
            import io as _io

            source = _io.BytesIO(bytes(source))
        self._src = source
        # sniff the gzip magic; whatever was read stays pending. read(n)
        # may SHORT-READ on stream-like sources (network, pyarrow input
        # streams return "at most n") — loop until 2 bytes or true EOF,
        # else a 1-byte first read misclassifies a gzip stream as plain.
        pending = source.read(2) or b""
        while len(pending) < 2:
            more = source.read(2 - len(pending))
            if not more:
                break
            pending += more
        self._pending = pending
        self._gz = self._pending == _GZIP_MAGIC
        self._buf = bytearray()
        self._dec = zlib.decompressobj(16 + zlib.MAX_WBITS) if self._gz else None

    def _read_raw(self) -> bytes:
        if self._pending:
            out, self._pending = self._pending, b""
            return out
        return self._src.read(self._CHUNK) or b""

    def _fill(self) -> bool:
        """Pull one more chunk into the buffer; False at true end of input."""
        if not self._gz:
            chunk = self._read_raw()
            if not chunk:
                return False
            self._buf += chunk
            return True
        while True:
            if self._dec.eof:
                # member finished — chain to the next gzip member
                # (crawl archives gzip each record as its own member)
                pending = self._dec.unused_data
                if not pending:
                    pending = self._read_raw()
                    if not pending:
                        return False
                self._dec = zlib.decompressobj(16 + zlib.MAX_WBITS)
                out = self._dec.decompress(pending, self._CHUNK)
            else:
                feed = self._dec.unconsumed_tail
                if not feed:
                    feed = self._read_raw()
                    if not feed:
                        return False  # truncated mid-member
                out = self._dec.decompress(feed, self._CHUNK)
            if out:
                self._buf += out
                return True

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line = bytes(self._buf[: i + 1])
                del self._buf[: i + 1]
                return line
            if not self._fill():
                line = bytes(self._buf)
                self._buf.clear()
                return line

    def read(self, n: int) -> bytes:
        while len(self._buf) < n:
            if not self._fill():
                break
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def iter_warc_records(data, strict: bool = True) -> Iterator[dict]:
    """Walk the WARC records of one archive file.

    ``data`` is raw or ``.warc.gz`` bytes, or a binary FILE-LIKE object
    (``.read(n)``) that is consumed incrementally — the streaming form the
    distributed readers use so an archive never has to fit in memory.
    Yields ``{"headers": {name_lower: value}, "payload": bytes}`` per
    record. ``strict=True`` raises ``ValueError`` on a malformed record OR
    a corrupt gzip stream (``zlib.error`` is converted so callers have one
    exception contract); ``strict=False`` stops at the first corruption and
    returns what parsed (the crawl-pipeline posture: salvage the shard,
    count the loss).
    """
    stream = _RecordStream(data)
    try:
        yield from _next_record(stream, strict)
    except zlib.error as e:
        if strict:
            raise ValueError(f"corrupt gzip stream in WARC: {e}") from e


def _next_record(stream: "_RecordStream", strict: bool) -> Iterator[dict]:
    """Yield records until end-of-stream; raises inside stream reads may be
    ``zlib.error`` (corrupt member) which the caller converts per `strict`."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            if strict:
                raise ValueError(
                    f"malformed WARC: expected version line, got {line[:40]!r}"
                )
            return
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if hline in (b"\r\n", b"\n", b""):
                break
            if b":" not in hline:
                if strict:
                    raise ValueError(f"malformed WARC header line {hline[:40]!r}")
                return
            name, _, value = hline.partition(b":")
            headers[name.strip().lower().decode("ascii", "replace")] = (
                value.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(
                    f"WARC record without valid Content-Length: {headers}"
                )
            return
        payload = stream.read(length)
        if len(payload) != length:
            if strict:
                raise ValueError(
                    f"truncated WARC record: wanted {length} bytes, got {len(payload)}"
                )
            return
        yield {"headers": headers, "payload": payload}


def _split_http(payload: bytes) -> "tuple[str | None, bytes]":
    """(HTTP Content-Type header value, body bytes) of a ``response``
    record's block; ``(None, payload)`` when there is no HTTP head."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            ctype = None
            for line in payload[:sep].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-type":
                    ctype = v.strip().decode("latin-1") or None
                    break
            return ctype, payload[sep + 4 :]
    return None, payload


def _strip_http(payload: bytes) -> bytes:
    """Drop the HTTP response head from a ``response`` record's block."""
    return _split_http(payload)[1]


def _open_input(path: str):
    """Open an archive path for streaming reads inside an executor task.

    Spark's ``binaryFile``/file sources hand back URIs (``file:/tmp/x``,
    ``s3a://...``, possibly percent-encoded). Local paths open directly;
    anything else goes through ``pyarrow.fs.FileSystem.from_uri`` (ships
    with pyarrow; covers s3/gcs/hdfs), so the task streams straight from
    the store instead of the driver shipping bytes.
    """
    from urllib.parse import unquote, urlparse

    u = urlparse(path)
    if u.scheme in ("", "file"):
        local = unquote(u.path) if u.scheme == "file" else path
        return open(local, "rb")
    # Spark's file listings emit Hadoop scheme aliases (s3a://, s3n://,
    # abfss://) that pyarrow's from_uri does not recognize — translate to
    # the pyarrow spelling so the common object-store configs keep working
    aliases = {"s3a": "s3", "s3n": "s3", "abfss": "abfs", "wasb": "abfs", "wasbs": "abfs"}
    uri = path
    if u.scheme in aliases:
        uri = aliases[u.scheme] + path[len(u.scheme):]
    try:
        filesystem, p = _filesystem_from_uri(uri)
    except Exception as exc:
        raise ValueError(
            f"cannot open {path!r}: pyarrow FileSystem.from_uri rejected "
            f"{uri!r} ({exc}); supported schemes are file/s3/s3a/s3n/gs/"
            "hdfs and (when pyarrow ships Azure support) abfs/abfss"
        ) from exc
    return filesystem.open_input_stream(p)


def _filesystem_from_uri(uri: str):
    """pyarrow ``FileSystem.from_uri`` behind a patchable seam (the
    pyarrow class is a C extension and cannot be monkeypatched)."""
    from pyarrow import fs as _pafs

    return _pafs.FileSystem.from_uri(uri)


_WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, warc_date string, "
    "content_type string, content_length long, payload binary, source_file string"
)


# binaryFile's fixed schema, spelled out because a STREAMING file source
# cannot infer it (Spark requires an explicit schema on readStream).
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = None,
    strip_http_headers: bool = False,
    strict: bool = True,
    batch_records: int = 1024,
    streaming: bool = False,
    parse_http: bool = False,
) -> DataFrame:
    """Distributed WARC record table over a directory of (.warc|.warc.gz).

    One output row per record: ``(record_id, warc_type, target_uri,
    warc_date, content_type, content_length, payload, source_file)``.
    ``record_types`` filters during the parse (before any batch
    materializes); ``strip_http_headers`` removes the HTTP head from
    ``response`` blocks so ``payload`` is the body bytes.

    ``parse_http=True`` additionally strips the head AND appends an
    ``http_content_type`` string column — the HTTP-level ``Content-Type``
    header of ``response`` records (NULL elsewhere), which carries the
    transport-declared charset that HTML decoding must honor ahead of any
    in-document declaration (:func:`read_warc_html`).

    ``streaming=True`` returns a STREAMING DataFrame over the same
    directory (Structured Streaming file source: each newly-arriving
    archive is parsed exactly once per checkpoint) — continuous crawl
    ingestion composes with ``streaming.ingest.stream_write_bucket`` or a
    ``foreachBatch`` curation pipeline with no parser changes, because
    ``mapInPandas`` is the same operator in both modes.

    Scale shape: file-grain parallelism (see module docstring); only the
    ``path`` column crosses the JVM/Arrow boundary — each task opens and
    streams its archive itself (``_open_input``), so archive bytes are
    never shipped as a row, the ``binaryFile`` 2 GiB content cap does not
    apply, and peak task memory is one 256 KiB chunk + one record.
    Bounded ``batch_records``-row Arrow batches; no shuffle at all;
    downstream filters/projections run on a normal DataFrame.
    """
    if streaming:
        bf = (
            spark.readStream.format("binaryFile")
            .schema(_BINARY_FILE_SCHEMA)
            .load(path)
        )
    else:
        bf = spark.read.format("binaryFile").load(path)
    wanted = tuple(t.lower() for t in record_types) if record_types else None
    out_schema = _WARC_SCHEMA + (", http_content_type string" if parse_http else "")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "record_id", "warc_type", "target_uri", "warc_date",
            "content_type", "content_length", "payload", "source_file",
        ] + (["http_content_type"] if parse_http else [])
        rows: list[tuple] = []
        for pdf in batches:
            for fpath in pdf["path"]:
                fname = str(fpath).rsplit("/", 1)[-1]
                src = _open_input(str(fpath))
                try:
                    for rec in iter_warc_records(src, strict=strict):
                        h = rec["headers"]
                        wtype = h.get("warc-type", "")
                        if wanted is not None and wtype.lower() not in wanted:
                            continue
                        payload = rec["payload"]
                        http_ctype = None
                        if wtype.lower() == "response":
                            if parse_http:
                                http_ctype, payload = _split_http(payload)
                            elif strip_http_headers:
                                payload = _strip_http(payload)
                        row = (
                            h.get("warc-record-id", ""),
                            wtype,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            h.get("content-type"),
                            len(payload),
                            payload,
                            fname,
                        )
                        rows.append(row + ((http_ctype,) if parse_http else ()))
                        if len(rows) >= batch_records:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
                finally:
                    src.close()
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return bf.select("path").mapInPandas(parse, out_schema)


def read_wet(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    streaming: bool = False,
) -> DataFrame:
    """WET extracted-text corpus as the canonical documents frame.

    Keeps the ``conversion`` records (the per-page extracted text), decodes
    UTF-8 (lossy replace — crawl text is never uniformly clean), and derives
    the deterministic content id used across the curation operators:
    ``(doc_id, url, fetch_date, text, source_file)``. ``streaming=True``
    makes it a streaming frame (see :func:`read_warc`).
    """
    recs = read_warc(
        spark,
        path,
        record_types=("conversion",),
        strict=strict,
        streaming=streaming,
    )
    return recs.select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetch_date"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        "source_file",
    ).withColumn("doc_id", h64_expr(F.col("text")))


def read_warc_html(
    spark: SparkSession,
    path: str,
    mode: str = "main",
    min_words: int = 5,
    max_link_density: float = 0.4,
    strict: bool = False,
    streaming: bool = False,
    links: bool = False,
) -> DataFrame:
    """Raw-WARC HTML route to the canonical documents frame.

    The counterpart of :func:`read_wet` for crawls that ship only raw
    archives (no WET sidecar): ``response`` records -> HTTP head split
    (the header-declared charset outranks any in-document ``<meta>``,
    operators/htmltext.decode_html_bytes) -> html_to_text boilerplate
    removal -> ``(doc_id, url, fetch_date, text, title, n_blocks, n_kept,
    link_density, source_file)``. Non-HTML responses (images, PDFs — by
    either the WARC or the HTTP content type) are dropped during the
    parse; undecodable/malformed pages yield NULL text rather than
    failing the task (``strict=True`` raises). ``links=True`` adds the
    page's outgoing links (``array<string>``, relative hrefs resolved
    against the record URI) extracted in the SAME decode pass — feed
    them to ``urls.host_link_edges`` + ``graph.pagerank`` for crawl
    authority without a second payload scan.

    Scale shape: both stages are Arrow-batched ``mapInPandas`` with
    file-grain parallelism and no shuffle; the HTTP content-type filter
    runs before the HTML parse so non-HTML payload bytes are dropped as
    early as possible.
    """
    from sat_bucket_spark.operators.htmltext import html_to_text

    recs = read_warc(
        spark,
        path,
        record_types=("response",),
        strict=True,  # container truncation is always a real error
        streaming=streaming,
        parse_http=True,
    )
    # HTML iff either layer says so; records with neither type header are
    # kept only when the body looks like markup (crawls do omit headers)
    ctype = F.coalesce(F.col("http_content_type"), F.col("content_type"))
    # markup sniff decodes only a 64-byte prefix, not the whole payload;
    # ISO-8859-1 maps every byte, so a headerless binary record (e.g. an
    # image served with no Content-Type) can never abort the job
    head = F.decode(F.expr("substring(payload, 1, 64)"), "ISO-8859-1")
    is_html = F.when(
        ctype.isNotNull(), F.lower(ctype).contains("html")
    ).otherwise(F.startswith(F.ltrim(head), F.lit("<")))
    pages = recs.where(is_html).withColumn(
        "charset",
        F.nullif(
            F.lower(
                F.regexp_extract(
                    F.col("http_content_type"), r"(?i)charset\s*=\s*\"?([A-Za-z0-9_.:-]+)", 1
                )
            ),
            F.lit(""),
        ),
    )
    out = html_to_text(
        pages,
        html_col="payload",
        out="text",
        mode=mode,
        min_words=min_words,
        max_link_density=max_link_density,
        meta=True,
        strict=strict,
        charset_col="charset",
        links_col="links" if links else None,
        links_base_col="target_uri" if links else None,
    )
    cols = [
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetch_date"),
        "text",
        "title",
        "n_blocks",
        "n_kept",
        "link_density",
        "source_file",
    ]
    if links:
        cols.append("links")
    return out.select(*cols).withColumn("doc_id", h64_expr(F.col("text")))


def build_warc_bytes(
    records: list[dict],
    gzip_members: bool = False,
) -> bytes:
    """Serialize records to WARC bytes (test fixtures, round-trip checks).

    Each record dict: ``{"type": str, "payload": bytes, **extra_headers}``
    (extra headers as ``header-name: value``). ``gzip_members=True`` gzips
    each record as its own member (the Common Crawl layout).
    """
    import gzip as _gzip

    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        headers = {
            "WARC-Type": rec["type"],
            "WARC-Record-ID": rec.get(
                "WARC-Record-ID", f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>"
            ),
            "Content-Length": str(len(payload)),
        }
        for k, v in rec.items():
            if k not in ("type", "payload"):
                headers[k] = str(v)
        block = bytearray(b"WARC/1.0\r\n")
        for k, v in headers.items():
            block += f"{k}: {v}\r\n".encode()
        block += b"\r\n"
        block += payload
        block += b"\r\n\r\n"
        out += _gzip.compress(bytes(block)) if gzip_members else block
    return bytes(out)
