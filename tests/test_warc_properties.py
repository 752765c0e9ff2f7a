"""Property tests for the WARC multi-member gzip container layer.

``iter_warc_records`` / ``_RecordStream`` (warc.py) are load-bearing for
every crawl byte the WARC/WET routes ingest. The charset chain got this
treatment in r9; this closes the container layer (VERDICT r9 task #8):
synthetic multi-member gzip streams with members cut at ARBITRARY byte
boundaries of the plain record stream (mid-header, mid-payload, across
record boundaries), zero-length members interleaved, short-reading
sources (read(n) returning fewer than n bytes, so members span
read-buffer boundaries), and truncation at every kind of offset. The
contract under fuzz:

- round trip: records recovered EXACTLY (headers + payload bytes),
  however the plain stream was cut into members and however small the
  source's reads are;
- empty gzip members are transparent;
- truncated input either raises ``ValueError`` (strict) or yields an
  exact PREFIX of the original records (non-strict: salvage, never
  garbage, never an exception).

Reference semantics: WARC 1.0 record grammar + the Common Crawl
member-per-record layout (reference reads single-format granules only;
this container layer is part of the crawl-ingest extension suite).
"""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from sat_bucket_spark.warc import build_warc_bytes, iter_warc_records


class ShortReader:
    """File-like that returns AT MOST ``k`` bytes per read(n) — models
    network/pyarrow streams and forces members and records to span
    read-buffer boundaries (including the 2-byte magic sniff)."""

    def __init__(self, data: bytes, k: int):
        self._b = data
        self._i = 0
        self._k = k

    def read(self, n: int) -> bytes:
        j = min(self._i + min(n, self._k), len(self._b))
        out = self._b[self._i : j]
        self._i = j
        return out


# payloads embed the container's own sentinels: version lines, record
# separators, gzip magic, header-shaped text — none may confuse the
# parser because Content-Length, not delimiters, frames the payload
_adversarial = st.sampled_from(
    [
        b"",
        b"WARC/1.0\r\n",
        b"\r\n\r\n",
        b"\r\n",
        b"\x1f\x8b",
        b"Content-Length: 999\r\n",
        b"\x00" * 8,
    ]
)
_payloads = st.lists(
    st.one_of(st.binary(max_size=40), _adversarial), max_size=6
).map(b"".join)

_records = st.lists(
    st.builds(
        lambda typ, payload, uri: {
            "type": typ,
            "payload": payload,
            **({"WARC-Target-URI": uri} if uri else {}),
        },
        st.sampled_from(["response", "conversion", "metadata"]),
        _payloads,
        st.one_of(st.none(), st.just("http://example.com/p?q=1")),
    ),
    max_size=6,
)


def _member_split(plain: bytes, cuts: list[int], empty_at: list[int]) -> bytes:
    """Gzip ``plain`` as consecutive members cut at ``cuts`` (arbitrary
    byte offsets — zero-length segments become EMPTY members), with extra
    empty members injected at member indices ``empty_at``."""
    bounds = sorted({0, len(plain), *[min(c, len(plain)) for c in cuts]})
    segments = [plain[a:b] for a, b in zip(bounds, bounds[1:])] or [b""]
    out = bytearray()
    for i, seg in enumerate(segments):
        if i in empty_at:
            out += gzip.compress(b"")
        out += gzip.compress(seg)
    if len(segments) in empty_at:
        out += gzip.compress(b"")
    return bytes(out)


def _check_round_trip(recs: list[dict], data, n_expected: int) -> None:
    got = list(iter_warc_records(data, strict=True))
    assert len(got) == n_expected
    for orig, rec in zip(recs, got):
        assert rec["payload"] == orig["payload"]
        assert rec["headers"]["warc-type"] == orig["type"]
        assert int(rec["headers"]["content-length"]) == len(orig["payload"])
        if "WARC-Target-URI" in orig:
            assert rec["headers"]["warc-target-uri"] == orig["WARC-Target-URI"]


@given(
    recs=_records,
    cuts=st.lists(st.integers(min_value=0, max_value=4000), max_size=8),
    empty_at=st.lists(st.integers(min_value=0, max_value=9), max_size=3),
    read_k=st.sampled_from([1, 2, 3, 7, 64, 1 << 20]),
)
@settings(max_examples=120, deadline=None)
def test_arbitrary_member_splits_round_trip(recs, cuts, empty_at, read_k):
    """Members cut at any byte offset of the plain stream (mid-header,
    mid-payload, across records), empty members interleaved, source
    short-reading down to 1 byte per call: record-exact recovery."""
    plain = build_warc_bytes(recs)
    gz = _member_split(plain, cuts, empty_at)
    _check_round_trip(recs, ShortReader(gz, read_k), len(recs))


@given(recs=_records, read_k=st.sampled_from([1, 5, 1 << 20]))
@settings(max_examples=40, deadline=None)
def test_member_per_record_and_plain_round_trip(recs, read_k):
    """The two production layouts as controls: Common Crawl's
    member-per-record gzip, and the uncompressed stream."""
    _check_round_trip(
        recs, ShortReader(build_warc_bytes(recs, gzip_members=True), read_k), len(recs)
    )
    _check_round_trip(recs, ShortReader(build_warc_bytes(recs), read_k), len(recs))


@given(
    recs=_records.filter(lambda r: len(r) > 0),
    cuts=st.lists(st.integers(min_value=0, max_value=4000), max_size=5),
    cut_frac=st.floats(min_value=0.0, max_value=1.0, exclude_max=True),
    read_k=st.sampled_from([1, 7, 1 << 20]),
)
@settings(max_examples=120, deadline=None)
def test_truncation_prefix_or_clean_error(recs, cuts, cut_frac, read_k):
    """Truncating the gzip stream at ANY byte: strict mode yields an exact
    prefix of the records then (possibly) ValueError — never garbage,
    never an unconverted zlib.error; non-strict NEVER raises and yields an
    exact prefix (the salvage posture: count the loss, keep the shard)."""
    plain = build_warc_bytes(recs)
    gz = _member_split(plain, cuts, [])
    truncated = gz[: int(len(gz) * cut_frac)]

    def _prefix_exact(got):
        assert len(got) <= len(recs)
        for orig, rec in zip(recs, got):
            assert rec["payload"] == orig["payload"]
            assert rec["headers"]["warc-type"] == orig["type"]

    salvaged = list(iter_warc_records(ShortReader(truncated, read_k), strict=False))
    _prefix_exact(salvaged)

    got: list = []
    try:
        for rec in iter_warc_records(ShortReader(truncated, read_k), strict=True):
            got.append(rec)
    except ValueError:
        pass
    _prefix_exact(got)
    # strict can only yield MORE than salvage if salvage stopped early —
    # it must never yield fewer complete records than the salvage path
    assert len(got) >= len(salvaged)


def test_short_read_magic_sniff():
    """A source whose first read(2) returns ONE byte (legal for streams)
    must still be recognized as gzip — regression pin for the sniff loop."""
    recs = [{"type": "conversion", "payload": b"hello"}]
    gz = build_warc_bytes(recs, gzip_members=True)
    got = list(iter_warc_records(ShortReader(gz, 1), strict=True))
    assert len(got) == 1 and got[0]["payload"] == b"hello"


def test_empty_input_and_empty_member_only():
    assert list(iter_warc_records(b"", strict=True)) == []
    assert list(iter_warc_records(gzip.compress(b""), strict=True)) == []
    assert (
        list(iter_warc_records(gzip.compress(b"") * 3, strict=True)) == []
    )
