"""Property tests for the charset-decode precedence chain.

``decode_html_bytes`` (operators/htmltext.py) is load-bearing for every
crawl byte the WARC/WET routes ingest: its contract is (a) TOTAL — any
byte payload with any declared label decodes to a string, never raises —
and (b) a fixed precedence order: BOM > transport-declared charset >
in-document ``<meta>`` prescan > UTF-8 > windows-1252 fallback. The
fuzz here throws adversarial payloads at both halves of that contract:
charset tokens split across the 2048-byte prescan window, conflicting
header/meta/BOM declarations, bogus labels, and raw binary.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sat_bucket_spark.operators.htmltext import _CHARSET_ALIASES, decode_html_bytes

PRESCAN = 2048

labels = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "utf-8",
            "UTF-8",
            "windows-1252",
            "iso-8859-1",
            "us-ascii",
            "utf-16",
            "shift_jis",
            "euc-kr",
            "koi8-r",
            "",  # empty declaration
            "bogus-charset-label",
            "utf-99",
            "☃",  # non-ascii label
            "a" * 300,  # oversized label
        ]
    ),
    st.text(max_size=20),
)


class TestTotality:
    @settings(max_examples=300, deadline=None)
    @given(payload=st.binary(max_size=4096), declared=labels)
    def test_never_raises_always_str(self, payload, declared):
        out = decode_html_bytes(payload, declared=declared)
        assert isinstance(out, str)

    @settings(max_examples=100, deadline=None)
    @given(payload=st.binary(max_size=512), declared=labels)
    def test_bom_payloads_total(self, payload, declared):
        for bom in (b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff"):
            assert isinstance(decode_html_bytes(bom + payload, declared=declared), str)

    @settings(max_examples=100, deadline=None)
    @given(junk=st.binary(max_size=256))
    def test_malformed_meta_total(self, junk):
        # a meta tag whose charset value is arbitrary junk must fall
        # through (unknown label) or decode-with-replace, never raise
        payload = b'<meta charset="' + junk.replace(b'"', b"") + b'">body'
        assert isinstance(decode_html_bytes(payload), str)


class TestPrecedence:
    """Pinned precedence: BOM > declared > meta > UTF-8 > cp1252."""

    # "café" in cp1252 is invalid UTF-8; "caf\xc3\xa9" (utf-8) reads as
    # cp1252 mojibake — the two encodings are mutually distinguishable
    CP1252 = "caf\xe9 “q”"  # café “q”

    def _meta(self, charset: str) -> bytes:
        return f'<meta charset="{charset}">'.encode("ascii")

    def test_bom_beats_declared_and_meta(self):
        body = self._meta("windows-1252") + "café".encode("utf-8")
        out = decode_html_bytes(b"\xef\xbb\xbf" + body, declared="windows-1252")
        # decoded as utf-8 (BOM), not as cp1252 (either declaration)
        assert "café" in out and "cafÃ©" not in out

    def test_declared_beats_meta(self):
        body = self._meta("utf-8") + self.CP1252.encode("cp1252")
        out = decode_html_bytes(body, declared="windows-1252")
        assert "café" in out and "“q”" in out

    def test_meta_beats_utf8_validity(self):
        # bytes are VALID utf-8, but the meta declaration must win
        body = self._meta("windows-1252") + "café".encode("utf-8")
        assert "cafÃ©" in decode_html_bytes(body)

    def test_unknown_declared_falls_to_meta(self):
        body = self._meta("windows-1252") + self.CP1252.encode("cp1252")
        out = decode_html_bytes(body, declared="utterly-bogus")
        assert "café" in out

    def test_unknown_declared_and_meta_fall_to_utf8(self):
        body = self._meta("no-such-charset") + "café".encode("utf-8")
        out = decode_html_bytes(body, declared="also-bogus")
        assert "café" in out

    def test_invalid_utf8_falls_to_cp1252(self):
        out = decode_html_bytes(self.CP1252.encode("cp1252"))
        assert "café" in out and "“q”" in out

    @pytest.mark.parametrize(
        "label,codec",
        sorted((k, v) for k, v in _CHARSET_ALIASES.items() if v == "cp1252"),
    )
    def test_whatwg_latin1_family_decodes_as_cp1252(self, label, codec):
        raw = self.CP1252.encode("cp1252")
        assert "“q”" in decode_html_bytes(raw, declared=label)


class TestPrescanWindow:
    def _cp1252_body(self) -> bytes:
        return TestPrecedence.CP1252.encode("cp1252")

    def test_meta_inside_window_honored(self):
        pad = b"<!--" + b"x" * (PRESCAN - 200) + b"-->"
        payload = pad + b'<meta charset="windows-1252">' + self._cp1252_body()
        assert "café" in decode_html_bytes(payload)

    def test_meta_beyond_window_ignored(self):
        # declaration entirely past the prescan window: falls to UTF-8
        # trial, then cp1252 — must not raise and must still decode
        pad = b"<!--" + b"x" * (PRESCAN + 10) + b"-->"
        payload = pad + b'<meta charset="utf-16">' + self._cp1252_body()
        out = decode_html_bytes(payload)
        assert isinstance(out, str) and "café" in out

    @settings(max_examples=60, deadline=None)
    @given(split=st.integers(min_value=0, max_value=40))
    def test_token_split_across_window_boundary_total(self, split):
        # the meta tag straddles byte 2048 with the cut at every offset
        # inside the token: truncation may drop the declaration but can
        # never produce a crash or a non-string
        tag = b'<meta charset="windows-1252">'
        start = PRESCAN - split
        pad = b"z" * start
        payload = pad + tag + self._cp1252_body()
        out = decode_html_bytes(payload)
        assert isinstance(out, str)

    def test_partial_label_at_boundary_uses_prefix_or_falls_through(self):
        # "windows-1252" cut to "windows-1" inside the window: an unknown
        # label, so the decode falls through to the UTF-8/cp1252 chain
        tag = b'<meta charset="windows-1252">'
        cut = PRESCAN - (len(tag) - 4)  # window keeps tag minus 4 bytes
        payload = b"z" * cut + tag + "café".encode("utf-8")
        out = decode_html_bytes(payload)
        assert isinstance(out, str) and "café" in out
