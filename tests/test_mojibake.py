"""Tests: mojibake (double-encoded UTF-8) repair.

No DuckDB oracle — the repair needs latin-1/cp1252 transcoding DuckDB does
not expose, so correctness is pinned by Python round-trip truth instead:
for any clean text t, mojibake(t) must repair back to exactly t, and
anything without the mojibake signature must pass through byte-identical.
"""

from __future__ import annotations

import pytest

from sat_bucket_spark.operators.text import repair_mojibake


def _moji(t: str) -> str:
    return t.encode("utf-8").decode("latin-1")


def _moji_1252(t: str) -> str:
    return t.encode("utf-8").decode("cp1252")


CLEAN = [
    "plain ascii only",
    "café déjà-vu naïve façade",  # real latin-1 prose, no lead-byte pattern
    "中文和日本語のテキスト",
    "emoji 🙂 and math ∑∫",
    "",
]

FIXABLE = [
    "café — it’s naïve",
    "Ünïcödé „quotes” and €uro",
    "über • straße",
]


class TestRepairMojibake:
    def test_single_pass_fixes_latin1_mojibake(self, spark):
        rows = [(i, _moji(t)) for i, t in enumerate(FIXABLE)]
        df = spark.createDataFrame(rows, ["i", "text"])
        out = {r["i"]: r["text"] for r in repair_mojibake(df).collect()}
        for i, t in enumerate(FIXABLE):
            assert out[i] == t

    def test_cp1252_mojibake(self, spark):
        """Curly quotes land in 0x80-0x9F, which only cp1252 round-trips."""
        # (avoids U+201D whose 0x9D byte is undefined in cp1252 — such
        # bytes survive real-world mojibake only via latin-1 mixtures,
        # covered by the latin-1 tests)
        t = "it’s “quoted – dash"
        df = spark.createDataFrame([(1, _moji_1252(t))], ["i", "text"])
        assert repair_mojibake(df).collect()[0]["text"] == t

    def test_double_mojibake_unwound(self, spark):
        t = "café — it’s naïve"
        dbl = _moji(_moji(t))
        df = spark.createDataFrame([(1, dbl)], ["i", "text"])
        assert repair_mojibake(df, max_passes=2).collect()[0]["text"] == t

    def test_clean_text_untouched(self, spark):
        rows = [(i, t) for i, t in enumerate(CLEAN)] + [(99, None)]
        df = spark.createDataFrame(rows, ["i", "text"])
        out = {r["i"]: r["text"] for r in repair_mojibake(df).collect()}
        for i, t in enumerate(CLEAN):
            assert out[i] == t
        assert out[99] is None

    def test_out_column(self, spark):
        t = "café"
        df = spark.createDataFrame([(1, _moji(t))], ["i", "text"])
        row = repair_mojibake(df, out="fixed").collect()[0]
        assert row["fixed"] == t and row["text"] == _moji(t)

    def test_mixed_unrepairable_passes_through(self, spark):
        """Mojibake-looking text mixed with chars that cannot re-encode to
        a single byte must come back unchanged, not half-converted."""
        t = "mixed Ã© plus 中文"
        df = spark.createDataFrame([(1, t)], ["i", "text"])
        assert repair_mojibake(df).collect()[0]["text"] == t

    @pytest.mark.parametrize("t", FIXABLE + CLEAN[:4])
    def test_python_roundtrip_property(self, t):
        """Property at the codec level (no Spark): repair(mojibake(t)) == t
        and repair leaves clean t alone — the invariant the UDF encodes."""
        import re

        from sat_bucket_spark.operators.text import _MOJI_PATTERN

        sig = re.compile(_MOJI_PATTERN)

        def one(s, passes=2):
            for _ in range(passes):
                if not sig.search(s):
                    return s
                try:
                    b = s.encode("cp1252")
                except UnicodeEncodeError:
                    try:
                        b = s.encode("latin-1")
                    except UnicodeEncodeError:
                        return s
                try:
                    r = b.decode("utf-8")
                except UnicodeDecodeError:
                    return s
                if r == s:
                    return s
                s = r
            return s

        assert one(_moji(t)) == t or not sig.search(_moji(t))
        assert one(t) == t
