"""Optional PIL/soundfile codec adapters: guarded import, cross-validation.

Every test that needs a library skips cleanly when it is absent — this
container ships neither, so the suite exercises the absent-path contract
(always None, never an import error) and the wiring (pure-Python decoders
still first). In an environment WITH the libraries, the same file
cross-validates library output against the pure-Python decoders.
"""

from __future__ import annotations

import numpy as np
import pytest

from sat_bucket_spark.operators.codec_adapters import (
    adapters_available,
    pil_available,
    pil_decode_image_pixels,
    soundfile_available,
    soundfile_decode_audio,
)


class TestAbsentPathContract:
    """Valid regardless of environment: adapters never raise."""

    def test_availability_report_shape(self):
        avail = adapters_available()
        assert set(avail) == {"pil", "soundfile"}
        assert all(isinstance(v, bool) for v in avail.values())

    def test_none_payload_is_none(self):
        assert pil_decode_image_pixels(None) is None
        assert soundfile_decode_audio(None) is None

    def test_garbage_payload_is_none(self):
        assert pil_decode_image_pixels(b"\x00\x01 garbage") is None
        assert soundfile_decode_audio(b"\x00\x01 garbage") is None

    def test_decode_image_pixels_still_none_for_unknown(self):
        from sat_bucket_spark.operators.multimodal import decode_image_pixels

        if pil_available():
            pytest.skip("PIL present: unknown-magic payloads may decode")
        assert decode_image_pixels(b"\x00unknown-magic") is None

    def test_pure_python_decoders_run_first(self, monkeypatch):
        """A BMP must decode via the pure path even when an adapter is
        'installed' — the adapter is a fallback, not a replacement."""
        import sys

        sys.path.insert(0, "tests")
        from test_imagehash import bmp_bytes, rng_rgb

        import sat_bucket_spark.operators.codec_adapters as ca
        from sat_bucket_spark.operators import multimodal

        def boom(payload):
            raise AssertionError("adapter consulted for a pure-path format")

        monkeypatch.setattr(ca, "pil_decode_image_pixels", boom)
        px = rng_rgb(4, 4, 1)
        got = multimodal.decode_image_pixels(bmp_bytes(px))
        assert np.array_equal(got, px)


@pytest.mark.skipif(not pil_available(), reason="Pillow not installed")
class TestPilCrossValidation:
    """Runs only where Pillow exists: library vs pure-Python decoders."""

    def _png(self, px):
        from test_multimodal import png_bytes  # test-side encoder

        return png_bytes(px)

    def test_png_agrees_with_pure_decoder(self):
        import sys

        sys.path.insert(0, "tests")
        from test_imagehash import bmp_bytes, rng_rgb

        from sat_bucket_spark.operators.multimodal import decode_bmp_pixels

        px = rng_rgb(8, 8, 3)
        payload = bmp_bytes(px)
        pure = decode_bmp_pixels(payload)
        lib = pil_decode_image_pixels(payload)
        assert np.array_equal(pure, lib)


@pytest.mark.skipif(not soundfile_available(), reason="soundfile not installed")
class TestSoundfileCrossValidation:
    def test_wav_agrees_with_pure_decoder(self):
        import sys

        sys.path.insert(0, "tests")
        from test_audio_quality import tone, wav_bytes

        from sat_bucket_spark.operators.audio import _wav_pcm16

        s = tone(440, seconds=0.05)
        payload = wav_bytes(s, 16000)
        rate_p, samples_p = _wav_pcm16(payload)
        rate_l, samples_l, scale = soundfile_decode_audio(payload)
        assert rate_p == rate_l and scale == 32768.0
        assert np.array_equal(samples_p, samples_l)
