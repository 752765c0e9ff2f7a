"""Audio quality signals: known-signal fixtures + WAV/FLAC agreement."""

from __future__ import annotations

import numpy as np
import pytest

from sat_bucket_spark.operators.audio import (
    audio_quality_features,
    pcm_quality_metrics,
)


def wav_bytes(samples: np.ndarray, rate: int = 16000) -> bytes:
    """PCM16 RIFF/WAVE from an (n,) or (n, ch) int array."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    pcm = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )


def tone(freq: float, rate: int = 16000, seconds: float = 1.0, amp: float = 0.5):
    t = np.arange(int(rate * seconds)) / rate
    return np.round(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int64)


class TestMetrics:
    def test_pure_tone_centroid_zcr_rms(self):
        rate, f = 16000, 440.0
        s = tone(f, rate)
        m = pcm_quality_metrics(rate, s[:, None])
        assert m["sample_rate"] == rate and m["n_samples"] == rate
        assert m["duration_s"] == 1.0
        # a tone at f crosses zero 2f times per second
        assert m["zcr_hz"] == pytest.approx(2 * f, rel=0.01)
        # spectral mass concentrates at f (leakage pulls it slightly)
        assert m["spectral_centroid_hz"] == pytest.approx(f, rel=0.05)
        assert m["spectral_rolloff_hz"] == pytest.approx(f, rel=0.05)
        # RMS of a 0.5-amplitude sine = 0.5/sqrt(2) -> ~-9.03 dBFS
        assert m["rms_db"] == pytest.approx(20 * np.log10(0.5 / np.sqrt(2)), abs=0.05)
        assert m["clip_frac"] == 0.0
        assert m["peak"] == pytest.approx(0.5, abs=0.01)

    def test_silence(self):
        m = pcm_quality_metrics(16000, np.zeros((16000, 1), dtype=np.int64))
        assert m["rms_db"] == -120.0
        assert m["silence_frac"] == 1.0
        assert m["zcr_hz"] == 0.0
        assert m["spectral_centroid_hz"] == 0.0

    def test_constant_signal_spectral_mass_is_zero(self):
        """FFT leakage on a DC-only clip must not fabricate a centroid
        (regression: ~1e-16-relative AC noise once produced 17 Hz)."""
        m = pcm_quality_metrics(
            16000, np.full((800, 1), 1234, dtype=np.int64)
        )
        assert m["spectral_centroid_hz"] == 0.0
        assert m["spectral_rolloff_hz"] == 0.0
        assert m["zcr_hz"] == 0.0

    def test_clipped_square_wave(self):
        rate, f = 16000, 100
        t = np.arange(rate)
        s = np.where((t * f // rate) % 2 == 0, 32767, -32767).astype(np.int64)
        # square wave alternating at... construct directly: sign flips 2f/s
        s = (32767 * np.sign(np.sin(2 * np.pi * f * t / rate))).astype(np.int64)
        s[s == 0] = 32767
        m = pcm_quality_metrics(rate, s[:, None])
        assert m["clip_frac"] > 0.99
        assert m["peak"] == pytest.approx(1.0, abs=1e-3)
        assert m["zcr_hz"] == pytest.approx(2 * f, rel=0.02)
        # odd harmonics push the centroid above the fundamental
        assert m["spectral_centroid_hz"] > f * 1.5

    def test_high_vs_low_frequency_orders_centroid(self):
        lo = pcm_quality_metrics(16000, tone(200)[:, None])
        hi = pcm_quality_metrics(16000, tone(4000)[:, None])
        assert hi["spectral_centroid_hz"] > 10 * lo["spectral_centroid_hz"] / 20
        assert hi["spectral_centroid_hz"] > lo["spectral_centroid_hz"]
        assert hi["spectral_rolloff_hz"] > lo["spectral_rolloff_hz"]

    def test_empty_clip(self):
        m = pcm_quality_metrics(16000, np.zeros((0, 1), dtype=np.int64))
        assert m["n_samples"] == 0 and m["silence_frac"] == 1.0


class TestSparkStage:
    def test_wav_and_flac_agree(self, spark):
        """The same samples through WAV and FLAC containers must produce
        identical metrics — the decoders feed one metrics path."""
        import sys

        sys.path.insert(0, "tests")
        from test_flac import encode_flac

        s = tone(440, seconds=0.05)  # 800 samples
        df = spark.createDataFrame(
            [
                (1, wav_bytes(s, 16000)),
                (2, encode_flac([[int(v) for v in s]], sample_rate=16000)),
                (3, b"not audio"),
                (4, None),
            ],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r for r in audio_quality_features(df).collect()}
        for field in ("sample_rate", "n_samples", "rms_db", "zcr_hz",
                      "spectral_centroid_hz", "spectral_rolloff_hz",
                      "clip_frac", "silence_frac", "peak", "duration_s"):
            assert rows[1][field] == rows[2][field], field
        assert rows[1]["sample_rate"] == 16000
        assert rows[3]["rms_db"] is None and rows[4]["rms_db"] is None

    def test_strict_raises_on_lossy(self, spark):
        df = spark.createDataFrame([(1, b"ID3junk")], "doc_id long, payload binary")
        with pytest.raises(Exception, match="soundfile adapter"):
            audio_quality_features(df, strict=True).collect()

    def test_stereo_wav(self, spark):
        left = tone(300, seconds=0.05)
        right = tone(600, seconds=0.05)
        s = np.stack([left, right], axis=1)
        df = spark.createDataFrame(
            [(1, wav_bytes(s, 16000))], "doc_id long, payload binary"
        )
        row = audio_quality_features(df).collect()[0]
        assert row["n_samples"] == 800
        # mono mixdown of 300+600 Hz tones: centroid between them
        assert 300 < row["spectral_centroid_hz"] < 700


class TestBitDepth:
    """Non-16-bit FLAC must be measured against ITS OWN full scale
    (regression: 24-bit streams once read peak~256 / clip_frac~1.0)."""

    @pytest.mark.parametrize("bps", [8, 12, 24])
    def test_flac_bit_depth_full_scale(self, spark, bps):
        import sys

        sys.path.insert(0, "tests")
        from test_flac import encode_flac

        rate = 16000
        t = np.arange(800) / rate
        # half-amplitude tone at the target depth's full scale
        amp = (1 << (bps - 1)) - 1
        s = np.round(0.5 * amp * np.sin(2 * np.pi * 440 * t)).astype(np.int64)
        s16 = np.round(0.5 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int64)
        df = spark.createDataFrame(
            [
                (1, encode_flac([[int(v) for v in s]], sample_rate=rate, bps=bps)),
                (2, encode_flac([[int(v) for v in s16]], sample_rate=rate, bps=16)),
            ],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r for r in audio_quality_features(df).collect()}
        # identical RELATIVE signal -> near-identical scale-relative metrics
        assert rows[1]["peak"] == pytest.approx(0.5, abs=0.01)
        assert rows[1]["clip_frac"] == 0.0
        assert rows[1]["rms_db"] == pytest.approx(rows[2]["rms_db"], abs=0.1)
        assert rows[1]["zcr_hz"] == rows[2]["zcr_hz"]

    def test_metrics_full_scale_param(self):
        s = np.full((100, 1), 1 << 22, dtype=np.int64)  # half scale at 24-bit
        m = pcm_quality_metrics(16000, s, full_scale=float(1 << 23))
        assert m["peak"] == pytest.approx(0.5)
        assert m["clip_frac"] == 0.0


class TestMalformedWav:
    def test_bad_block_align_yields_null_not_error(self, spark):
        """block_align smaller than channels*2 must degrade to NULL
        metrics, not escape mapInPandas as a task failure (ADVICE r6).
        (With the optional soundfile adapter installed the payload may
        be salvaged instead — skip there.)"""
        from sat_bucket_spark.operators.codec_adapters import soundfile_available

        if soundfile_available():
            pytest.skip("soundfile adapter salvages the malformed WAV")
        s = tone(440, seconds=0.01)
        good = wav_bytes(s, 16000)
        # corrupt block_align: stereo claimed (2 ch) but block_align=2
        bad = bytearray(wav_bytes(np.stack([s, s], axis=1), 16000))
        # fmt chunk body starts at byte 20; block_align at offset 12 within
        bad[20 + 12 : 20 + 14] = (2).to_bytes(2, "little")
        df = spark.createDataFrame(
            [(1, good), (2, bytes(bad))], "doc_id long, payload binary"
        )
        rows = {r["doc_id"]: r for r in audio_quality_features(df).collect()}
        assert rows[1]["rms_db"] is not None
        assert rows[2]["rms_db"] is None  # undecodable -> NULL, no raise
