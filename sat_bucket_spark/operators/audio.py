"""Audio quality signals over REAL decoded PCM — the audio curation gate.

A training-data audio pipeline filters on signal quality the way text
pipelines filter on Gopher rules: silence-padded clips, clipped
recordings, DC-stuck channels and near-empty files waste tokens and bias
models. Every signal here is computed from the ACTUAL samples — WAV/PCM16
directly, FLAC via the pure-Python frame decoder (operators/flac.py) —
with numpy only (the FFT for spectral shape ships with numpy).

Per-document output of :func:`audio_quality_features`:

- ``sample_rate``, ``n_samples``, ``duration_s``;
- ``rms_db``: full-scale-relative RMS in dB (silence floors at -120);
- ``peak``: max |sample| / full scale;
- ``clip_frac``: fraction of samples at >= 99.9% full scale (hard
  clipping leaves plateaus there);
- ``silence_frac``: fraction below 0.1% full scale;
- ``zcr_hz``: mean zero-crossing rate of the mono mixdown, in crossings
  per second (a pure tone at f crosses 2f times/s);
- ``spectral_centroid_hz`` / ``spectral_rolloff_hz``: amplitude-weighted
  mean frequency and the 95%-energy frequency of the mono mixdown's
  rFFT — cheap proxies for hiss (centroid high), rumble/DC (low), and
  bandlimited upsampled fakes (rolloff far below Nyquist).

Scale shape: Arrow-batched ``mapInPandas``, map-only, no shuffle; the
same stage contract as every multimodal operator. Lossy audio decodes
through the optional soundfile adapter when installed
(operators/codec_adapters.py); otherwise it stays the documented codec
plug-in point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["audio_quality_features", "pcm_quality_metrics"]


def _wav_pcm16(payload: bytes):
    """(rate, (n, ch) int32 array) for a PCM16 RIFF/WAVE payload, else None."""
    import numpy as np

    from sat_bucket_spark.operators.multimodal import _wav_fmt_and_data

    parsed = _wav_fmt_and_data(payload)
    if parsed is None:
        return None
    fmt_body, (rate, block), data = parsed
    audio_format = int.from_bytes(fmt_body[0:2], "little")
    channels = int.from_bytes(fmt_body[2:4], "little")
    bps = int.from_bytes(fmt_body[14:16], "little")
    if audio_format != 1 or bps != 16 or channels < 1:
        return None
    if block != channels * 2:
        # a malformed block_align would make frombuffer ask for more
        # bytes than the data chunk holds; undecodable -> NULL metrics
        return None
    n = len(data) // block
    samples = np.frombuffer(data, dtype="<i2", count=n * channels)
    return rate, samples.reshape(n, channels).astype(np.int32)


def pcm_quality_metrics(rate: int, samples, full_scale: float = 32768.0) -> dict:
    """The quality signals for one clip: (n, ch) integer samples measured
    against ``full_scale`` (``1 << (bps - 1)`` for bps-bit PCM; default
    16-bit). Pure numpy — shared by the Spark stage and tests."""
    import numpy as np

    fs = float(full_scale)
    n = int(samples.shape[0])
    out = {
        "sample_rate": int(rate),
        "n_samples": n,
        "duration_s": round(n / rate, 6) if rate else 0.0,
    }
    if n == 0:
        out.update(
            rms_db=-120.0, peak=0.0, clip_frac=0.0, silence_frac=1.0,
            zcr_hz=0.0, spectral_centroid_hz=0.0, spectral_rolloff_hz=0.0,
        )
        return out
    x = samples.astype(np.float64) / fs
    rms = float(np.sqrt(np.mean(x * x)))
    out["rms_db"] = round(max(20.0 * np.log10(rms), -120.0), 6) if rms > 0 else -120.0
    out["peak"] = round(float(np.abs(x).max()), 6)
    out["clip_frac"] = round(float(np.mean(np.abs(x) >= 0.999)), 6)
    out["silence_frac"] = round(float(np.mean(np.abs(x) < 1e-3)), 6)
    mono = x.mean(axis=1)
    if n > 1 and rate:
        crossings = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        out["zcr_hz"] = round(crossings / (n / rate), 6)
    else:
        out["zcr_hz"] = 0.0
    spec = np.abs(np.fft.rfft(mono))
    dc = spec[0]
    spec[0] = 0.0  # DC carries no pitch information
    total = spec.sum()
    # float FFT of a constant/DC-only signal leaks ~1e-16-relative noise
    # into the AC bins; below 1e-9 of the DC mass, the clip has no real
    # AC content and the spectral features are defined as 0
    if total <= dc * 1e-9:
        total = 0.0
    if total > 0 and rate:
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        out["spectral_centroid_hz"] = round(float((freqs * spec).sum() / total), 6)
        energy = np.cumsum(spec**2)
        k = int(np.searchsorted(energy, 0.95 * energy[-1]))
        out["spectral_rolloff_hz"] = round(float(freqs[min(k, len(freqs) - 1)]), 6)
    else:
        out["spectral_centroid_hz"] = 0.0
        out["spectral_rolloff_hz"] = 0.0
    return out


_QUALITY_FIELDS = [
    ("sample_rate", "long"), ("n_samples", "long"), ("duration_s", "double"),
    ("rms_db", "double"), ("peak", "double"), ("clip_frac", "double"),
    ("silence_frac", "double"), ("zcr_hz", "double"),
    ("spectral_centroid_hz", "double"), ("spectral_rolloff_hz", "double"),
]


def audio_quality_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Per-clip quality signals from real PCM (WAV/PCM16 or FLAC inputs).

    Undecodable payloads yield NULL metrics (``strict=True`` raises);
    lossy audio decodes via the optional soundfile adapter when present. Output schema: id + the
    ten metric columns (module docstring); the id dtype follows the
    input schema.
    """
    from pyspark.sql import types as T

    spark_types = {"long": T.LongType(), "double": T.DoubleType()}
    schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType, True)]
        + [T.StructField(n, spark_types[t], True) for n, t in _QUALITY_FIELDS]
    )

    def _features(batches):
        import pandas as _pd

        from sat_bucket_spark.operators.flac import decode_flac_samples
        from sat_bucket_spark.operators.multimodal import parse_flac_streaminfo

        for pdf in batches:
            rows = {name: [] for name, _ in _QUALITY_FIELDS}
            ids = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                decoded = None
                if payload is not None:
                    wav = _wav_pcm16(payload)
                    if wav is not None:
                        decoded = (*wav, 32768.0)
                if decoded is None and payload is not None and payload[:4] == b"fLaC":
                    try:
                        rate, _ch, arr = decode_flac_samples(payload)
                        # FLAC carries its bit depth in STREAMINFO; samples
                        # are raw bps-bit integers, so full scale is
                        # 1 << (bps - 1), NOT the 16-bit 32768 (a 24-bit
                        # stream would otherwise read 256x over scale)
                        info = parse_flac_streaminfo(payload)
                        bps = info[2] if info is not None else 16
                        decoded = (rate, arr, float(1 << (bps - 1)))
                    except ValueError:
                        if strict:
                            raise
                        decoded = None  # corrupt stream: NULL metrics
                if decoded is None and payload is not None:
                    # lossy/other formats: the optional soundfile adapter
                    # (codec_adapters.py) closes the gap when installed
                    from sat_bucket_spark.operators.codec_adapters import (
                        soundfile_decode_audio,
                    )

                    decoded = soundfile_decode_audio(payload)
                ids.append(doc_id)
                if decoded is None:
                    if strict:
                        raise NotImplementedError(
                            "payload is not PCM16 WAV or FLAC and the "
                            "optional soundfile adapter is unavailable "
                            "or could not decode it"
                        )
                    for name, _ in _QUALITY_FIELDS:
                        rows[name].append(None)
                    continue
                m = pcm_quality_metrics(*decoded)
                for name, _ in _QUALITY_FIELDS:
                    rows[name].append(m[name])
            out = {id_col: ids}
            for name, typ in _QUALITY_FIELDS:
                out[name] = _pd.array(
                    rows[name], dtype="Int64" if typ == "long" else "Float64"
                )
            yield _pd.DataFrame(out)

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # single-file inputs otherwise decode serially in one Python worker;
    # no-op when the source is already split (see ensure_parallelism)
    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        _features, schema=schema
    )
