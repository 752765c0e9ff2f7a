"""Optional real-codec adapters: PIL / soundfile, guarded by import.

The suite's pure-Python decoders (multimodal.py, jpeg.py, vp8l.py,
flac.py) cover PNG/BMP/GIF/TIFF/JPEG-Huffman/VP8L/WAV/FLAC with zero
dependencies. The LOSSY family — arithmetic-coded JPEG, lossy VP8/WebP,
MP3/AAC/OGG audio — needs a codec library. This module closes those the
moment the environment has one, with no API change:

- ``decode_image_pixels`` falls through here when the pure-Python path
  cannot decode (unknown magic, or a supported container carrying an
  unsupported coding like VP8-lossy-in-WebP);
- ``audio_quality_features`` falls through here when the payload is
  neither PCM16 WAV nor FLAC.

Pure-Python decoders stay FIRST: they are deterministic everywhere,
while library output can vary by build (e.g. libjpeg IDCT flavors). When
both paths can decode the same payload, tests cross-validate them
(tests/test_codec_adapters.py, skipped cleanly when the libraries are
absent — the same pattern as the javax.imageio JPEG validation).

Everything here returns ``None`` (never raises) when the library is
missing or the payload is undecodable, so callers keep their existing
strict/fallback contracts.
"""

from __future__ import annotations

from functools import lru_cache

__all__ = [
    "adapters_available",
    "pil_available",
    "pil_decode_image_pixels",
    "soundfile_available",
    "soundfile_decode_audio",
]


@lru_cache(maxsize=1)
def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@lru_cache(maxsize=1)
def soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def adapters_available() -> dict:
    """Which optional codec libraries this environment provides."""
    return {"pil": pil_available(), "soundfile": soundfile_available()}


def pil_decode_image_pixels(payload: bytes | None):
    """(H, W, 3) uint8 RGB via PIL, or None (library absent / undecodable)."""
    if payload is None or not pil_available():
        return None
    import io

    import numpy as np
    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


def soundfile_decode_audio(payload: bytes | None):
    """(sample_rate, (n, ch) int32 samples, full_scale) via soundfile,
    or None. Samples are int16-ranged (full_scale 32768) regardless of
    the source depth, matching the WAV/PCM16 contract of
    audio.pcm_quality_metrics."""
    if payload is None or not soundfile_available():
        return None
    import io

    import numpy as np
    import soundfile as sf

    try:
        data, rate = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
    except Exception:
        return None
    return int(rate), data.astype(np.int32), 32768.0
