"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel through the engine as ``binary`` columns with a
struct of typed metadata, processed by Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing (schemas, batching, partition sizing) is real and
tested, and so are most decoders: PNG (incl. Adam7 interlace), BMP, GIF,
TIFF (baseline), JPEG (baseline + progressive, Huffman), VP8L lossless
WebP, FLAC, WAV/PCM and MJPEG-in-AVI frames all decode to real pixels /
samples in pure Python (this module plus operators/{jpeg,vp8l,flac}.py).
Only the LOSSY codec family remains a plug-in point — arithmetic-coded
JPEG, lossy VP8/WebP, MP3/AAC sample decode, and non-MJPEG video frames —
each behind a real container parser that either raises
``NotImplementedError`` (``strict=True``) or produces a deterministic
fallback derived from the payload bytes, so pipelines stay testable
end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "AUDIO_FEATURE_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "attach_binary_metadata",
    "build_avi_bytes",
    "decode_and_featurize_images",
    "decode_audio_features",
    "decode_bmp_pixels",
    "decode_tiff_pixels",
    "decode_gif_pixels",
    "decode_image_pixels",
    "decode_png_pixels",
    "exif_normalization_plan",
    "exif_orientation_table",
    "parse_bmp_header",
    "parse_exif_orientation",
    "parse_flac_streaminfo",
    "parse_mp3_frame",
    "parse_mp4",
    "parse_mp4_frame_times",
    "parse_image_header",
    "select_frames_at_rate",
    "parse_jpeg_header",
    "parse_png_header",
    "parse_tiff_header",
    "parse_wav",
    "plan_resize",
    "resize_images",
    "RESIZE_SCHEMA",
    "parse_avi_frames",
    "sample_video_frames",
    "segment_audio",
    "segment_wav_payload",
    "SEGMENT_SCHEMA",
    "video_metadata",
]

# feature is double, not float: real-pixel features must hash-match an ANSI
# SQL oracle computing the same IEEE-double arithmetic — a float32 round trip
# would perturb the 6-decimal rounding.
IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _pixel_features(px: "np.ndarray") -> list[float]:
    """[mean, std, min, max] of the pixel bytes, each divided by 255.

    Computed from INTEGER sums with a pinned operation order
    (``m = s/n; var = q/n - m*m; std = sqrt(var)``) and NO decimal
    rounding: every step (int->double division, multiply, sqrt) is a
    correctly-rounded IEEE-754 op, so any engine repeating the same formula
    on the same integers produces BIT-IDENTICAL doubles — that's what makes
    real pixel features oracle-hashable. (A decimal ``round`` would
    reintroduce engine-specific tie-breaking.)
    """
    v = px.astype(np.int64).ravel()
    n = v.size
    s = int(v.sum())
    q = int((v * v).sum())
    m = s / n
    var = q / n - m * m
    std = var**0.5 if var > 0 else 0.0
    return [m / 255.0, std / 255.0, int(v.min()) / 255.0, int(v.max()) / 255.0]


def attach_binary_metadata(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image/png"
) -> DataFrame:
    """Add the typed metadata struct every multimodal payload carries."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(payload_col).cast("string")).alias("checksum"),
        ),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def parse_png_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, channels) from a PNG IHDR chunk — pure struct parsing.

    The PNG container format is public and trivially parseable without a codec
    library: an 8-byte signature, then chunks of (length BE32, type, data,
    crc); IHDR is required to be first and carries width/height (BE32 each),
    bit depth and color type. Returns None for anything that is not a valid
    PNG header (callers fall back or raise per their ``strict`` setting).
    """
    if payload is None or len(payload) < 26 or not payload.startswith(_PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    channels = _PNG_CHANNELS.get(payload[25])
    if channels is None or width == 0 or height == 0:
        return None
    return width, height, channels


def decode_png_pixels(payload: bytes | None) -> "np.ndarray | None":
    """Decode an 8-bit PNG (sequential or Adam7) to an (H, W, C) uint8 array.

    Pure Python + numpy: ``zlib`` (stdlib) inflates the IDAT stream and the
    five scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9) are
    unfiltered here — no codec library. Supports bit depth 8, interlace 0
    and 1 (Adam7: seven independently-filtered passes scattered back on
    the §8.2 grid — r6), color types 0 (gray), 2 (RGB), 3 (palette,
    expanded to RGB), 4 (gray+alpha) and 6 (RGBA). Returns None for
    anything else (16-bit, truncated, non-PNG) — callers keep their
    fallback/strict behavior. The inflater is a ``decompressobj`` so streams with an
    unchecked/zeroed adler32 trailer (e.g. expression-synthesized fixtures)
    still decode; actual pixel bytes are always checksummed upstream by the
    driver's value hash, not here.
    """
    import zlib

    if payload is None or len(payload) < 45 or not payload.startswith(_PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    bit_depth, color_type, _comp, _filt, interlace = payload[24:29]
    if bit_depth != 8 or interlace not in (0, 1) or color_type not in (0, 2, 3, 4, 6):
        return None
    if width == 0 or height == 0:
        return None
    # walk chunks: concatenate IDAT, remember PLTE
    idat = b""
    palette = None
    pos = 33  # signature + IHDR chunk
    n = len(payload)
    while pos + 8 <= n:
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IDAT":
            idat += data
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if not idat or (color_type == 3 and palette is None):
        return None
    try:
        raw = zlib.decompressobj().decompress(idat)
    except zlib.error:
        # zeroed/absent adler32 trailer (expression-synthesized fixtures):
        # retry as a raw deflate stream, which carries no checksum
        try:
            raw = zlib.decompressobj(wbits=-15).decompress(idat[2:])
        except zlib.error:
            return None
    stream_ch = _PNG_CHANNELS[color_type]  # palette streams are 1 byte/pixel
    if interlace == 0:
        res = _png_unfilter(raw, 0, height, width, stream_ch)
        if res is None:
            return None
        px = res[0].reshape(height, width, stream_ch)
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        px = np.zeros((height, width, stream_ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines
            res = _png_unfilter(raw, off, ph, pw, stream_ch)
            if res is None:
                return None
            sub, off = res
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, stream_ch)
    if color_type == 3:
        if int(px.max()) >= len(palette):
            return None
        px = palette[px[:, :, 0]]
    return px


# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, height: int, width: int, stream_ch: int):
    """Unfilter one (sub-)image of scanlines starting at ``off`` in the
    inflated stream: returns ((height, width*ch) uint8, next offset), or
    None on truncation / an invalid filter byte."""
    import numpy as np

    stride = width * stream_ch
    if len(raw) < off + height * (1 + stride):
        return None
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_off = off + y * (1 + stride)
        ft = raw[row_off]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).astype(np.int32)
        if ft == 0:  # None
            rec = row
        elif ft == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ft == 1:  # Sub: per-lane running sum (mod-256 addition is linear)
            lanes = row.reshape(width, stream_ch)
            rec = (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF).reshape(stride)
        elif ft == 3:  # Average (floor-div is nonlinear: scalar sweep)
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - stream_ch] if i >= stream_ch else 0
                rec[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = int(rec[i - stream_ch]) if i >= stream_ch else 0
                b = int(prev[i])
                c = int(prev[i - stream_ch]) if i >= stream_ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (row[i] + pr) & 0xFF
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out, off + height * (1 + stride)


def parse_jpeg_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, channels) from JPEG SOF markers — pure struct parsing.

    JPEG is a public marker-segment container: 0xFFD8 (SOI), then segments
    of (0xFF, marker, length BE16, data). Frame dimensions live in the
    first SOFn segment (0xC0-0xCF except DHT 0xC4 / DNL 0xC8 / DAC 0xCC):
    [precision u8, height BE16, width BE16, components u8]. Walks the
    segment chain without decoding any entropy data; returns None for
    anything that is not a parseable JPEG.
    """
    if payload is None or len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        # The standard allows any number of 0xFF fill bytes before a
        # marker; skip them so the marker byte is read correctly.
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            return None
        marker = payload[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: bare
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 8:
                return None
            height = int.from_bytes(payload[i + 5 : i + 7], "big")
            width = int.from_bytes(payload[i + 7 : i + 9], "big")
            channels = payload[i + 9]
            if width == 0 or height == 0 or channels == 0:
                return None
            return width, height, channels
        i += 2 + seg_len
    return None


def parse_gif_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, channels) from a GIF Logical Screen Descriptor.

    Public container: 6-byte magic (``GIF87a``/``GIF89a``) then canvas
    width/height as little-endian u16. GIF pixels are palette-indexed RGB —
    reported as 3 channels (per-frame transparency lives in extension
    blocks and does not change the canvas pixel model).
    """
    if payload is None or len(payload) < 10:
        return None
    if payload[0:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width = int.from_bytes(payload[6:8], "little")
    height = int.from_bytes(payload[8:10], "little")
    if width == 0 or height == 0:
        return None
    return width, height, 3


def parse_webp_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, channels) from a WebP RIFF container — pure parsing.

    Public container: ``RIFF <size> WEBP`` then one of three first chunks:

    - ``VP8 `` (lossy): 3-byte frame tag, sync code ``9D 01 2A``, then
      width/height as 14-bit little-endian fields; 3 channels.
    - ``VP8L`` (lossless): signature byte ``0x2F`` then a 32-bit field
      packing width-1 (14 bits), height-1 (14 bits) and an alpha flag.
    - ``VP8X`` (extended): flags byte (bit 0x10 = alpha) + canvas
      width-1/height-1 as 24-bit little-endian.
    """
    # smallest parseable form: RIFF header (12) + chunk header (8) + VP8L
    # signature-and-dims payload (5)
    if payload is None or len(payload) < 25:
        return None
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    fourcc = payload[12:16]
    data = payload[20:]  # chunk payload (after fourcc + LE32 size)
    if fourcc == b"VP8 ":
        # frame tag (3) + sync code (3) + dims
        if len(data) < 10 or data[3:6] != b"\x9d\x01\x2a":
            return None
        width = int.from_bytes(data[6:8], "little") & 0x3FFF
        height = int.from_bytes(data[8:10], "little") & 0x3FFF
        channels = 3
    elif fourcc == b"VP8L":
        if len(data) < 5 or data[0] != 0x2F:
            return None
        bits = int.from_bytes(data[1:5], "little")
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
        channels = 4 if (bits >> 28) & 1 else 3
    elif fourcc == b"VP8X":
        if len(data) < 10:
            return None
        channels = 4 if data[0] & 0x10 else 3
        width = int.from_bytes(data[4:7], "little") + 1
        height = int.from_bytes(data[7:10], "little") + 1
    else:
        return None
    if width == 0 or height == 0:
        return None
    return width, height, channels


def parse_bmp_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, channels) from a Windows BMP file header — pure parsing.

    Public container: ``BM`` magic, 14-byte file header, then a DIB header
    whose first LE32 is its own size. BITMAPINFOHEADER (40+) stores width
    as LE i32 at offset 18 and height at 22 (negative height = top-down
    rows; dimension is the absolute value). Bits-per-pixel at offset 28:
    ≤8 = palette-indexed RGB (3 channels), 24 = BGR, 32 = BGRA.
    The ancient BITMAPCOREHEADER (size 12) stores u16 dims instead.
    """
    if payload is None or len(payload) < 26:
        return None
    if payload[0:2] != b"BM":
        return None
    dib_size = int.from_bytes(payload[14:18], "little")
    if dib_size == 12:  # BITMAPCOREHEADER: u16 dims, u16 bpp
        width = int.from_bytes(payload[18:20], "little")
        height = int.from_bytes(payload[20:22], "little")
        bpp = int.from_bytes(payload[24:26], "little")
    else:  # BITMAPINFOHEADER and successors: i32 dims, u16 bpp
        if len(payload) < 30 or dib_size < 40:
            return None
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = abs(int.from_bytes(payload[22:26], "little", signed=True))
        bpp = int.from_bytes(payload[28:30], "little")
    if width <= 0 or height == 0:
        return None
    channels = 4 if bpp == 32 else 3
    return width, height, channels


def parse_tiff_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """(width, height, channels) from a baseline TIFF IFD walk — pure parsing.

    Public container (TIFF 6.0): 2-byte byte-order mark (``II``/``MM``),
    magic 42, LE/BE u32 offset to the first Image File Directory. Each IFD
    is a u16 entry count then 12-byte entries (tag, type, count, value);
    values ≤4 bytes are inlined in the value field. Reads tags 256
    (ImageWidth), 257 (ImageLength) and 277 (SamplesPerPixel, default 1
    per spec — grayscale/bilevel report 1 channel).
    """
    if payload is None or len(payload) < 8:
        return None
    if payload[0:4] == b"II\x2a\x00":
        order = "little"
    elif payload[0:4] == b"MM\x00\x2a":
        order = "big"
    else:
        return None

    def u16(off: int) -> int:
        return int.from_bytes(payload[off : off + 2], order)

    def u32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], order)

    ifd = u32(4)
    if ifd + 2 > len(payload):
        return None
    n_entries = u16(ifd)
    width = height = None
    channels = 1  # SamplesPerPixel defaults to 1 (TIFF 6.0 §8)
    for i in range(n_entries):
        off = ifd + 2 + 12 * i
        if off + 12 > len(payload):
            return None
        tag, typ = u16(off), u16(off + 2)
        # SHORT values sit in the value field's first 2 bytes, LONG in all 4
        val = u16(off + 8) if typ == 3 else u32(off + 8)
        if tag == 256:
            width = val
        elif tag == 257:
            height = val
        elif tag == 277:
            channels = val
    if not width or not height:
        return None
    return width, height, channels


_TIFF_TYPE_SIZES = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def decode_tiff_pixels(payload: bytes | None) -> "np.ndarray | None":
    """Decode an UNCOMPRESSED 8-bit baseline TIFF to (H, W, C) uint8.

    The strip-organized raw case of TIFF 6.0 — the format scanners and
    scientific tools still emit: Compression=1, BitsPerSample all 8,
    PhotometricInterpretation 0 (WhiteIsZero, inverted on decode),
    1 (BlackIsZero) or 2 (RGB), pixel data as concatenated strips
    (StripOffsets/StripByteCounts, any RowsPerStrip). Compressed TIFFs
    (LZW/deflate/JPEG-in-TIFF) return None — header parsing still covers
    them via :func:`parse_tiff_header`.
    """
    if payload is None or len(payload) < 8:
        return None
    if payload[0:4] == b"II\x2a\x00":
        order = "little"
    elif payload[0:4] == b"MM\x00\x2a":
        order = "big"
    else:
        return None

    def u16(off: int) -> int:
        return int.from_bytes(payload[off : off + 2], order)

    def u32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], order)

    ifd = u32(4)
    if ifd + 2 > len(payload):
        return None
    n_entries = u16(ifd)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd + 2 + 12 * i
        if off + 12 > len(payload):
            return None
        tag, typ = u16(off), u16(off + 2)
        count = u32(off + 4)
        size = _TIFF_TYPE_SIZES.get(typ)
        if size is None:
            continue  # rational/etc — not needed for the raw-pixel path
        read1 = u16 if size == 2 else u32 if size == 4 else (
            lambda o: payload[o]
        )
        base = off + 8 if count * size <= 4 else u32(off + 8)
        if base + count * size > len(payload):
            return None
        tags[tag] = [read1(base + k * size) for k in range(count)]

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    width = one(256)
    height = one(257)
    if not width or not height:
        return None
    if one(259, 1) != 1:  # Compression: only 1 (none) decodes here
        return None
    channels = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits) or channels < 1:
        return None
    photometric = one(262, 1)
    if photometric not in (0, 1, 2):
        return None
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets:
        return None
    if not counts:
        # single strip without byte counts: everything to EOF
        counts = [len(payload) - offsets[0]]
    if len(offsets) != len(counts):
        return None
    data = bytearray()
    for o, c in zip(offsets, counts):
        if o + c > len(payload):
            return None
        data += payload[o : o + c]
    need = width * height * channels
    if len(data) < need:
        return None
    px = np.frombuffer(bytes(data), dtype=np.uint8, count=need).reshape(
        height, width, channels
    )
    if photometric == 0:  # WhiteIsZero: invert to the usual polarity
        px = 255 - px
    return px


def decode_bmp_pixels(payload: bytes | None) -> "np.ndarray | None":
    """Decode an uncompressed Windows BMP to an (H, W, C) uint8 array.

    Pure Python + numpy: BI_RGB (compression 0) BITMAPINFOHEADER files at
    8 (palette), 24 (BGR) or 32 (BGRA) bits per pixel. Rows are stored
    bottom-up (top-down when the header height is negative) and padded to
    4-byte multiples; channel order is flipped to RGB(A). Returns None for
    RLE/bitfield compression, core headers, or truncated data.
    """
    if payload is None or len(payload) < 54 or payload[0:2] != b"BM":
        return None
    data_off = int.from_bytes(payload[10:14], "little")
    dib_size = int.from_bytes(payload[14:18], "little")
    if dib_size < 40:
        return None
    width = int.from_bytes(payload[18:22], "little", signed=True)
    raw_h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or width <= 0 or raw_h == 0 or bpp not in (8, 24, 32):
        return None
    height, top_down = abs(raw_h), raw_h < 0
    palette = None
    if bpp == 8:
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal_off = 14 + dib_size
        pal = payload[pal_off : pal_off + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            return None
        # BGRA entries -> RGB lookup
        palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 4)[:, [2, 1, 0]]
    row_bytes = (width * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    if len(payload) < data_off + stride * height:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows
        if int(idx.max()) >= len(palette):
            return None
        return palette[idx]
    ch = bpp // 8
    px = rows.reshape(height, width, ch)
    order = [2, 1, 0] if ch == 3 else [2, 1, 0, 3]  # BGR(A) -> RGB(A)
    return np.ascontiguousarray(px[:, :, order])


def decode_gif_pixels(payload: bytes | None) -> "np.ndarray | None":
    """Decode the first frame of a GIF to an (H, W, 3) uint8 RGB array.

    Pure Python: the GIF87a/89a container walk (logical screen descriptor,
    color tables, extension skipping, image descriptor) plus a standard
    GIF-variant LZW decoder (clear/end codes, code width growing to 12
    bits) and 4-pass interlace reordering. The frame is mapped through its
    (local, else global) color table; transparency is ignored — the
    feature path wants pixel statistics, not compositing. Returns None on
    malformed/truncated streams.
    """
    if payload is None or len(payload) < 13 or payload[0:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    global_ct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
        pos += 3 * n
    n_bytes = len(payload)
    while pos < n_bytes:
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n_bytes and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > n_bytes:
                return None
            w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            ct = global_ct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
                pos += 3 * n
            if ct is None or w == 0 or h == 0 or pos >= n_bytes:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < n_bytes and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if idx is None:
                return None
            px = np.asarray(idx, dtype=np.uint16).reshape(h, w)
            if iflags & 0x40:  # interlaced: passes at rows 0/8, 4/8, 2/4, 1/2
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                de = np.empty_like(px)
                de[np.asarray(order)] = px
                px = de
            if int(px.max()) >= len(ct):
                return None
            del sw, sh
            return ct[px]
        elif b == 0x3B:  # trailer before any image
            return None
        else:
            return None
    return None


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> "list[int] | None":
    """GIF-variant LZW: variable code width from min+1 up to 12 bits, with
    clear and end-of-information codes. Returns exactly ``n_pixels`` indices
    (or None on malformed input)."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end = clear + 1

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1, clear + 2

    table, width, next_code = reset()
    out: list[int] = []
    prev = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == end:
                return out[:n_pixels] if len(out) >= n_pixels else None
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
            elif code in table:
                entry = table[code]
                table[next_code] = prev + (entry[0],)
                next_code += 1
            elif code == next_code:  # the KwKwK case
                entry = prev + (prev[0],)
                table[next_code] = entry
                next_code += 1
            else:
                return None
            if next_code == (1 << width) and width < 12:
                width += 1
            out.extend(entry)
            prev = entry
            if len(out) >= n_pixels:
                return out[:n_pixels]
    return out[:n_pixels] if len(out) >= n_pixels else None


def decode_image_pixels(payload: bytes | None) -> "np.ndarray | None":
    """Dispatch pixel decoding on magic bytes: PNG (incl. Adam7), BMP,
    GIF, JPEG (baseline AND progressive), lossless WebP (VP8L) or
    uncompressed baseline TIFF.

    All five decode in pure Python + numpy (zlib / raw rows / LZW /
    Huffman + IDCT incl. Annex-G progressive scans, see operators/jpeg.py,
    validated against javax.imageio to ~3/255; VP8L prefix codes + LZ77 +
    spatial transforms, operators/vp8l.py, validated by encoder round
    trips + spec fixtures). When the pure-Python path cannot decode
    (arithmetic-coded JPEG, lossy VP8, or an unknown container), the
    optional PIL adapter (operators/codec_adapters.py) is tried before
    giving up — so installing Pillow closes the lossy gap with no API
    change; without it those payloads return None as before.
    """
    if payload is None:
        return None
    px = None
    if payload.startswith(_PNG_SIG):
        px = decode_png_pixels(payload)
    elif payload.startswith(b"BM"):
        px = decode_bmp_pixels(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        px = decode_gif_pixels(payload)
    elif payload.startswith(b"\xff\xd8"):
        from sat_bucket_spark.operators.jpeg import decode_jpeg_pixels

        px = decode_jpeg_pixels(payload)
    elif payload[0:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from sat_bucket_spark.operators.vp8l import decode_webp_pixels

        px = decode_webp_pixels(payload)
    elif payload[0:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        px = decode_tiff_pixels(payload)
    if px is not None:
        return px
    from sat_bucket_spark.operators.codec_adapters import pil_decode_image_pixels

    return pil_decode_image_pixels(payload)


def parse_image_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """Dispatch on magic bytes: PNG IHDR, JPEG SOF, GIF LSD, WebP, BMP or
    baseline TIFF; else None."""
    for parse in (
        parse_png_header,
        parse_jpeg_header,
        parse_gif_header,
        parse_webp_header,
        parse_bmp_header,
        parse_tiff_header,
    ):
        hdr = parse(payload)
        if hdr is not None:
            return hdr
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions/features derived from the bytes.

    Stands in for a real codec (PIL/libvips/ffmpeg are unavailable here). The
    mapping is stable: identical payloads -> identical features.
    """
    digest = hashlib.md5(payload if payload is not None else b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 3
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, channels, feature


def decode_and_featurize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode image payloads and emit (dims, feature vector) per document.

    Arrow-batched ``mapInPandas`` with a declared output schema. PNG, JPEG,
    GIF, WebP, BMP and baseline-TIFF payloads get REAL metadata extraction — pure-Python
    container parses (:func:`parse_image_header`), no codec library needed.
    Unrecognized payloads fall back to the deterministic fake (``strict=True`` raises
    ``NotImplementedError`` instead — that is the plug-in point for a pixel
    codec like PIL/libvips).

    Features: PNG (zlib + scanline unfiltering), uncompressed BMP, GIF
    (LZW), JPEG (baseline and progressive: Huffman + IDCT,
    operators/jpeg.py) and lossless-WebP (VP8L prefix codes + LZ77 +
    spatial transforms, operators/vp8l.py) payloads are ACTUALLY DECODED
    (:func:`decode_image_pixels` — pure Python + numpy, no codec library)
    and get real pixel statistics (:func:`_pixel_features`:
    mean/std/min/max of the byte values). Header-only payloads and the
    remaining formats (arithmetic JPEG, lossy VP8 — both need a real
    codec) keep the payload-derived md5 stub vector.

    Scale note: payload columns dominate partition size — upstream should set
    ``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits in
    executor memory, and this stage should run *after* any metadata-only
    filtering so undecodable/filtered payloads are never shipped.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "channels": [], "feature": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                hdr = parse_image_header(payload)
                if hdr is not None:
                    w, h, c = hdr
                    px = decode_image_pixels(payload)
                    if px is not None:
                        h, w, c = (int(d) for d in px.shape)
                        feat = _pixel_features(px)
                    else:
                        digest = hashlib.md5(payload).digest()
                        feat = [b / 255.0 for b in digest[:8]]
                elif strict:
                    raise NotImplementedError(
                        "payload is not a parseable PNG/JPEG/GIF/WebP/BMP/TIFF; other "
                        "formats require a codec library (PIL/libvips), "
                        "unavailable here"
                    )
                else:
                    w, h, c, feat = _fake_decode(payload)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # single-file inputs otherwise decode serially in one Python worker;
    # no-op when the source is already split (see ensure_parallelism)
    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        _decode, schema=IMAGE_FEATURE_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms_energy", FloatType()),
    ]
)


def parse_wav(payload: bytes | None) -> tuple[int, int, float] | None:
    """(sample_rate, n_samples, rms) from a RIFF/WAVE payload — pure parsing.

    The WAV container is public and needs no codec library: a 12-byte RIFF
    header, then word-aligned chunks of (id, size LE32, data). ``fmt `` carries
    channel count / sample rate / block align / bit depth (little-endian);
    ``data`` carries raw samples. For 16-bit PCM the RMS is computed from the
    actual samples (a REAL decode — int16 needs no library); other encodings
    report RMS as NaN for the caller to handle. Returns None for anything that
    is not a parseable WAV (reference stub contract: satbucket has no audio
    path; this is the training-pipeline extension surface).
    """
    if (
        payload is None
        or len(payload) < 12
        or payload[0:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    pos = 12
    fmt: tuple[int, int, int, int] | None = None  # (rate, channels, block, bits)
    n_samples: int | None = None
    rms: float | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if channels == 0 or rate == 0 or block == 0:
                return None
            fmt = (rate, channels, block, bits)
        elif cid == b"data" and fmt is not None:
            rate, channels, block, bits = fmt
            n_samples = len(body) // block
            if bits == 16 and n_samples > 0:
                import numpy as np

                samples = np.frombuffer(
                    body[: n_samples * block], dtype="<i2"
                ).astype("float64")
                rms = float(np.sqrt((samples**2).mean()) / 32768.0)
            else:
                rms = float("nan")
        pos += 8 + size + (size % 2)  # chunks are 2-byte aligned
    if fmt is None or n_samples is None:
        return None
    return fmt[0], n_samples, rms


def decode_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Audio decode + feature stage (sample rate, length, RMS).

    Same plumbing contract as :func:`decode_and_featurize_images`. WAV/PCM16
    payloads get a REAL decode — :func:`parse_wav` walks the RIFF chunks and
    computes RMS from the actual int16 samples — and so do FLAC payloads:
    ``operators.flac.decode_flac_samples`` reconstructs the PCM stream
    (Rice residuals + fixed/LPC predictors + stereo decorrelation, pure
    Python, RFC 9639) and RMS comes from the real samples. Lossy formats
    (mp3/ogg) are the stub boundary: ``strict=True`` raises
    ``NotImplementedError`` (the soundfile/ffmpeg plug-in point),
    otherwise a deterministic payload-derived fake keeps pipelines
    testable.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "n_samples": [], "rms_energy": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                wav = parse_wav(payload)
                flac = None
                if wav is None and payload is not None and payload[0:4] == b"fLaC":
                    from sat_bucket_spark.operators.flac import (
                        decode_flac_samples,
                    )

                    try:
                        flac = decode_flac_samples(payload)
                    except ValueError:
                        if strict:
                            raise
                        flac = None  # corrupt stream: same fallback as non-audio
                if wav is not None:
                    rate, n, rms = wav
                elif flac is not None:
                    info = parse_flac_streaminfo(payload)
                    rate, _ch, arr = flac
                    n = int(arr.shape[0])
                    bps = info[2] if info is not None else 16
                    v = arr.astype(np.float64) / float(1 << (bps - 1))
                    rms = float(np.sqrt(np.mean(v * v))) if n else 0.0
                elif strict:
                    raise NotImplementedError(
                        "payload is not a WAV or FLAC; decoding lossy audio "
                        "requires soundfile/ffmpeg, unavailable here"
                    )
                else:
                    digest = hashlib.md5(payload if payload is not None else b"").digest()
                    rate, n, rms = 16000, 1000 + digest[2] * 100, digest[3] / 255.0
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["rms_energy"].append(rms)
            yield pd.DataFrame(out)

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # single-file inputs otherwise decode serially in one Python worker;
    # no-op when the source is already split (see ensure_parallelism)
    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        _decode, schema=AUDIO_FEATURE_SCHEMA
    )


def parse_mp4(payload: bytes | None) -> tuple[str, float, int] | None:
    """(major_brand, duration_seconds, n_tracks) from an ISO-BMFF/MP4 payload.

    Pure container parsing — the box structure (u32 BE size + 4-byte type,
    ``size==1`` -> u64 largesize, ``size==0`` -> to end) is public spec and
    needs no codec: ``ftyp`` carries the major brand, ``moov/mvhd`` the
    timescale + duration (v0: u32 fields, v1: u64), and each ``moov/trak``
    is one track. Returns None for anything that is not a parseable MP4.
    """
    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    brand = payload[8:12].decode("ascii", "replace").strip()
    timescale = duration = None
    n_tracks = 0

    def boxes(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > end:
                    return
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                body = pos + 16
            elif size == 0:
                size = end - pos
            if size < 8 or pos + size > end:
                return
            yield btype, body, pos + size
            pos += size

    for btype, body, bend in boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in boxes(payload, body, bend):
            # Field reads are bounds-checked against the mvhd box's OWN end
            # (cend), not the enclosing moov: a truncated mvhd followed by a
            # sibling trak must be rejected, not read into the next box.
            if ctype == b"trak":
                n_tracks += 1
            elif ctype == b"mvhd" and cbody + 1 <= cend:
                version = payload[cbody]
                if version == 1 and cbody + 32 <= cend:
                    timescale = int.from_bytes(payload[cbody + 20 : cbody + 24], "big")
                    duration = int.from_bytes(payload[cbody + 24 : cbody + 32], "big")
                elif version == 0 and cbody + 20 <= cend:
                    timescale = int.from_bytes(payload[cbody + 12 : cbody + 16], "big")
                    duration = int.from_bytes(payload[cbody + 16 : cbody + 20], "big")
    if not timescale:
        return None
    return brand, float(duration) / float(timescale), n_tracks


VIDEO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("major_brand", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("n_tracks", LongType()),
    ]
)


def video_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Video metadata stage: REAL MP4 container parse, no codec library.

    Same stub contract as the image/audio stages: parseable MP4 payloads get
    :func:`parse_mp4` (brand, duration, track count); non-MP4 payloads raise
    under ``strict=True`` (the ffmpeg plug-in point) or fall back to a
    deterministic payload-derived fake.
    """

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "major_brand": [], "duration_s": [], "n_tracks": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                meta = parse_mp4(payload)
                if meta is not None:
                    brand, dur, n_tracks = meta
                elif strict:
                    raise NotImplementedError(
                        "payload is not an MP4; decoding other containers "
                        "requires ffmpeg, unavailable here"
                    )
                else:
                    digest = hashlib.md5(payload if payload is not None else b"").digest()
                    brand, dur, n_tracks = "fake", digest[4] / 10.0, 1 + digest[5] % 3
                out["doc_id"].append(doc_id)
                out["major_brand"].append(brand)
                out["duration_s"].append(dur)
                out["n_tracks"].append(n_tracks)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(_meta, schema=VIDEO_META_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("codec", StringType()),
    ]
)


def build_avi_bytes(
    frames: "list[bytes]",
    width: int,
    height: int,
    fps_us: int = 33333,
) -> bytes:
    """Assemble an MJPEG-in-AVI container from encoded frame payloads.

    The write-side counterpart of :func:`parse_avi_frames` (same public
    RIFF/AVI layout: ``avih`` main header + one ``00dc`` chunk per frame
    under ``LIST movi``, word-aligned chunks) — used by bench/example
    fixtures and anywhere a video corpus must be synthesized without
    ffmpeg. The suite's tests keep their own independently written
    encoder so the round trip is not self-certifying.
    """
    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cc + len(body).to_bytes(4, "little") + body + pad

    avih = (
        int(fps_us).to_bytes(4, "little") + b"\x00" * 12
        + len(frames).to_bytes(4, "little") + b"\x00" * 12
        + int(width).to_bytes(4, "little") + int(height).to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = b"hdrl" + chunk(b"avih", avih)
    movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def parse_avi_frames(
    payload: bytes | None,
) -> "tuple[dict, list[bytes]] | None":
    """(main header info, ordered frame chunk bytes) from a RIFF/AVI file.

    Pure container parsing (the RIFF/AVI layout is public): the ``avih``
    main header carries frame timing/counts/dims, and the ``LIST movi``
    section carries one ``##db``/``##dc`` chunk per frame whose body is
    the encoded frame — raw JPEG bytes for MJPEG, the historical archive
    codec this suite can actually decode (operators/jpeg.py). Returns
    None when the payload is not an AVI.
    """
    if payload is None or len(payload) < 12:
        return None
    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    info: dict = {}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST" and size >= 4:
                walk(body_start + 4, body_end)  # skip the list type fourcc
            elif cid == b"avih" and size >= 40:
                b = payload[body_start:body_end]
                us = int.from_bytes(b[0:4], "little")
                info["fps"] = round(1e6 / us, 6) if us else None
                info["total_frames"] = int.from_bytes(b[16:20], "little")
                info["width"] = int.from_bytes(b[32:36], "little")
                info["height"] = int.from_bytes(b[36:40], "little")
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc"):
                frames.append(payload[body_start:body_end])
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    if not info and not frames:
        return None
    return info, frames


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    n_frames: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame.

    The 1->N multimodal fan-out shape (``mapInPandas`` yielding more rows
    than it consumes). AVI containers get REAL frame extraction
    (:func:`parse_avi_frames`): every ``every_n``-th frame chunk is
    emitted, up to ``n_frames`` per video, with ``codec='mjpeg'`` when
    the chunk is a JPEG — those frames are directly decodable by
    ``decode_and_featurize_images`` (rename ``frame`` to ``payload`` and
    compose; the jpeg.py decoder does the pixels). Non-AVI payloads keep
    the deterministic fake (``strict=True`` raises: MP4/MKV frame
    extraction needs a real codec stack — that plug-in point).
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": [], "codec": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                parsed = parse_avi_frames(data)
                if parsed is not None:
                    _info, frames = parsed
                    for i in range(n_frames):
                        idx = i * every_n
                        if idx >= len(frames):
                            break
                        chunk = frames[idx]
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(idx)
                        rows["frame"].append(chunk)
                        rows["codec"].append(
                            "mjpeg" if chunk[:2] == b"\xff\xd8" else "raw"
                        )
                    continue
                if strict:
                    raise NotImplementedError(
                        "payload is not an AVI; MP4/MKV frame extraction "
                        "requires ffmpeg, unavailable here"
                    )
                for i in range(n_frames):
                    start = (i * every_n) % max(len(data), 1)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i * every_n)
                    rows["frame"].append(bytes(data[start : start + 16]))
                    rows["codec"].append("fake/raw")
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_sample, schema=VIDEO_FRAME_SCHEMA)


def plan_resize(
    width: int, height: int, target: int, mode: str = "fit"
) -> tuple[int, int]:
    """Target dimensions for a resize — REAL math, no pixels needed.

    ``fit``: longest side becomes ``target``, aspect preserved (the
    standard vision-model preprocessing); ``cover``: shortest side becomes
    ``target`` (crop-ready). Never upscales. Rounding is round-half-up on
    the scaled side, minimum 1 px.
    """
    if mode not in ("fit", "cover"):
        raise ValueError(f"invalid resize mode {mode!r}")
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    anchor = max(width, height) if mode == "fit" else min(width, height)
    if anchor <= target:
        return width, height
    scale = target / anchor
    return (
        max(1, int(width * scale + 0.5)),
        max(1, int(height * scale + 0.5)),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target: int,
    mode: str = "fit",
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Resize stage: parsed source dims -> planned target dims -> payload.

    The Spark-side plumbing is real (Arrow-batched ``mapInPandas``,
    declared schema, payload-sized batches) and so is the geometry:
    source dimensions come from the actual container headers
    (:func:`parse_image_header` — PNG/JPEG/GIF/WebP/BMP/TIFF) and target
    dimensions from :func:`plan_resize`. The pixel resample itself is the
    documented codec plug-in point: without PIL/libvips the output
    payload is the input payload passed through (``strict=True`` raises
    ``NotImplementedError`` instead), so downstream schema/size
    accounting is exercised end-to-end while the stub stays honest.

    Scale note: runs AFTER metadata-only filtering for the same reason as
    :func:`decode_and_featurize_images` — payloads dominate partition
    size; never ship bytes a filter would drop.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "out_width": [], "out_height": [], "payload": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                hdr = parse_image_header(payload)
                if hdr is None:
                    if strict:
                        raise NotImplementedError(
                            "payload is not a parseable "
                            "PNG/JPEG/GIF/WebP/BMP/TIFF; pixel-level decode "
                            "needs a codec library (PIL/libvips), unavailable "
                            "here"
                        )
                    continue  # unparseable payloads are dropped, like filters
                w, h, _c = hdr
                ow, oh = plan_resize(w, h, target, mode=mode)
                if strict and (ow, oh) != (w, h):
                    raise NotImplementedError(
                        "pixel resampling requires a codec library "
                        "(PIL/libvips), unavailable here — this is the "
                        "plug-in point"
                    )
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # single-file inputs otherwise decode serially in one Python worker;
    # no-op when the source is already split (see ensure_parallelism)
    return ensure_parallelism(df).mapInPandas(_resize, RESIZE_SCHEMA)


def _wav_fmt_and_data(payload: bytes) -> tuple[bytes, tuple[int, int], bytes] | None:
    """(fmt chunk body, (sample_rate, block_align), data bytes) or None."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt_body = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt_body = body
        elif cid == b"data" and fmt_body is not None:
            data = body
        pos += 8 + size + (size % 2)
    if fmt_body is None or data is None:
        return None
    rate = int.from_bytes(fmt_body[4:8], "little")
    block = int.from_bytes(fmt_body[12:14], "little")
    if rate == 0 or block == 0:
        return None
    return fmt_body, (rate, block), data


def segment_wav_payload(
    payload: bytes, seconds: float
) -> list[tuple[float, int, bytes]]:
    """Split one WAV payload into standalone WAV segments — REAL processing.

    PCM segmentation needs no codec: slice the data chunk at block-aligned
    boundaries and rebuild a minimal RIFF header (the ORIGINAL fmt chunk
    body is carried verbatim, so encoding metadata survives). Returns
    ``(start_second, n_samples, wav_bytes)`` per segment; the trailing
    partial segment is kept. Empty list for non-WAV payloads.
    """
    parsed = _wav_fmt_and_data(payload) if payload is not None else None
    if parsed is None:
        return []
    fmt_body, (rate, block), data = parsed
    seg_bytes = max(block, int(seconds * rate) * block)
    out = []
    n_total = len(data) // block * block
    for off in range(0, n_total, seg_bytes):
        chunk = data[off : off + seg_bytes]
        body = (
            b"WAVE"
            + b"fmt "
            + len(fmt_body).to_bytes(4, "little")
            + fmt_body
            + (b"\x00" if len(fmt_body) % 2 else b"")
            + b"data"
            + len(chunk).to_bytes(4, "little")
            + chunk
        )
        wav = b"RIFF" + len(body).to_bytes(4, "little") + body
        out.append((off // block / rate, len(chunk) // block, wav))
    return out


SEGMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("segment_id", LongType()),
        StructField("start_second", DoubleType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def segment_audio(
    df: DataFrame,
    seconds: float,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """1→N audio segmentation: each WAV or FLAC payload becomes per-window
    rows.

    Unlike the image pixel paths, this stage is fully REAL — RIFF/PCM
    segmentation is byte arithmetic (:func:`segment_wav_payload`), and
    every output payload is itself a valid WAV that re-parses with
    :func:`parse_wav`. 16-bit FLAC payloads are losslessly transcoded to
    PCM16 first (``operators.flac.flac_to_wav_bytes`` — a real decode,
    r6) and then segmented identically. Other payloads drop
    (``strict=True`` raises: lossy audio would need ffmpeg — that
    plug-in point again). Arrow-batched ``mapInPandas`` fan-out, same
    shape as :func:`sample_video_frames`.
    """

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "segment_id": [], "start_second": [],
                "n_samples": [], "sample_rate": [], "payload": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                if payload is not None and payload[0:4] == b"fLaC":
                    from sat_bucket_spark.operators.flac import (
                        flac_to_wav_bytes,
                    )

                    try:
                        payload = flac_to_wav_bytes(payload)
                    except ValueError:
                        # corrupt or non-16-bit FLAC: behave like any other
                        # unsegmentable payload (strict raises below)
                        if strict:
                            raise
                        payload = None
                segs = segment_wav_payload(payload, seconds)
                if not segs and strict:
                    raise NotImplementedError(
                        "payload is not RIFF/WAVE or FLAC; lossy audio "
                        "needs ffmpeg, unavailable here"
                    )
                rate = None
                if segs:
                    parsed = _wav_fmt_and_data(payload)
                    rate = parsed[1][0]
                for k, (start_s, n, wav) in enumerate(segs):
                    out["doc_id"].append(doc_id)
                    out["segment_id"].append(k)
                    out["start_second"].append(start_s)
                    out["n_samples"].append(n)
                    out["sample_rate"].append(rate)
                    out["payload"].append(wav)
            yield pd.DataFrame(out)

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # single-file inputs otherwise decode serially in one Python worker;
    # no-op when the source is already split (see ensure_parallelism)
    return ensure_parallelism(df).mapInPandas(_segment, SEGMENT_SCHEMA)


def _mp4_boxes(buf: bytes, pos: int, end: int):
    """Iterate ISO-BMFF boxes: (type, body_start, box_end)."""
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def parse_mp4_frame_times(payload: bytes | None) -> list[float] | None:
    """Per-frame presentation times (seconds) from an MP4 ``stts`` box.

    REAL container math, no codec: walk ``moov/trak/mdia``, read the media
    timescale from ``mdhd`` (v0 u32 at +12, v1 u32 at +20) and the
    time-to-sample table from ``minf/stbl/stts`` ((count, delta) run-length
    pairs), and emit the cumulative start time of every sample. The first
    track carrying both boxes wins (single-video files; callers needing
    track selection can extend). None when the payload is not an MP4 or
    has no parseable sample table — frame *timing* is metadata; only the
    pixel decode needs ffmpeg.
    """
    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    n = len(payload)
    for btype, body, bend in _mp4_boxes(payload, 0, n):
        if btype != b"moov":
            continue
        for ttype, tbody, tend in _mp4_boxes(payload, body, bend):
            if ttype != b"trak":
                continue
            timescale = None
            deltas: list[tuple[int, int]] | None = None
            for mtype, mbody, mend in _mp4_boxes(payload, tbody, tend):
                if mtype != b"mdia":
                    continue
                for ctype, cbody, cend in _mp4_boxes(payload, mbody, mend):
                    if ctype == b"mdhd" and cbody + 1 <= cend:
                        v = payload[cbody]
                        off = cbody + (20 if v == 1 else 12)
                        if off + 4 <= cend:
                            timescale = int.from_bytes(
                                payload[off : off + 4], "big"
                            )
                    elif ctype == b"minf":
                        for stype, sbody, send in _mp4_boxes(payload, cbody, cend):
                            if stype != b"stbl":
                                continue
                            for xtype, xbody, xend in _mp4_boxes(
                                payload, sbody, send
                            ):
                                if xtype != b"stts" or xbody + 8 > xend:
                                    continue
                                n_entries = int.from_bytes(
                                    payload[xbody + 4 : xbody + 8], "big"
                                )
                                pairs = []
                                p = xbody + 8
                                for _ in range(n_entries):
                                    if p + 8 > xend:
                                        pairs = None
                                        break
                                    pairs.append(
                                        (
                                            int.from_bytes(payload[p : p + 4], "big"),
                                            int.from_bytes(
                                                payload[p + 4 : p + 8], "big"
                                            ),
                                        )
                                    )
                                    p += 8
                                deltas = pairs
            if timescale and deltas:
                times = []
                t = 0
                for count, delta in deltas:
                    for _ in range(count):
                        times.append(t / timescale)
                        t += delta
                return times
    return None


def select_frames_at_rate(times: list[float], fps: float) -> list[int]:
    """Frame indices sampling ``times`` at ``fps`` — the extraction plan.

    For each target tick ``k / fps`` pick the last frame at-or-before it
    (presentation order; no frame chosen twice). With real ``stts`` timing
    this yields the exact frames an ffmpeg ``fps=`` filter would decode —
    the plan is real even while the pixel extraction is the stub.
    """
    import bisect

    if fps <= 0:
        raise ValueError("fps must be positive")
    if not times:
        return []
    out: list[int] = []
    last = None
    k = 0
    t_end = times[-1]
    while True:
        tick = k / fps
        if k > 0 and tick > t_end:
            break
        i = bisect.bisect_right(times, tick) - 1
        if i >= 0 and i != last:
            out.append(i)
            last = i
        k += 1
    return out


def parse_exif_orientation(payload: bytes | None) -> int | None:
    """EXIF Orientation (1-8) from a JPEG's APP1 segment — pure parsing.

    Public formats (JPEG/JFIF + EXIF 2.x): walk the JPEG marker segments to
    APP1 (0xFFE1) carrying the ``Exif\\0\\0`` identifier, then read the
    embedded TIFF structure's IFD0 for tag 0x0112 (Orientation, SHORT).
    Returns ``None`` when no EXIF/orientation is present (equivalent to the
    default orientation 1) or the payload is not a JPEG. Phone cameras
    store sensor-native pixels and record the display transform here — a
    training pipeline that ignores it feeds sideways images to the model.
    """
    if payload is None or len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    app1 = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        # 0xFF fill/padding bytes before a marker are legal (JPEG B.1.1.2):
        # the marker code is the first non-0xFF byte after the run
        m = pos + 1
        while m < len(payload) and payload[m] == 0xFF:
            m += 1
        if m + 1 > len(payload):
            return None
        marker = payload[m]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos = m + 1
            continue
        if marker == 0xDA:  # start of scan: no more metadata segments
            break
        if m + 3 > len(payload):
            return None
        seg_len = int.from_bytes(payload[m + 1 : m + 3], "big")
        if seg_len < 2:
            return None
        if marker == 0xE1 and payload[m + 3 : m + 9] == b"Exif\x00\x00":
            app1 = payload[m + 9 : m + 1 + seg_len]
            break
        pos = m + 1 + seg_len
    if app1 is None or len(app1) < 8:
        return None
    if app1[0:4] == b"II\x2a\x00":
        order = "little"
    elif app1[0:4] == b"MM\x00\x2a":
        order = "big"
    else:
        return None
    ifd = int.from_bytes(app1[4:8], order)
    if ifd + 2 > len(app1):
        return None
    n = int.from_bytes(app1[ifd : ifd + 2], order)
    for i in range(n):
        e = ifd + 2 + 12 * i
        if e + 12 > len(app1):
            return None
        tag = int.from_bytes(app1[e : e + 2], order)
        if tag == 0x0112:
            val = int.from_bytes(app1[e + 8 : e + 10], order)
            return val if 1 <= val <= 8 else None
    return None


# EXIF orientation -> (clockwise rotation degrees, mirror horizontally first)
_EXIF_TRANSFORMS = {
    1: (0, False), 2: (0, True), 3: (180, False), 4: (180, True),
    5: (90, True), 6: (90, False), 7: (270, True), 8: (270, False),
}


def exif_normalization_plan(orientation: int | None) -> tuple[int, bool]:
    """(clockwise rotation degrees, mirror-horizontal-first) that maps
    stored pixels to display orientation. Unknown/absent -> identity."""
    return _EXIF_TRANSFORMS.get(orientation or 1, (0, False))


def exif_orientation_table(
    df: "DataFrame",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> "DataFrame":
    """Per-image EXIF orientation + display-normalization plan.

    ``(id, orientation, rotate_cw, mirror)`` — orientation is the raw EXIF
    tag 0x0112 value (NULL when absent/not a JPEG), rotate_cw/mirror the
    transform that maps stored pixels to display orientation (identity for
    absent EXIF — the pipeline decision ``exif_normalization_plan``
    encodes). Arrow-batched ``mapInPandas`` over the payload column: the
    JPEG marker walk is not SQL-expressible, everything else row-local —
    map-only, no shuffle, the multimodal scale shape. The id dtype is
    derived from the input schema (ints and strings both pass through).
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("orientation", T.IntegerType(), True),
            T.StructField("rotate_cw", T.IntegerType(), True),
            T.StructField("mirror", T.BooleanType(), True),
        ]
    )

    def _meta(batches):
        import pandas as _pd

        for pdf in batches:
            orient = [
                parse_exif_orientation(None if p is None else bytes(p))
                for p in pdf[payload_col]
            ]
            plans = [exif_normalization_plan(o) for o in orient]
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "orientation": _pd.array(orient, dtype="Int32"),
                    "rotate_cw": _pd.array([r for r, _ in plans], dtype="Int32"),
                    "mirror": [m for _, m in plans],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_meta, schema=schema)


def parse_flac_streaminfo(
    payload: bytes | None,
) -> tuple[int, int, int, int, float] | None:
    """(sample_rate, channels, bits_per_sample, n_samples, duration_s)
    from a FLAC STREAMINFO block — pure parsing, no decode.

    Public format: ``fLaC`` magic, then metadata blocks (1-byte
    last+type, 3-byte big-endian length); STREAMINFO is type 0, 34 bytes:
    after 2+2 block sizes and 3+3 frame sizes comes a packed 64-bit field
    of 20-bit sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit total
    samples.
    """
    if payload is None or len(payload) < 4 + 4 + 34 or payload[0:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if len(body) < 18:
                return None
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            n_samples = packed & ((1 << 36) - 1)
            if sample_rate == 0:
                return None
            return (
                sample_rate,
                channels,
                bps,
                n_samples,
                round(n_samples / sample_rate, 6),
            )
        if hdr & 0x80:  # last-metadata-block and not STREAMINFO: malformed
            return None
        pos += 4 + blen
    return None


# MPEG audio tables (public: ISO/IEC 11172-3 / 13818-3)
_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def parse_mp3_frame(
    payload: bytes | None,
) -> tuple[int, int, int, float] | None:
    """(bitrate_kbps, sample_rate, channels, est_duration_s) from the first
    MPEG Layer III frame header — pure parsing, no decode.

    Skips an ID3v2 tag (syncsafe length) if present, then locates the
    11-bit frame sync and reads the version/bitrate/samplerate/channel
    fields from the public tables. Duration is the CBR estimate
    ``audio_bytes * 8 / bitrate`` — exact for constant-bitrate files, an
    estimate for VBR (the honest common case without a full frame walk).
    """
    if payload is None or len(payload) < 10:
        return None
    pos = 0
    if payload[0:3] == b"ID3":
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    end = min(len(payload) - 4, pos + 4096)
    while pos <= end:
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
            version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (b1 >> 1) & 0x3  # 1 == Layer III
            if version == 1 or layer != 1:
                pos += 1
                continue
            br_idx = (b2 >> 4) & 0xF
            sr_idx = (b2 >> 2) & 0x3
            if br_idx in (0, 15) or sr_idx == 3:
                pos += 1
                continue
            table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
            bitrate = table[br_idx]
            sample_rate = _MP3_RATES[version][sr_idx]
            channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
            audio_bytes = len(payload) - pos
            return (
                bitrate,
                sample_rate,
                channels,
                round(audio_bytes * 8 / (bitrate * 1000), 6),
            )
        pos += 1
    return None
