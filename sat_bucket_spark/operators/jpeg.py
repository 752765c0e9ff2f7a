"""JPEG (ITU-T T.81) decode — baseline AND progressive — plus a fixture
encoder, in pure Python + numpy.

Closes the JPEG side of the multimodal pixel-decode story without a codec
library: sequential baseline (SOF0/SOF1) and progressive (SOF2, spectral
selection + successive approximation — the two dominant web encodings)
decode to real pixels here: Huffman entropy decode, dequantization, 8x8
inverse DCT, triangular chroma upsampling, YCbCr->RGB. Arithmetic-coded,
hierarchical and lossless JPEGs return ``None`` (the remaining plug-in
point for libjpeg-class decoders).

Everything here is from the public JPEG specification (ITU-T T.81 /
ISO 10918-1): the canonical Huffman code construction of Annex C, the
decoder procedures of F.2 (DECODE / RECEIVE / EXTEND), the progressive
procedures of Annex G (EOB runs, AC refinement correction bits), and the
"typical" Huffman + quantization tables of Annex K (fixture encoder).

The encoder exists so tests can build spec-compliant baseline JPEGs
without any third-party library; decoder correctness is additionally
checked against an INDEPENDENT reference decoder — ``javax.imageio`` in
the session JVM — with full-image agreement at max ~3/255 (IDCT rounding)
on both baseline and progressive real-world files (tests/test_jpeg.py),
so encoder/decoder bugs cannot cancel out.

Scale note: this decode is per-payload Python — intended to run inside
the Arrow-batched ``mapInPandas`` stage of operators/multimodal.py where
a native codec would otherwise sit. Throughput-critical deployments
should swap in libjpeg bindings at that exact seam; the Spark-side
plumbing (schema, batching, partition sizing) is identical.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg_pixels", "encode_jpeg_baseline"]

# Zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# 8-point DCT-II basis (T.81 A.3.3): A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# ---------------------------------------------------------------------------
# Annex K "typical" tables (public spec constants)
# ---------------------------------------------------------------------------

# K.1 luminance quantization (row-major)
STD_QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

# K.2 chrominance quantization
STD_QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# K.3 DC luminance: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
# K.4 DC chrominance
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
# K.5 AC luminance
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
# K.6 AC chrominance
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


# ---------------------------------------------------------------------------
# Canonical Huffman (T.81 Annex C)
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], huffval: list[int]) -> list[tuple[int, int, int]]:
    """(symbol, code, length) triples per the Annex C code assignment:
    codes of each length are consecutive, starting from twice the previous
    length's end."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((huffval[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the bit-serial decoder."""
    return {(ln, code): sym for sym, code, ln in _canonical_codes(bits, huffval)}


def _encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) lookup for the encoder."""
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, huffval)}


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg_pixels(payload: bytes | None) -> "np.ndarray | None":
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to uint8
    pixels.

    Returns ``(h, w, 1)`` for grayscale or ``(h, w, 3)`` RGB (JFIF YCbCr
    transform, triangular chroma upsampling); ``None`` for anything this
    pure-Python path does not cover (arithmetic coding, hierarchical,
    lossless, malformed streams).
    """
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode(payload)
    except (ValueError, EOFError, IndexError, KeyError, struct.error):
        return None


def _decode(data: bytes) -> "np.ndarray | None":
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    restart_interval = 0

    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                q = np.zeros((8, 8), dtype=np.int32)
                q[_ZZ_ROWS, _ZZ_COLS] = vals
                quant[tq] = q
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            precision = seg[0]
            if precision != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            comps = []
            for i in range(nf):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * i]))
            frame = (h, w, comps)
            if marker == 0xC2:
                # Progressive: scans interleave with DHT redefinitions, so a
                # dedicated loop owns the rest of the stream (T.81 Annex G).
                return _decode_progressive(
                    data, pos + seg_len, frame, quant, huff_dc, huff_ac,
                    restart_interval,
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                table = _decode_table(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                tda = seg[2 + 2 * i]
                scan_comps.append((cs, tda >> 4, tda & 15))
            scan_start = pos + seg_len
            return _decode_scan(
                data, scan_start, frame, scan_comps, quant, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    return None


def _destuff(data: bytes, start: int) -> bytes:
    """Strip byte stuffing (FF 00 -> FF) and restart markers from the
    entropy-coded segment; stops at the next real marker."""
    out = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            if i + 1 < n:
                nxt = data[i + 1]
                if nxt == 0x00:
                    out.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:  # RSTn ends this entropy segment
                    break
                break  # real marker: end of scan
            break
        out.append(b)
        i += 1
    return bytes(out)


def _decode_scan(data, start, frame, scan_comps, quant, huff_dc, huff_ac, ri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    by_id = {c[0]: c for c in comps}
    planes = {}
    for cid, hi, vi, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64)

    # Restart-interval handling: split the raw entropy bytes at RST markers,
    # each segment de-stuffed independently, DC predictors reset per segment.
    segments = []
    i = start
    seg_start = start
    n = len(data)
    while i < n - 1:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(_destuff(data, seg_start))
                i += 2
                seg_start = i
                continue
            break
        i += 1
    segments.append(_destuff(data, seg_start))

    reader = _BitReader(segments[0])
    seg_idx = 0
    pred = {cid: 0 for cid, _td, _ta in scan_comps}
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                seg_idx += 1
                if seg_idx < len(segments):
                    reader = _BitReader(segments[seg_idx])
                pred = {cid: 0 for cid in pred}
            for cs, td, ta in scan_comps:
                _cid, hi, vi, tq = by_id[cs]
                qt = quant[tq]
                for v in range(vi):
                    for hh in range(hi):
                        block = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], qt, pred, cs
                        )
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hh) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    return _assemble_image(planes, frame)


def _tri_upsample_axis(p: "np.ndarray", axis: int) -> "np.ndarray":
    """2x triangular ("fancy") upsampling along one axis — libjpeg's
    centered filter: out[2i] = (3 p[i] + p[i-1]) / 4, out[2i+1] =
    (3 p[i] + p[i+1]) / 4, edges replicated. Against javax.imageio as an
    independent reference this brings full-image agreement to max diff
    ~3/255 (pure IDCT rounding); plain nearest leaves chroma-edge diffs
    of ~25/255."""
    p = np.asarray(p, dtype=np.float64)
    prev = np.roll(p, 1, axis=axis)
    nxt = np.roll(p, -1, axis=axis)
    sl = [slice(None)] * p.ndim
    sl[axis] = 0
    prev[tuple(sl)] = p[tuple(sl)]
    sl[axis] = -1
    nxt[tuple(sl)] = p[tuple(sl)]
    a = (3.0 * p + prev) / 4.0
    b = (3.0 * p + nxt) / 4.0
    out = np.stack([a, b], axis=axis + 1)
    shape = list(p.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def _upsample(p: "np.ndarray", fy: int, fx: int) -> "np.ndarray":
    """Chroma upsampling: triangular for power-of-2 factors (the JFIF
    norm: 4:2:0 / 4:2:2), nearest replication for anything exotic."""
    while fy > 1 and fy % 2 == 0:
        p = _tri_upsample_axis(p, 0)
        fy //= 2
    while fx > 1 and fx % 2 == 0:
        p = _tri_upsample_axis(p, 1)
        fx //= 2
    if fy > 1 or fx > 1:
        p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
    return p


def _assemble_image(planes: dict, frame) -> "np.ndarray | None":
    """Spatial component planes -> uint8 pixels: triangular chroma
    upsampling, crop, level shift, JFIF YCbCr->RGB."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        if hi < hmax or vi < vmax:
            p = _upsample(p, vmax // vi, hmax // hi)
        full.append(p[:h, :w])

    if len(full) == 1:
        out = np.clip(np.round(full[0] + 128.0), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(full) == 3:
        y = full[0] + 128.0
        cb = full[1]
        cr = full[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return None


def _decode_block(reader, dc_table, ac_table, qt, pred, cid) -> "np.ndarray":
    zz = np.zeros(64, dtype=np.int32)
    t = _decode_symbol(reader, dc_table)
    diff = _extend(reader.receive(t), t)
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_symbol(reader, ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.receive(s), s)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    coef[_ZZ_ROWS, _ZZ_COLS] = zz * qt[_ZZ_ROWS, _ZZ_COLS]
    # inverse DCT: X = A^T S A  (A orthonormal)
    return _A.T @ coef @ _A


# ---------------------------------------------------------------------------
# Progressive decoder (T.81 Annex G: spectral selection + successive
# approximation, Huffman entropy coding)
# ---------------------------------------------------------------------------


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuffed entropy segments of one scan (split at RSTn) and the
    position of the next marker."""
    segments = []
    i = start
    seg_start = start
    n = len(data)
    while i < n - 1:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(_destuff(data, seg_start))
                i += 2
                seg_start = i
                continue
            break
        i += 1
    else:
        i = n
    segments.append(_destuff(data, seg_start))
    return segments, i


class _ScanState:
    """Entropy reader + restart bookkeeping for one scan."""

    def __init__(self, segments: list[bytes], ri: int, n_scan_comps: int):
        self.segments = segments
        self.ri = ri
        self.idx = 0
        self.reader = _BitReader(segments[0])
        self.pred: dict[int, int] = {}
        self.eobrun = 0
        self.units = 0

    def unit_boundary(self) -> None:
        """Call after each MCU/block unit: advance past a restart point."""
        self.units += 1
        if self.ri and self.units % self.ri == 0:
            self.idx += 1
            if self.idx < len(self.segments):
                self.reader = _BitReader(self.segments[self.idx])
            self.pred = {}
            self.eobrun = 0


def _dc_block(st: _ScanState, table: dict, cid: int, coef, ah: int, al: int) -> None:
    if ah == 0:  # first DC scan: DPCM at Al precision
        t = _decode_symbol(st.reader, table)
        diff = _extend(st.reader.receive(t), t)
        st.pred[cid] = st.pred.get(cid, 0) + diff
        coef[0] = st.pred[cid] << al
    else:  # refinement: one bit per block
        if st.reader.read_bit():
            coef[0] |= 1 << al


def _ac_first_block(st: _ScanState, table: dict, coef, ss: int, se: int, al: int) -> None:
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_symbol(st.reader, table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            st.eobrun = (1 << r) - 1
            if r:
                st.eobrun += st.reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        coef[k] = _extend(st.reader.receive(s), s) << al
        k += 1


def _ac_refine_block(st: _ScanState, table: dict, coef, ss: int, se: int, al: int) -> None:
    """T.81 G.2.2 successive-approximation AC refinement."""
    p1 = 1 << al
    m1 = -p1

    def correct(k: int) -> None:
        c = int(coef[k])
        if st.reader.read_bit() and (c & p1) == 0:
            coef[k] = c + (p1 if c >= 0 else m1)

    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = _decode_symbol(st.reader, table)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn: current block finishes in the tail below
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += st.reader.receive(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan with magnitude > 1")
                val = p1 if st.reader.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[k] = val
            k += 1
    if st.eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        st.eobrun -= 1


def _decode_progressive(data, pos, frame, quant, huff_dc, huff_ac, ri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    # Coefficients in ZIGZAG order (index = spectral position), MCU-padded.
    coefs = {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        for cid, hi, vi, _tq in comps
    }
    # Per-component block grid for NON-interleaved scans (not MCU-padded):
    # ceil(ceil(dim * sampling / max_sampling) / 8), T.81 A.1.1.
    def _cd(a: int, b: int) -> int:
        return -(-a // b)

    comp_blocks = {
        cid: (_cd(_cd(h * vi, vmax), 8), _cd(_cd(w * hi, hmax), 8))
        for cid, hi, vi, _tq in comps
    }

    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xC4:  # DHT: tables legitimately change between scans
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, huffval)
                p += 17 + n
        elif marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                q = np.zeros((8, 8), dtype=np.int32)
                q[_ZZ_ROWS, _ZZ_COLS] = vals
                quant[tq] = q
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            segments, pos = _entropy_segments(data, pos + seg_len)
            st = _ScanState(segments, ri, ns)
            if ss == 0:  # DC scan (interleaved allowed)
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                if ns > 1:
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            for cs, td, _ta in scan_comps:
                                _cid, hi, vi, _tq = by_id[cs]
                                for v in range(vi):
                                    for hh in range(hi):
                                        _dc_block(
                                            st, huff_dc[td], cs,
                                            coefs[cs][my * vi + v, mx * hi + hh],
                                            ah, al,
                                        )
                            st.unit_boundary()
                else:
                    cs, td, _ta = scan_comps[0]
                    bh, bw = comp_blocks[cs]
                    for by in range(bh):
                        for bx in range(bw):
                            _dc_block(st, huff_dc[td], cs, coefs[cs][by, bx], ah, al)
                            st.unit_boundary()
            else:  # AC scan: non-interleaved only (T.81 G.1.1.1.1)
                if ns != 1:
                    raise ValueError("interleaved AC progressive scan")
                cs, _td, ta = scan_comps[0]
                bh, bw = comp_blocks[cs]
                table = huff_ac[ta]
                fn = _ac_first_block if ah == 0 else _ac_refine_block
                for by in range(bh):
                    for bx in range(bw):
                        fn(st, table, coefs[cs][by, bx], ss, se, al)
                        st.unit_boundary()
            continue  # pos already advanced past entropy data
        pos += seg_len

    # Reconstruct: dequant (zigzag), un-zigzag, IDCT per block, assemble.
    planes = {}
    for cid, hi, vi, tq in comps:
        qt_zz = quant[tq][_ZZ_ROWS, _ZZ_COLS]
        c = coefs[cid] * qt_zz[None, None, :]
        blocks = np.zeros((c.shape[0], c.shape[1], 8, 8))
        blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = c
        spat = np.einsum("ux,ijuv,vy->ijxy", _A, blocks, _A)
        planes[cid] = spat.transpose(0, 2, 1, 3).reshape(
            c.shape[0] * 8, c.shape[1] * 8
        )
    return _assemble_image(planes, frame)


# ---------------------------------------------------------------------------
# Fixture encoder (baseline, 4:4:4 or grayscale, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for DC diff / AC value encoding."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bw, block, qt, pred, dc_tbl, ac_tbl) -> int:
    coef = _A @ block @ _A.T  # forward DCT (A orthonormal)
    q = np.round(coef / qt).astype(np.int32)
    zz = q[_ZZ_ROWS, _ZZ_COLS]
    diff = int(zz[0]) - pred
    s, bits = _magnitude(diff)
    code, ln = dc_tbl[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i] != 0), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(int(zz[k]))
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    return b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tq]) + zz


def _dht_segment(tc: int, th: int, bits: list[int], huffval: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_baseline(
    pixels: "np.ndarray",
    quant_luma: "np.ndarray | None" = None,
    quant_chroma: "np.ndarray | None" = None,
) -> bytes:
    """Encode uint8 pixels as a sequential baseline JPEG (4:4:4 / grayscale).

    ``pixels``: ``(h, w)`` or ``(h, w, 1)`` grayscale, or ``(h, w, 3)`` RGB.
    Quant tables default to the Annex K typical tables; pass
    ``np.ones((8, 8))`` for near-lossless fixtures (DCT rounding only).
    Built for test fixtures: correctness over speed, no subsampling, no
    restart markers.
    """
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError(f"expected 1 or 3 channels, got {nc}")
    ql = (quant_luma if quant_luma is not None else STD_QUANT_LUMA).astype(np.int32)
    qc = (quant_chroma if quant_chroma is not None else STD_QUANT_CHROMA).astype(np.int32)

    if nc == 3:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        qts = [ql, qc, qc]
        dc_tbls = [_encode_table(*_DC_LUMA), _encode_table(*_DC_CHROMA), _encode_table(*_DC_CHROMA)]
        ac_tbls = [_encode_table(*_AC_LUMA), _encode_table(*_AC_CHROMA), _encode_table(*_AC_CHROMA)]
    else:
        planes = [px[:, :, 0].astype(np.float64) - 128.0]
        qts = [ql]
        dc_tbls = [_encode_table(*_DC_LUMA)]
        ac_tbls = [_encode_table(*_AC_LUMA)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, ql)
    if nc == 3:
        out += _dqt_segment(1, qc)
    # SOF0
    comps = b"".join(
        bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(nc)
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc) + comps
    # DHT
    out += _dht_segment(0, 0, *_DC_LUMA)
    out += _dht_segment(1, 0, *_AC_LUMA)
    if nc == 3:
        out += _dht_segment(0, 1, *_DC_CHROMA)
        out += _dht_segment(1, 1, *_AC_CHROMA)
    # SOS
    scomps = b"".join(bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(nc))
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc) + scomps + b"\x00\x3f\x00"

    bw = _BitWriter()
    blocks_y = -(-h // 8)
    blocks_x = -(-w // 8)
    preds = [0] * nc
    for by in range(blocks_y):
        for bx in range(blocks_x):
            for ci in range(nc):
                p = planes[ci]
                block = np.zeros((8, 8))
                ys, xs = by * 8, bx * 8
                tile = p[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                # edge replication per T.81 recommendation
                block[: tile.shape[0], : tile.shape[1]] = tile
                if tile.shape[0] < 8:
                    block[tile.shape[0] :, : tile.shape[1]] = tile[-1:, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1] :] = block[:, tile.shape[1] - 1 : tile.shape[1]]
                preds[ci] = _encode_block(
                    bw, block, qts[ci], preds[ci], dc_tbls[ci], ac_tbls[ci]
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
