"""VP8L (WebP-lossless) decoder validation.

No reference WebP decoder exists in this container (javax.imageio and PIL
both lack WebP), so validation is two-pronged:

1. A test-side VP8L *encoder* (below) produces spec-conformant streams —
   literal prefix codes, simple codes, subtract-green, palette bundling,
   predictor and cross-color transforms — and round trips must reproduce
   the source pixels exactly (lossless means exactly).
2. Hand-built bitstreams exercise the parts an encoder round trip could
   mask: the color cache, LZ77 backward references (near-distance map and
   the >120 direct form), and hand-computed predictor/cross-color
   fixtures derived independently from the spec's pseudo-code.
"""

from __future__ import annotations

import numpy as np
import pytest

from sat_bucket_spark.operators.vp8l import (
    decode_vp8l_pixels,
    decode_webp_pixels,
)

# ------------------------------------------------------------ test encoder


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """A canonical prefix code: bits MSB-first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def write_full_byte_code(w: BitWriter) -> None:
    """A prefix code giving symbols 0..255 length 8 (canonical code == the
    symbol value): complex form, code-length code = the single symbol '8'
    (a zero-bit code), max-symbol cap 256."""
    w.write(0, 1)  # not simple
    w.write(12 - 4, 4)  # num_code_lengths = 12 covers order index of '8'
    # order = 17,18,0,1,2,3,4,5,16,6,7,8 -> only the last (symbol 8) nonzero
    for i in range(11):
        w.write(0, 3)
    w.write(1, 3)
    w.write(1, 1)  # use max-symbol cap
    w.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    w.write(254, 8)  # max_symbol = 2 + 254 = 256
    # 256 zero-bit '8' symbols follow implicitly


def write_simple_code(w: BitWriter, symbols: list[int]) -> None:
    assert 1 <= len(symbols) <= 2
    w.write(1, 1)
    w.write(len(symbols) - 1, 1)
    w.write(1, 1)  # first symbol in 8 bits
    w.write(symbols[0], 8)
    if len(symbols) == 2:
        w.write(symbols[1], 8)


def simple_code_bit(symbols: list[int], s: int) -> int:
    """Canonical assignment: the smaller symbol VALUE takes code 0."""
    return 0 if s == min(symbols) else 1


def write_literal_image(w: BitWriter, argb: list[int]) -> None:
    """One entropy-coded image, all pixels literal: full 8-bit G/R/B codes,
    alpha via a simple code over its distinct values (<=2), distance
    unused (simple 1-symbol code)."""
    alphas = sorted({(p >> 24) & 0xFF for p in argb})
    assert len(alphas) <= 2, "test encoder: at most two distinct alphas"
    w.write(0, 1)  # no color cache
    # NOTE: caller writes the meta-prefix bit for level-0 images
    write_full_byte_code(w)  # green (alphabet 280, lengths only on 0..255)
    write_full_byte_code(w)  # red
    write_full_byte_code(w)  # blue
    write_simple_code(w, alphas)  # alpha
    write_simple_code(w, [0])  # distance (never used)
    for p in argb:
        g = (p >> 8) & 0xFF
        r = (p >> 16) & 0xFF
        b = p & 0xFF
        a = (p >> 24) & 0xFF
        w.write_code(g, 8)
        w.write_code(r, 8)
        w.write_code(b, 8)
        if len(alphas) == 2:
            w.write(simple_code_bit(alphas, a), 1)


def encode_vp8l(
    argb: list[int],
    width: int,
    height: int,
    transform_writers=(),
) -> bytes:
    """A minimal spec-conformant VP8L stream: header, optional transforms
    (each writer emits its signaling AND returns the transformed pixel
    list), then the all-literal main image."""
    w = BitWriter()
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version
    data = list(argb)
    cur_w = width
    for tw in transform_writers:
        data, cur_w = tw(w, data, cur_w, height)
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no meta prefix image (level 0)
    write_literal_image(w, data)
    return w.tobytes()


def wrap_webp(vp8l: bytes, extended: bool = False) -> bytes:
    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    chunks = b""
    if extended:
        chunks += chunk(b"VP8X", bytes(10))
    chunks += chunk(b"VP8L", vp8l)
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + chunks


def rng_image(w: int, h: int, seed: int, alpha: int = 255) -> list[int]:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h * w, 3), dtype=np.int64)
    return [
        (alpha << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b in px
    ]


def to_argb_array(pixels: list[int], w: int, h: int) -> np.ndarray:
    arr = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF
    out[..., 1] = (arr >> 8) & 0xFF
    out[..., 2] = arr & 0xFF
    out[..., 3] = (arr >> 24) & 0xFF
    return out


def assert_decodes_to(stream: bytes, pixels: list[int], w: int, h: int):
    got = decode_vp8l_pixels(stream)
    want = to_argb_array(pixels, w, h)
    if got.shape[2] == 3:
        assert (want[..., 3] == 255).all()
        want = want[..., :3]
    np.testing.assert_array_equal(got, want)


# ------------------------------------------------------------------- tests


class TestLiteralRoundTrip:
    @pytest.mark.parametrize("w,h,seed", [(1, 1, 0), (7, 3, 1), (16, 16, 2), (33, 5, 3)])
    def test_rgb_images(self, w, h, seed):
        px = rng_image(w, h, seed)
        assert_decodes_to(encode_vp8l(px, w, h), px, w, h)

    def test_alpha_image_returns_rgba(self):
        px = rng_image(4, 4, 7, alpha=128)
        got = decode_vp8l_pixels(encode_vp8l(px, 4, 4))
        assert got.shape == (4, 4, 4)
        assert (got[..., 3] == 128).all()

    def test_two_alpha_values(self):
        px = rng_image(4, 2, 9)
        px = [
            (p & 0x00FFFFFF) | ((0x80 if i % 2 else 0xFF) << 24)
            for i, p in enumerate(px)
        ]
        assert_decodes_to(encode_vp8l(px, 4, 2), px, 4, 2)


class TestSubtractGreen:
    def test_round_trip(self):
        w, h = 9, 4
        px = rng_image(w, h, 11)

        def tr(bw, data, cur_w, height):
            bw.write(1, 1)
            bw.write(2, 2)  # SUBTRACT_GREEN
            out = []
            for p in data:
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) - g) & 0xFF
                b = ((p & 0xFF) - g) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            return out, cur_w

        assert_decodes_to(encode_vp8l(px, w, h, [tr]), px, w, h)


class TestColorIndexing:
    @pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 200])
    def test_palette_sizes_and_bundling(self, n_colors):
        w, h = 13, 6  # 13 not divisible by any bundle width: edge pixels
        rng = np.random.default_rng(n_colors)
        palette = sorted(
            {
                0xFF000000
                | (int(c[0]) << 16) | (int(c[1]) << 8) | int(c[2])
                for c in rng.integers(0, 256, size=(n_colors, 3))
            }
        )
        n = len(palette)
        idx = rng.integers(0, n, size=h * w)
        px = [palette[i] for i in idx]

        if n <= 2:
            width_bits = 3
        elif n <= 4:
            width_bits = 2
        elif n <= 16:
            width_bits = 1
        else:
            width_bits = 0

        def tr(bw, data, cur_w, height):
            bw.write(1, 1)
            bw.write(3, 2)  # COLOR_INDEXING
            bw.write(n - 1, 8)
            deltas, prev = [], 0
            for e in palette:
                d = 0
                for shift in (24, 16, 8, 0):
                    d |= (((e >> shift) - (prev >> shift)) & 0xFF) << shift
                deltas.append(d)
                prev = e
            write_literal_image(bw, deltas)  # palette stream (1-row image)
            if width_bits == 0:
                return [0xFF000000 | (i << 8) for i in idx], cur_w
            packed_w = (cur_w + (1 << width_bits) - 1) >> width_bits
            bits_per = 8 >> width_bits
            packed = []
            for y in range(height):
                for bx in range(packed_w):
                    g = 0
                    for k in range(1 << width_bits):
                        x = (bx << width_bits) + k
                        if x < cur_w:
                            g |= int(idx[y * cur_w + x]) << (k * bits_per)
                    packed.append(0xFF000000 | (g << 8))
            return packed, packed_w

        assert_decodes_to(encode_vp8l(px, w, h, [tr]), px, w, h)


def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _spec_predict(mode, L, T, TL, TR):
    """Independent re-derivation of the 14 predictor modes from the spec
    pseudo-code, over (a, r, g, b) tuples."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        p = tuple(l + t - tl for l, t, tl in zip(L, T, TL))
        pl = sum(abs(pc - lc) for pc, lc in zip(p, L))
        pt = sum(abs(pc - tc) for pc, tc in zip(p, T))
        return L if pl < pt else T
    if mode == 12:
        return tuple(
            min(255, max(0, l + t - tl)) for l, t, tl in zip(L, T, TL)
        )
    if mode == 13:
        ave = _avg2(L, T)
        out = []
        for a, c in zip(ave, TL):
            d = a - c
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(min(255, max(0, a + half)))
        return tuple(out)
    raise AssertionError(mode)


def _unpack(p):
    return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)


def _pack(t):
    return (t[0] << 24) | (t[1] << 16) | (t[2] << 8) | t[3]


class TestPredictorTransform:
    @pytest.mark.parametrize("mode", range(14))
    def test_every_mode_round_trips(self, mode):
        """Forward-predict with the spec pseudo-code re-derivation, decode
        with the library inverse: exact reproduction for all 14 modes,
        including the rightmost-column TR exception (w=5 with tile bits
        covering the image; pixels hit the x==w-1 wrap)."""
        w, h = 5, 4
        px = rng_image(w, h, 100 + mode)

        def residuals(pixels):
            out = []
            for y in range(h):
                for x in range(w):
                    pos = y * w + x
                    if x == 0 and y == 0:
                        pred = (255, 0, 0, 0)
                    elif y == 0:
                        pred = _unpack(pixels[pos - 1])
                    elif x == 0:
                        pred = _unpack(pixels[pos - w])
                    else:
                        L = _unpack(pixels[pos - 1])
                        T = _unpack(pixels[pos - w])
                        TL = _unpack(pixels[pos - w - 1])
                        TR = _unpack(
                            pixels[y * w] if x == w - 1 else pixels[pos - w + 1]
                        )
                        pred = _spec_predict(mode, L, T, TL, TR)
                    orig = _unpack(pixels[pos])
                    out.append(
                        _pack(tuple((o - p) & 0xFF for o, p in zip(orig, pred)))
                    )
            return out

        def tr(bw, data, cur_w, height):
            bw.write(1, 1)
            bw.write(0, 2)  # PREDICTOR
            bw.write(7, 3)  # size_bits = 9: one 512x512 tile
            write_literal_image(bw, [0xFF000000 | (mode << 8)])
            return residuals(data), cur_w

        assert_decodes_to(encode_vp8l(px, w, h, [tr]), px, w, h)

    def test_mode2_hand_fixture(self):
        """2x2, all tiles mode 2 (T): hand-computed from the border rules.
        Stream pixels are residuals; expected decode computed by hand:
        (0,0)+black, (1,0)+left, (0,1)+top, (1,1)+top."""
        res = [
            _pack((255, 10, 20, 30)),   # + ff000000 -> (254,10,20,30)
            _pack((0, 1, 1, 1)),        # + left     -> (254,11,21,31)
            _pack((0, 2, 2, 2)),        # + top      -> (254,12,22,32)
            _pack((0, 5, 5, 5)),        # + top(=11,21,31 a254) -> (254,16,26,36)
        ]
        want = [
            _pack((254, 10, 20, 30)),
            _pack((254, 11, 21, 31)),
            _pack((254, 12, 22, 32)),
            _pack((254, 16, 26, 36)),
        ]

        def tr(bw, data, cur_w, height):
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(7, 3)
            write_literal_image(bw, [0xFF000000 | (2 << 8)])
            return data, cur_w

        assert_decodes_to(encode_vp8l(res, 2, 2, [tr]), want, 2, 2)


class TestColorTransform:
    @pytest.mark.parametrize("g2r,g2b,r2b", [(0, 0, 0), (16, 240, 8), (255, 1, 128)])
    def test_round_trips(self, g2r, g2b, r2b):
        w, h = 6, 3
        px = rng_image(w, h, 55)

        def s8(v):
            return v - 256 if v > 127 else v

        def delta(t, c):
            return (s8(t) * s8(c)) >> 5

        def tr(bw, data, cur_w, height):
            bw.write(1, 1)
            bw.write(1, 2)  # COLOR (cross-color)
            bw.write(7, 3)  # one tile
            cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            write_literal_image(bw, [cte])
            out = []
            for p in data:  # forward = inverse of the decoder's inverse
                g = (p >> 8) & 0xFF
                r_final = (p >> 16) & 0xFF
                b_final = p & 0xFF
                r = (r_final - delta(g2r, g)) & 0xFF
                b = (b_final - delta(g2b, g) - delta(r2b, r_final)) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            return out, cur_w

        assert_decodes_to(encode_vp8l(px, w, h, [tr]), px, w, h)


def write_complex_code(w, length, symbols, alphabet_size):
    """Emit a complex-form prefix code where every symbol in `symbols` has
    code length `length` and the rest 0, using a code-length code over
    {0, 17, length} and the max-symbol cap to stop exactly on time."""
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    w.write(0, 1)  # not simple
    need = max(order.index(0), order.index(17), order.index(length)) + 1
    assert need >= 4
    w.write(need - 4, 4)
    cl_len = {17: 1, 0: 2, length: 2}
    for i in range(need):
        w.write(cl_len.get(order[i], 0), 3)
    # canonical over lengths {17:1, 0:2, length:2}: 17->0, 0->'10', L->'11'
    ops = []   # (kind, value): kind 'code' = (code,bits) MSB-first, 'raw'
    reads = 0
    pos = 0
    for s in sorted(symbols):
        gap = s - pos
        while gap:
            if gap < 3:
                ops.append(("code", (2, 2)))  # literal zero
                reads += 1
                gap -= 1
            else:
                step = min(10, gap)
                if gap - step in (1, 2):
                    step -= 3 - (gap - step)
                ops.append(("code", (0, 1)))  # cl symbol 17
                ops.append(("raw", (step - 3, 3)))
                reads += 1
                gap -= step
        ops.append(("code", (3, 2)))  # cl symbol `length`
        reads += 1
        pos = s + 1
    assert reads >= 2
    w.write(1, 1)  # use max-symbol cap
    x = reads - 2
    k = 0
    while x >= (1 << (2 + 2 * k)):
        k += 1
    w.write(k, 3)
    w.write(x, 2 + 2 * k)
    for kind, (v, n) in ops:
        if kind == "code":
            w.write_code(v, n)
        else:
            w.write(v, n)


class TestLZ77AndCache:
    def test_backward_reference_near_distance(self):
        """4x1: one literal then copy length 3 at distance 1 via the
        near-distance map (distance prefix value 2 -> map entry (1,0))."""
        w = BitWriter()
        w.write(0x2F, 8)
        w.write(3, 14)   # width 4
        w.write(0, 14)   # height 1
        w.write(0, 1)
        w.write(0, 3)
        w.write(0, 1)    # no transforms
        w.write(0, 1)    # no color cache
        w.write(0, 1)    # no meta image
        # green: symbols {42, 258} both length 1 (258 = len code 2 -> 3px)
        write_complex_code(w, 1, [42, 258], 280)
        write_simple_code(w, [7])    # red
        write_simple_code(w, [9])    # blue
        write_simple_code(w, [255])  # alpha
        write_simple_code(w, [1])    # distance: 0-bit symbol 1 -> value 2
        # canonical green: 42 -> 0, 258 -> 1
        w.write_code(0, 1)  # literal g=42 (red/blue/alpha are 0-bit)
        w.write_code(1, 1)  # length 3; distance symbol reads 0 bits
        px = 0xFF000000 | (7 << 16) | (42 << 8) | 9
        assert_decodes_to(w.tobytes(), [px] * 4, 4, 1)

    def test_direct_distance_and_color_cache(self):
        """2x3: literals, a color-cache hit, and >120 direct-distance
        copies (code 123 -> distance 3)."""
        cache_bits = 4
        p1 = 0xFF000000 | (1 << 16) | (2 << 8) | 3
        p2 = 0xFF000000 | (9 << 16) | (8 << 8) | 7
        idx1 = ((0x1E35A7BD * p1) & 0xFFFFFFFF) >> (32 - cache_bits)
        cache_sym = 280 + idx1
        w = BitWriter()
        w.write(0x2F, 8)
        w.write(1, 14)   # width 2
        w.write(2, 14)   # height 3
        w.write(0, 1)
        w.write(0, 3)
        w.write(0, 1)    # no transforms
        w.write(1, 1)    # color cache on
        w.write(cache_bits, 4)
        w.write(0, 1)    # no meta image
        syms = sorted({2, 8, 256, cache_sym})
        write_complex_code(w, 2, syms, 256 + 24 + (1 << cache_bits))
        gcode = {s: i for i, s in enumerate(syms)}  # canonical, all len 2
        write_simple_code(w, [1, 9])   # red
        write_simple_code(w, [3, 7])   # blue
        write_simple_code(w, [255])    # alpha
        write_simple_code(w, [13])     # distance prefix symbol 13 (0 bits)

        def lit(p):
            w.write_code(gcode[(p >> 8) & 0xFF], 2)
            w.write(simple_code_bit([1, 9], (p >> 16) & 0xFF), 1)
            w.write(simple_code_bit([3, 7], p & 0xFF), 1)

        lit(p1)                    # (0,0)
        lit(p2)                    # (1,0)
        w.write_code(gcode[cache_sym], 2)  # (0,1): cache hit of p1
        # (1,1): len 1 (green 256), distance symbol 13 -> extra 5 bits:
        # offset (2+1)<<5 = 96; 96 + 26 + 1 = 123 -> direct dist 3 -> p1
        w.write_code(gcode[256], 2)
        w.write(26, 5)
        # (0,2): same copy shape -> pos 4 - 3 = 1 -> p2
        w.write_code(gcode[256], 2)
        w.write(26, 5)
        lit(p2)                    # (1,2)
        want = [p1, p2, p1, p1, p2, p2]
        assert_decodes_to(w.tobytes(), want, 2, 3)


class TestContainerAndErrors:
    def test_riff_and_vp8x_containers(self):
        px = rng_image(3, 2, 21)
        stream = encode_vp8l(px, 3, 2)
        for extended in (False, True):
            got = decode_webp_pixels(wrap_webp(stream, extended=extended))
            np.testing.assert_array_equal(got, to_argb_array(px, 3, 2)[..., :3])

    def test_lossy_vp8_returns_none(self):
        body = b"\x00" * 20
        payload = (
            b"RIFF" + (4 + 8 + len(body)).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + len(body).to_bytes(4, "little") + body
        )
        assert decode_webp_pixels(payload) is None

    def test_truncated_stream_raises_and_dispatcher_swallows(self):
        px = rng_image(4, 4, 33)
        stream = encode_vp8l(px, 4, 4)
        with pytest.raises(ValueError):
            decode_vp8l_pixels(stream[: len(stream) // 2])
        assert decode_webp_pixels(wrap_webp(stream[: len(stream) // 2])) is None

    def test_garbage_returns_none(self):
        assert decode_webp_pixels(b"not a webp") is None
        assert decode_webp_pixels(None) is None


class TestDispatchIntegration:
    def test_decode_image_pixels_routes_webp(self):
        from sat_bucket_spark.operators.multimodal import decode_image_pixels

        px = rng_image(5, 4, 77)
        got = decode_image_pixels(wrap_webp(encode_vp8l(px, 5, 4)))
        np.testing.assert_array_equal(got, to_argb_array(px, 5, 4)[..., :3])

    def test_featurize_real_webp_stats(self, spark):
        from sat_bucket_spark.operators.multimodal import (
            decode_and_featurize_images,
        )

        px = rng_image(6, 6, 88)
        payload = wrap_webp(encode_vp8l(px, 6, 6))
        df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
        row = decode_and_featurize_images(df, strict=True).collect()[0]
        assert (row["width"], row["height"], row["channels"]) == (6, 6, 3)
        v = to_argb_array(px, 6, 6)[..., :3].astype(np.int64).ravel()
        m = v.sum() / v.size
        assert row["feature"][0] == pytest.approx(m / 255, abs=1e-6)


class TestMetaPrefixGroups:
    def test_two_huffman_groups_selected_by_tile(self):
        """8x2 with meta_bits=2 (4x4 tiles -> a 2x1 meta image): the left
        tile's group uses full byte codes, the right tile's green is a
        0-bit simple code — picking the wrong group misaligns the stream,
        so exact reproduction proves per-tile group selection."""
        w_img, h_img = 8, 2
        left = rng_image(4, 2, 41)
        rng = np.random.default_rng(42)
        right = [
            0xFF000000 | (int(r) << 16) | (200 << 8) | int(b)
            for r, b in rng.integers(0, 256, size=(8, 2))
        ]
        px = []
        for y in range(2):
            px += left[y * 4:(y + 1) * 4] + right[y * 4:(y + 1) * 4]
        w = BitWriter()
        w.write(0x2F, 8)
        w.write(w_img - 1, 14)
        w.write(h_img - 1, 14)
        w.write(0, 1)
        w.write(0, 3)
        w.write(0, 1)  # no transforms
        w.write(0, 1)  # no color cache
        w.write(1, 1)  # meta prefix image present
        w.write(0, 3)  # meta_bits = 2
        # 2x1 meta image; group index in (red << 8) | green
        write_literal_image(w, [0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)])
        # group 0 (left tile): full byte codes
        write_full_byte_code(w)
        write_full_byte_code(w)
        write_full_byte_code(w)
        write_simple_code(w, [255])
        write_simple_code(w, [0])
        # group 1 (right tile): 0-bit green, full red/blue
        write_simple_code(w, [200])
        write_full_byte_code(w)
        write_full_byte_code(w)
        write_simple_code(w, [255])
        write_simple_code(w, [0])
        for i, p in enumerate(px):
            x = i % w_img
            g = (p >> 8) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            if x < 4:
                w.write_code(g, 8)
            w.write_code(r, 8)
            w.write_code(b, 8)
        assert_decodes_to(w.tobytes(), px, w_img, h_img)


class TestCorruptionRobustness:
    def test_random_mutations_never_crash(self):
        """Arbitrary byte corruption of a valid stream must yield a clean
        ValueError or a successfully decoded array — never an unhandled
        IndexError/KeyError or a hang. (The dispatcher turns ValueError
        into None.)"""
        rng = np.random.default_rng(99)
        px = rng_image(9, 7, 99)
        base = bytearray(encode_vp8l(px, 9, 7))
        for trial in range(300):
            data = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                out = decode_vp8l_pixels(bytes(data))
                assert out.ndim == 3
            except ValueError:
                pass

    def test_random_truncations_never_crash(self):
        px = rng_image(6, 6, 101)
        base = encode_vp8l(px, 6, 6)
        for cut in range(len(base)):
            try:
                decode_vp8l_pixels(base[:cut])
            except ValueError:
                pass

    def test_huge_declared_dimensions_rejected(self):
        """A corrupt 14-bit dimension field must not pre-allocate
        gigabytes: the documented 2^26-pixel cap raises first."""
        w = BitWriter()
        w.write(0x2F, 8)
        w.write(16383, 14)  # width 16384
        w.write(16383, 14)  # height 16384
        w.write(0, 1)
        w.write(0, 3)
        with pytest.raises(ValueError, match="pixel cap"):
            decode_vp8l_pixels(w.tobytes() + b"\x00" * 64)


class TestPropertyRoundTrips:
    def test_hypothesis_literal_and_transform_round_trips(self):
        """Property: any small RGB image round-trips exactly through any
        composition of the encoder's transform writers."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            w=st.integers(1, 12),
            h=st.integers(1, 10),
            seed=st.integers(0, 10_000),
            subtract_green=st.booleans(),
        )
        def check(w, h, seed, subtract_green):
            px = rng_image(w, h, seed)
            tws = []
            if subtract_green:
                def tr(bw, data, cur_w, height):
                    bw.write(1, 1)
                    bw.write(2, 2)
                    out = []
                    for p in data:
                        g = (p >> 8) & 0xFF
                        r = (((p >> 16) & 0xFF) - g) & 0xFF
                        b = ((p & 0xFF) - g) & 0xFF
                        out.append((p & 0xFF00FF00) | (r << 16) | b)
                    return out, cur_w
                tws.append(tr)
            assert_decodes_to(encode_vp8l(px, w, h, tws), px, w, h)

        check()
