"""WebP-lossless (VP8L) pixel decoding — pure Python + numpy, no codec lib.

Implements the public WebP Lossless Bitstream Specification (RFC 9649 /
Google's `webp-lossless-bitstream-spec`): LSB-first bit reading, canonical
prefix (Huffman) codes with the simple/complex code-length encodings, the
code-length code (symbols 16/17/18 run-length forms, the optional
max-symbol cap), meta prefix images, the color cache, LZ77 backward
references with the 120-entry 2D distance mapping, and all four transforms
(predictor with its 14 modes, cross-color, subtract-green, color-indexing
with sub-byte pixel bundling), inverse-applied in reverse bitstream order.

VP8L completes the repo's honest-decoder suite (PNG/BMP/GIF in
multimodal.py, baseline+progressive JPEG in jpeg.py): it is the one
remaining image format decodable from a public spec with stdlib-only
tools — no DCT, no arithmetic coding, just prefix codes and integer
spatial transforms. Lossy VP8 (DCT + boolean arithmetic coder) remains a
documented codec plug-in point.

Validation: the container has no reference WebP decoder (javax.imageio
and PIL both lack it), so tests validate by (a) a test-side VP8L
*encoder* round trip over random images — literal codes, simple codes,
color cache, LZ77, palette bundling, subtract-green — and (b)
hand-computed fixtures for the predictor and cross-color transforms
derived independently from the spec pseudo-code (tests/test_vp8l.py).

Scale shape: called from Arrow-batched ``mapInPandas`` stages only
(multimodal.decode_and_featurize_images); pure per-row work, no shuffle.
"""

from __future__ import annotations

__all__ = ["decode_vp8l_pixels", "decode_webp_pixels"]

# Order in which code-length code lengths are transmitted (spec §6.2.2).
CODE_LENGTH_CODE_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)

# 2D offset table for distance codes 1..120 (spec §6.2.3): (dx, dy) with
# dx in [-8, 7], dy in [0, 7], ordered by increasing euclidean-ish rank.
DISTANCE_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_CACHE_MULT = 0x1E35A7BD  # color-cache hash multiplier (spec §5.2)


class _Truncated(ValueError):
    pass


class BitReader:
    """LSB-first bit reader over bytes (spec §4)."""

    def __init__(self, data: bytes):
        self._data = data
        self._nbits = 8 * len(data)
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > self._nbits:
            raise _Truncated("bitstream truncated")
        v = 0
        pos = self.pos
        data = self._data
        for i in range(n):
            p = pos + i
            v |= ((data[p >> 3] >> (p & 7)) & 1) << i
        self.pos = pos + n
        return v

    def read_bit(self) -> int:
        if self.pos >= self._nbits:
            raise _Truncated("bitstream truncated")
        b = (self._data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class PrefixCode:
    """Canonical prefix code: decode one symbol by walking bits MSB-first.

    Built from per-symbol code lengths exactly as DEFLATE/VP8L canonical
    codes assign them (shorter codes first, ties by symbol order). A code
    with a single used symbol decodes it with ZERO bits read (spec: the
    degenerate one-symbol tree).
    """

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self._single = used[0][1]
            self._table = None
            return
        self._single = None
        used.sort()
        table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = used[0][0]
        for ln, sym in used:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        if code != (1 << prev_len):
            raise ValueError("prefix code lengths violate Kraft equality")
        self._table = table
        self._max_len = prev_len

    def decode(self, br: BitReader) -> int:
        if self._single is not None:
            return self._single
        code = 0
        length = 0
        table = self._table
        while True:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > self._max_len:
                raise ValueError("invalid prefix code in bitstream")


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    """One prefix code: the simple (1-2 symbol) or full code-length form."""
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        first_8bits = br.read_bit()
        lengths = [0] * alphabet_size
        sym0 = br.read(8 if first_8bits else 1)
        if sym0 >= alphabet_size:
            raise ValueError("simple-code symbol out of alphabet")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise ValueError("invalid simple-code symbol pair")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # degenerate: decoded with 0 bits
        return PrefixCode(lengths)

    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * len(CODE_LENGTH_CODE_ORDER)
    for i in range(num_code_lengths):
        cl_lengths[CODE_LENGTH_CODE_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)

    if br.read_bit():  # explicit max-symbol cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # spec: initial previous nonzero code length
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        elif cl == 16:
            repeat = 3 + br.read(2)
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("code-length repeat overruns alphabet")
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    if symbol > alphabet_size:
        raise ValueError("code-length repeat overruns alphabet")
    return PrefixCode(lengths)


def _lz77_value(code: int, br: BitReader) -> int:
    """Length/distance prefix value (spec §6.2.3): 1-based."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


class _CodeGroup:
    __slots__ = ("green", "red", "blue", "alpha", "distance")

    def __init__(self, br: BitReader, cache_size: int):
        self.green = _read_prefix_code(br, 256 + 24 + cache_size)
        self.red = _read_prefix_code(br, 256)
        self.blue = _read_prefix_code(br, 256)
        self.alpha = _read_prefix_code(br, 256)
        self.distance = _read_prefix_code(br, 40)


def _decode_image_stream(
    br: BitReader, width: int, height: int, is_level0: bool
) -> list[int]:
    """Decode one entropy-coded ARGB image (spec §6) to a flat row-major
    list of 0xAARRGGBB ints. Transforms are the caller's business."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta: list[int] | None = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = _subsample(width, meta_bits)
        mh = _subsample(height, meta_bits)
        meta_px = _decode_image_stream(br, mw, mh, False)
        # meta prefix index lives in (red << 8) | green of the tile pixel
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]
        num_groups = max(meta) + 1

    groups = [_CodeGroup(br, cache_size) for _ in range(num_groups)]

    n = width * height
    pixels: list[int] = [0] * n
    pos = 0
    group = groups[0]
    meta_w = _subsample(width, meta_bits) if meta is not None else 0
    while pos < n:
        if meta is not None:
            x = pos % width
            y = pos // width
            group = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        sym = group.green.decode(br)
        if sym < 256:  # literal: G then R, B, A from their own codes
            red = group.red.decode(br)
            blue = group.blue.decode(br)
            alpha = group.alpha.decode(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            pixels[pos] = px
            pos += 1
            if cache_size:
                cache[((_CACHE_MULT * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif sym < 280:  # LZ77 backward reference
            length = _lz77_value(sym - 256, br)
            dist_code = _lz77_value(group.distance.decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DISTANCE_MAP[dist_code - 1]
                dist = dy * width + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of bounds")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache_size:
                    cache[
                        ((_CACHE_MULT * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
        else:  # color-cache hit
            idx = sym - 280
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            px = cache[idx]
            pixels[pos] = px
            pos += 1
    return pixels


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------- transforms


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, topleft: int) -> int:
    p_l = 0
    p_t = 0
    for shift in (24, 16, 8, 0):
        lc = (left >> shift) & 0xFF
        tc = (top >> shift) & 0xFF
        tlc = (topleft >> shift) & 0xFF
        pc = lc + tc - tlc
        p_l += abs(pc - lc)
        p_t += abs(pc - tc)
    return left if p_l < p_t else top


def _clamp_add_subtract_full(a: int, b: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= _clamp(
            ((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) - ((c >> shift) & 0xFF)
        ) << shift
    return out


def _clamp_add_subtract_half(ave: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        d = a - ((c >> shift) & 0xFF)
        # C-truncating /2 (spec pseudo-code uses int division toward zero)
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << shift
    return out


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _clamp_add_subtract_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_subtract_half(_avg2(left, top), topleft)
    raise ValueError(f"invalid predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    return (
        ((((residual >> 24) + (pred >> 24)) & 0xFF) << 24)
        | ((((residual >> 16) + (pred >> 16)) & 0xFF) << 16)
        | ((((residual >> 8) + (pred >> 8)) & 0xFF) << 8)
        | (((residual + pred) & 0xFF))
    )


def _inverse_predictor(
    pixels: list[int], width: int, height: int, bits: int, tiles: list[int]
) -> None:
    """In-place inverse predictor transform (spec §5.1).

    Border rules: (0,0) predicts 0xff000000; rest of the top row predicts
    L; the left column predicts T; the TR pixel of the rightmost column is
    the LEFTMOST pixel of the SAME row (spec's explicit exception).
    """
    tiles_w = _subsample(width, bits)
    for y in range(height):
        row = y * width
        for x in range(width):
            pos = row + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[pos - 1]
            elif x == 0:
                pred = pixels[pos - width]
            else:
                mode = (tiles[(y >> bits) * tiles_w + (x >> bits)] >> 8) & 0xFF
                left = pixels[pos - 1]
                top = pixels[pos - width]
                topleft = pixels[pos - width - 1]
                topright = (
                    pixels[row] if x == width - 1 else pixels[pos - width + 1]
                )
                pred = _predict(mode, left, top, topleft, topright)
            pixels[pos] = _add_pixels(pixels[pos], pred)


def _s8(v: int) -> int:
    return v - 256 if v > 127 else v


def _color_delta(t: int, c: int) -> int:
    # (int8(t) * int8(c)) >> 5 with arithmetic shift (Python >> floors,
    # matching C arithmetic shift on negatives)
    return (_s8(t) * _s8(c)) >> 5


def _inverse_color_transform(
    pixels: list[int], width: int, height: int, bits: int, tiles: list[int]
) -> None:
    """In-place inverse cross-color transform (spec §5.2): per tile, the
    element pixel carries green_to_red (blue channel), green_to_blue
    (green channel), red_to_blue (red channel)."""
    tiles_w = _subsample(width, bits)
    for y in range(height):
        for x in range(width):
            pos = y * width + x
            cte = tiles[(y >> bits) * tiles_w + (x >> bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            px = pixels[pos]
            green = (px >> 8) & 0xFF
            red = (px >> 16) & 0xFF
            blue = px & 0xFF
            red = (red + _color_delta(g2r, green)) & 0xFF
            blue = (blue + _color_delta(g2b, green) + _color_delta(r2b, red)) & 0xFF
            pixels[pos] = (px & 0xFF00FF00) | (red << 16) | blue


def _inverse_subtract_green(pixels: list[int]) -> None:
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _inverse_color_indexing(
    packed: list[int],
    width: int,
    height: int,
    palette: list[int],
    width_bits: int,
) -> list[int]:
    """Expand packed palette indices to ARGB (spec §5.3). Indices live in
    the GREEN channel; with width_bits > 0 several sub-byte indices bundle
    into one coded pixel, LSB-first. Out-of-range indices decode to
    0x00000000 (the spec's defined behavior, not an error)."""
    if width_bits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette) else 0
            for p in packed
        ]
    packed_w = _subsample(width, width_bits)
    bits_per = 8 >> width_bits
    mask = (1 << bits_per) - 1
    xmask = (1 << width_bits) - 1
    out = [0] * (width * height)
    for y in range(height):
        for x in range(width):
            g = (packed[y * packed_w + (x >> width_bits)] >> 8) & 0xFF
            idx = (g >> ((x & xmask) * bits_per)) & mask
            out[y * width + x] = palette[idx] if idx < len(palette) else 0
    return out


# ----------------------------------------------------------------- top level


def decode_vp8l_pixels(stream: bytes) -> "object":
    """Decode a raw VP8L stream (the VP8L chunk payload) to an (H, W, C)
    uint8 array — C=3 when alpha is uniformly 255, else 4. Raises
    ValueError on malformed input; the multimodal dispatcher catches and
    falls back per its strict/fake contract."""
    import numpy as np

    br = BitReader(stream)
    try:
        if br.read(8) != 0x2F:
            raise ValueError("bad VP8L signature")
        width = br.read(14) + 1
        height = br.read(14) + 1
        br.read(1)  # alpha-is-used hint (informative)
        if br.read(3) != 0:
            raise ValueError("unsupported VP8L version")
        if width * height > (1 << 26):
            # documented decoder cap (~64M px = a 256 MB RGBA array):
            # protects executors from corrupted/adversarial dimension
            # fields pre-allocating gigabytes — curation inputs that large
            # should be metadata-filtered before any pixel stage anyway
            raise ValueError(
                f"{width}x{height} exceeds this decoder's 2^26-pixel cap"
            )

        transforms: list[tuple] = []
        seen: set[int] = set()
        cur_w = width
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError(f"transform {ttype} repeated")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                tw = _subsample(cur_w, bits)
                th = _subsample(height, bits)
                tiles = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, cur_w, bits, tiles))
            elif ttype == 2:  # subtract-green
                transforms.append((2, cur_w, None, None))
            else:  # 3: color indexing
                palette_size = br.read(8) + 1
                deltas = _decode_image_stream(br, palette_size, 1, False)
                palette: list[int] = []
                prev = 0
                for d in deltas:  # entries are componentwise delta-coded
                    prev = _add_pixels(d, prev)
                    palette.append(prev)
                wbits = _palette_width_bits(palette_size)
                transforms.append((3, cur_w, wbits, palette))
                cur_w = _subsample(cur_w, wbits)

        pixels = _decode_image_stream(br, cur_w, height, True)
    except _Truncated as e:
        raise ValueError(str(e)) from e

    for ttype, t_width, arg, data in reversed(transforms):
        if ttype == 0:
            _inverse_predictor(pixels, t_width, height, arg, data)
        elif ttype == 1:
            _inverse_color_transform(pixels, t_width, height, arg, data)
        elif ttype == 2:
            _inverse_subtract_green(pixels)
        else:
            pixels = _inverse_color_indexing(pixels, t_width, height, data, arg)

    arr = np.asarray(pixels, dtype=np.uint32).reshape(height, width)
    rgba = np.empty((height, width, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    if bool((rgba[..., 3] == 255).all()):
        return np.ascontiguousarray(rgba[..., :3])
    return rgba


def decode_webp_pixels(payload: bytes | None) -> "object | None":
    """Decode a lossless WebP container (RIFF/WEBP with a VP8L chunk,
    directly or inside a VP8X extended container) to an (H, W, C) uint8
    array. Lossy VP8 returns None — the documented codec plug-in point
    (DCT + boolean arithmetic coder)."""
    if payload is None or len(payload) < 20:
        return None
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L" and len(body) == size:
            try:
                return decode_vp8l_pixels(body)
            except ValueError:
                return None
        # VP8X is a header chunk: keep walking to the image chunk.
        # Chunks are 2-byte aligned (RIFF padding).
        pos += 8 + size + (size & 1)
    return None
