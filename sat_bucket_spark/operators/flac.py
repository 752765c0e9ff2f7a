"""FLAC audio frame decoding — pure Python + numpy, no codec library.

Implements the public FLAC format (RFC 9639) far enough to reconstruct the
actual PCM samples: MSB-first bit reading, frame headers (block size /
sample rate / channel assignment / sample size codes, the UTF-8-style
coded frame number, CRC-8 verification), all four subframe types
(CONSTANT, VERBATIM, FIXED orders 0-4, LPC with quantized coefficients
and arithmetic-shift reconstruction), Rice-coded residual partitions
(both 4- and 5-bit parameter widths, escape-to-raw partitions), wasted
bits, and the three stereo decorrelation modes (left/side, right/side,
mid/side).

FLAC is lossless — no DCT, no entropy tables beyond Rice codes — which is
exactly why it is decodable from the spec with stdlib-only tools, the
same honesty bar as the suite's PNG/GIF/JPEG/VP8L decoders. Lossy codecs
(MP3/AAC/Vorbis) remain documented plug-in points.

Validation mirrors operators/vp8l.py: no FLAC decoder exists in this
container (javax.sound and PIL-class libs lack it), so tests round-trip a
test-side FLAC *encoder* (verbatim, constant, fixed-predictor + Rice
residuals, every stereo mode, wasted bits) and hand-computed fixtures
derived from the spec pseudo-code (tests/test_flac.py).

Scale shape: called from Arrow-batched ``mapInPandas`` stages only
(multimodal.decode_audio_features routes ``fLaC`` payloads here); pure
per-row work, no shuffle.
"""

from __future__ import annotations

__all__ = ["decode_flac_samples", "flac_to_wav_bytes"]

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


class _Truncated(ValueError):
    pass


class MSBBitReader:
    """MSB-first bit reader (FLAC's bit order, opposite of VP8L's)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self._data = data
        self._nbits = 8 * len(data)
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if self.pos + n > self._nbits:
            raise _Truncated("FLAC bitstream truncated")
        v = 0
        data = self._data
        pos = self.pos
        for i in range(n):
            p = pos + i
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
        self.pos = pos + n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the terminating 1."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _read_coded_number(br: MSBBitReader) -> int:
    """The frame header's UTF-8-style coded frame/sample number (RFC 9639
    §9.1.5: UTF-8 extended to 7-byte / 36-bit values)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise ValueError("invalid coded number in FLAC frame header")
    value = first & (mask - 1)
    for _ in range(n_extra):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid coded-number continuation byte")
        value = (value << 6) | (b & 0x3F)
    return value


def _read_residual(
    br: MSBBitReader, block_size: int, order: int
) -> list[int]:
    """Rice-coded residual section (RFC 9639 §9.2.7)."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("partition count does not divide block size")
    out: list[int] = []
    for part in range(n_parts):
        count = block_size >> part_order
        if part == 0:
            count -= order
            if count < 0:
                raise ValueError("predictor order exceeds first partition")
        param = br.read(param_bits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                out.extend([0] * count)
            else:
                for _ in range(count):
                    out.append(br.read_signed(raw_bits))
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | br.read(param) if param else q
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _read_subframe(
    br: MSBBitReader, block_size: int, bps: int
) -> list[int]:
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if bps <= 0:
        raise ValueError("wasted bits consume the whole sample")

    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        if order > block_size:
            raise ValueError("predictor order exceeds block size")
        samples = [br.read_signed(bps) for _ in range(order)]
        residual = _read_residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        for r in residual:
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[-1 - j]
            samples.append(pred + r)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        if order > block_size:
            raise ValueError("predictor order exceeds block size")
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        residual = _read_residual(br, block_size, order)
        for r in residual:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[-1 - j]
            samples.append((acc >> shift) + r)  # arithmetic shift
    else:
        raise ValueError(f"reserved subframe type {stype}")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_samples(payload: bytes | None):
    """Decode a FLAC stream to ``(sample_rate, channels, samples)`` where
    ``samples`` is an (n, channels) int32 numpy array of the actual PCM
    values, or None if the payload is not FLAC. Raises ValueError on a
    corrupt stream (bad CRC-8, reserved codes, truncation) — callers
    decide strict-vs-fallback.
    """
    import numpy as np

    from sat_bucket_spark.operators.multimodal import parse_flac_streaminfo

    if payload is None or payload[0:4] != b"fLaC":
        return None
    info = parse_flac_streaminfo(payload)
    if info is None:
        raise ValueError("FLAC without a valid STREAMINFO block")
    sr_default, ch_default, bps_default, total_samples, _dur = info

    # skip metadata blocks to the first frame
    pos = 4
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        pos += 4 + blen
        if hdr & 0x80:
            break

    br = MSBBitReader(payload, pos * 8)
    channels_out: list[list[int]] = []
    decoded = 0
    try:
        while decoded < total_samples or (total_samples == 0 and br.pos < 8 * len(payload) - 16):
            header_start = br.pos >> 3
            sync = br.read(14)
            if sync != 0b11111111111110:
                raise ValueError("lost FLAC frame sync")
            if br.read(1) != 0:
                raise ValueError("reserved frame-header bit set")
            br.read(1)  # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ch_code = br.read(4)
            ss_code = br.read(3)
            if br.read(1) != 0:
                raise ValueError("reserved frame-header bit set")
            _read_coded_number(br)
            if bs_code == 0:
                raise ValueError("reserved block-size code 0")
            elif bs_code == 6:
                block_size = br.read(8) + 1
            elif bs_code == 7:
                block_size = br.read(16) + 1
            else:
                block_size = _BLOCK_SIZES[bs_code]
            if sr_code == 0:
                sample_rate = sr_default
            elif sr_code == 12:
                sample_rate = br.read(8) * 1000
            elif sr_code == 13:
                sample_rate = br.read(16)
            elif sr_code == 14:
                sample_rate = br.read(16) * 10
            elif sr_code == 15:
                raise ValueError("invalid sample-rate code 15")
            else:
                sample_rate = _SAMPLE_RATES[sr_code]
            if ss_code == 0:
                bps = bps_default
            elif ss_code == 3:
                raise ValueError("reserved sample-size code 3")
            else:
                bps = _SAMPLE_SIZES[ss_code]
            # CRC-8 covers the header bytes up to (not incl.) the CRC byte
            crc_end = br.pos >> 3
            stored_crc = br.read(8)
            if _crc8(payload[header_start:crc_end]) != stored_crc:
                raise ValueError("FLAC frame header CRC-8 mismatch")

            if ch_code <= 7:
                n_ch = ch_code + 1
                subs = [
                    _read_subframe(br, block_size, bps) for _ in range(n_ch)
                ]
            elif ch_code in (8, 9, 10):
                n_ch = 2
                # the side channel carries one extra bit
                if ch_code == 8:  # left/side
                    left = _read_subframe(br, block_size, bps)
                    side = _read_subframe(br, block_size, bps + 1)
                    subs = [left, [l - s for l, s in zip(left, side)]]
                elif ch_code == 9:  # right/side
                    side = _read_subframe(br, block_size, bps + 1)
                    right = _read_subframe(br, block_size, bps)
                    subs = [[r + s for r, s in zip(right, side)], right]
                else:  # mid/side
                    mid = _read_subframe(br, block_size, bps)
                    side = _read_subframe(br, block_size, bps + 1)
                    subs = [[], []]
                    for m, s in zip(mid, side):
                        m = (m << 1) | (s & 1)
                        subs[0].append((m + s) >> 1)
                        subs[1].append((m - s) >> 1)
            else:
                raise ValueError(f"reserved channel assignment {ch_code}")

            br.align()
            frame_end = br.pos >> 3
            stored_crc16 = br.read(16)
            if _crc16(payload[header_start:frame_end]) != stored_crc16:
                raise ValueError("FLAC frame CRC-16 mismatch")

            if not channels_out:
                channels_out = [[] for _ in range(n_ch)]
            elif len(channels_out) != n_ch:
                raise ValueError("channel count changed mid-stream")
            for ch, samples in zip(channels_out, subs):
                ch.extend(samples)
            decoded += block_size
            if total_samples and decoded >= total_samples:
                break
    except _Truncated as e:
        raise ValueError(str(e)) from e

    if total_samples:
        channels_out = [ch[:total_samples] for ch in channels_out]
    n_ch = len(channels_out) or ch_default
    arr = (
        np.array(channels_out, dtype=np.int64).T.astype(np.int32)
        if channels_out
        else np.empty((0, n_ch), dtype=np.int32)
    )
    return sample_rate if channels_out else sr_default, n_ch, arr


def flac_to_wav_bytes(payload: bytes | None) -> bytes | None:
    """Losslessly transcode a 16-bit FLAC stream to a RIFF/PCM16 WAV.

    The bridge that lets every existing WAV operator (segmentation,
    RMS, re-parse round trips) run on FLAC inputs: decode the PCM and
    re-container it — no resampling, no quantization change. None when
    the payload is not FLAC; ValueError for non-16-bit streams (an 8/24
    bit transcode would change the sample type — out of scope for the
    PCM16 tooling; callers keep their strict/fallback contract).
    """
    decoded = decode_flac_samples(payload)
    if decoded is None:
        return None
    from sat_bucket_spark.operators.multimodal import parse_flac_streaminfo

    rate, ch, arr = decoded
    bps = parse_flac_streaminfo(payload)[2]
    if bps != 16:
        raise ValueError(f"only 16-bit FLAC transcodes to PCM16 WAV, got {bps}")
    pcm = arr.astype("<i2").tobytes()  # (n, ch) row-major == interleaved
    hdr = (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little")
    )
    return hdr + pcm
