"""FLAC frame-decoder validation.

No FLAC decoder exists in this container (javax.sound and the absent
PIL/soundfile class libraries don't cover it), so — like the VP8L suite —
validation is a test-side FLAC *encoder* producing spec-conformant
streams (verbatim, constant, fixed predictors with Rice residuals, LPC,
every stereo decorrelation, wasted bits, multi-frame streams, escape
partitions) whose round trips must reproduce the PCM samples exactly,
plus hand-computed fixtures from the spec pseudo-code.
"""

from __future__ import annotations

import numpy as np
import pytest

from sat_bucket_spark.operators.flac import (
    _crc8,
    _crc16,
    decode_flac_samples,
)

# ------------------------------------------------------------ test encoder


class MSBBitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray(len(self.bits) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (7 - (i & 7))
        return bytes(out)


def streaminfo(sample_rate, channels, bps, n_samples, block_size) -> bytes:
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | n_samples
    )
    body = (
        block_size.to_bytes(2, "big") * 2
        + (0).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


_FIXED_COEFS = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1)}


def rice_encode(w: MSBBitWriter, residual: list[int], param: int) -> None:
    for r in residual:
        u = (r << 1) if r >= 0 else (-(r << 1) - 1)
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def write_residual(w: MSBBitWriter, residual, param, escape_raw_bits=None):
    """Single-partition residual; escape_raw_bits forces the raw escape."""
    w.write(0, 2)   # 4-bit rice parameters
    w.write(0, 4)   # partition order 0
    if escape_raw_bits is not None:
        w.write(0xF, 4)
        w.write(escape_raw_bits, 5)
        for r in residual:
            w.write_signed(r, escape_raw_bits)
    else:
        w.write(param, 4)
        rice_encode(w, residual, param)


def write_subframe(
    w: MSBBitWriter,
    samples: list[int],
    bps: int,
    kind: str,
    order: int = 2,
    wasted: int = 0,
    rice_param: int = 4,
    escape_raw_bits=None,
    lpc=None,
):
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    w.write(0, 1)  # padding
    if kind == "constant":
        w.write(0, 6)
    elif kind == "verbatim":
        w.write(1, 6)
    elif kind == "fixed":
        w.write(8 + order, 6)
    elif kind == "lpc":
        w.write(31 + order, 6)
    else:
        raise AssertionError(kind)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)

    if kind == "constant":
        assert len(set(samples)) == 1
        w.write_signed(samples[0], bps)
        return
    if kind == "verbatim":
        for s in samples:
            w.write_signed(s, bps)
        return
    if kind == "fixed":
        coefs = _FIXED_COEFS[order]
        for s in samples[:order]:
            w.write_signed(s, bps)
        residual = []
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            residual.append(samples[i] - pred)
        write_residual(w, residual, rice_param, escape_raw_bits)
        return
    # LPC
    coefs, shift, precision = lpc
    assert len(coefs) == order
    for s in samples[:order]:
        w.write_signed(s, bps)
    w.write(precision - 1, 4)
    w.write_signed(shift, 5)
    for c in coefs:
        w.write_signed(c, precision)
    residual = []
    for i in range(order, len(samples)):
        acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        residual.append(samples[i] - (acc >> shift))
    write_residual(w, residual, rice_param, escape_raw_bits)


def encode_flac(
    channels: list[list[int]],
    sample_rate=44100,
    bps=16,
    block_size=None,
    stereo="independent",
    subframe_kwargs=None,
) -> bytes:
    """One-or-more-frame FLAC stream. `channels` is per-channel sample
    lists; frames of `block_size` samples (default: all in one frame)."""
    n = len(channels[0])
    block_size = block_size or n
    kw = subframe_kwargs or {"kind": "verbatim"}
    frames = b""
    for fi, start in enumerate(range(0, n, block_size)):
        bs = min(block_size, n - start)
        fkw = kw
        if kw["kind"] in ("fixed", "lpc") and kw.get("order", 2) > bs:
            # a predictor order above the block size is an invalid stream
            # (the decoder rejects it); real encoders drop to verbatim for
            # a tiny trailing frame
            fkw = {"kind": "verbatim"}
        w = MSBBitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed block size strategy
        w.write(7, 4)  # block size: 16-bit field
        # sample rate: table code for 44100, else "from STREAMINFO"
        w.write(9 if sample_rate == 44100 else 0, 4)
        if stereo == "independent":
            w.write(len(channels) - 1, 4)
        else:
            w.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo], 4)
        # sample-size table code (RFC 9639 s9.1.4): 8/12/16/20/24/32 bits
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.write(0, 1)
        assert fi < 128
        w.write(fi, 8)  # coded frame number, single byte
        w.write(bs - 1, 16)
        hdr = w.tobytes() if len(w.bits) % 8 == 0 else None
        assert hdr is not None
        w.write(_crc8(hdr), 8)

        chunk = [ch[start : start + bs] for ch in channels]
        if stereo == "independent":
            for ch in chunk:
                write_subframe(w, ch, bps, **fkw)
        else:
            L, R = chunk
            side = [l - r for l, r in zip(L, R)]
            if stereo == "left_side":
                write_subframe(w, L, bps, **fkw)
                write_subframe(w, side, bps + 1, **fkw)
            elif stereo == "right_side":
                write_subframe(w, side, bps + 1, **fkw)
                write_subframe(w, R, bps, **fkw)
            else:
                mid = [(l + r) >> 1 for l, r in zip(L, R)]
                write_subframe(w, mid, bps, **fkw)
                write_subframe(w, side, bps + 1, **fkw)
        w.align()
        body = w.tobytes()
        w.write(_crc16(body), 16)
        frames += w.tobytes()
    return streaminfo(sample_rate, len(channels), bps, n, block_size) + frames


def rng_samples(n, seed, bps=16, channels=1):
    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    return [
        [int(v) for v in rng.integers(lo, hi + 1, size=n)]
        for _ in range(channels)
    ]


def assert_round_trip(payload, channels, sample_rate=44100):
    rate, n_ch, arr = decode_flac_samples(payload)
    assert rate == sample_rate
    assert n_ch == len(channels)
    np.testing.assert_array_equal(arr, np.array(channels, dtype=np.int64).T)


# ------------------------------------------------------------------- tests


class TestSubframeTypes:
    def test_verbatim_mono(self):
        ch = rng_samples(100, 1)
        assert_round_trip(encode_flac(ch), ch)

    def test_constant_mono(self):
        ch = [[-12345] * 64]
        assert_round_trip(
            encode_flac(ch, subframe_kwargs={"kind": "constant"}), ch
        )

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, order):
        # smooth-ish signal so fixed predictors stay in range
        n = 96
        ch = [[int(1000 * np.sin(i / 7)) + (i % 5) for i in range(n)]]
        payload = encode_flac(
            ch, subframe_kwargs={"kind": "fixed", "order": order, "rice_param": 6}
        )
        assert_round_trip(payload, ch)

    def test_lpc(self):
        n = 80
        ch = [[int(500 * np.sin(i / 5)) for i in range(n)]]
        payload = encode_flac(
            ch,
            subframe_kwargs={
                "kind": "lpc",
                "order": 3,
                "rice_param": 7,
                "lpc": ([19, -12, 5], 4, 12),  # coefs, shift, precision
            },
        )
        assert_round_trip(payload, ch)

    def test_escape_partition_raw(self):
        ch = rng_samples(64, 5)
        payload = encode_flac(
            ch,
            subframe_kwargs={
                "kind": "fixed", "order": 1, "escape_raw_bits": 18,
            },
        )
        assert_round_trip(payload, ch)

    def test_wasted_bits(self):
        ch = [[(v >> 2) << 2 for v in rng_samples(50, 6)[0]]]
        payload = encode_flac(ch, subframe_kwargs={"kind": "verbatim", "wasted": 2})
        assert_round_trip(payload, ch)


class TestStereoModes:
    @pytest.mark.parametrize(
        "mode", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_decorrelation_exact(self, mode):
        chans = rng_samples(64, 20, channels=2)
        payload = encode_flac(chans, stereo=mode)
        assert_round_trip(payload, chans)

    def test_mid_side_odd_parity_hand_fixture(self):
        """L=5, R=2: side=3, mid=(5+2)>>1=3; decode m=(3<<1)|1=7,
        left=(7+3)>>1=5, right=(7-3)>>1=2 — the parity-bit rule."""
        chans = [[5], [2]]
        payload = encode_flac(chans, stereo="mid_side")
        _, _, arr = decode_flac_samples(payload)
        assert arr.tolist() == [[5, 2]]


class TestFraming:
    def test_multi_frame_stream(self):
        ch = rng_samples(300, 30)
        payload = encode_flac(ch, block_size=128)
        assert_round_trip(payload, ch)

    def test_multi_frame_fixed_with_tiny_trailing_frame(self):
        """n=55 at block 18 leaves a 1-sample last frame: the encoder must
        drop to verbatim there (predictor order > block size is invalid;
        the decoder rejects it) — regression from the Spark drive."""
        ch = rng_samples(55, 5, channels=2)
        payload = encode_flac(
            ch, stereo="left_side", block_size=18,
            subframe_kwargs={"kind": "fixed", "order": 2, "rice_param": 6},
        )
        assert_round_trip(payload, ch)

    def test_order_above_block_size_rejected(self):
        """A hand-forced fixed order-2 subframe in a 1-sample frame must
        error cleanly, not desynchronize."""
        ch = [[7], [9]]
        payload = bytearray(encode_flac(ch, subframe_kwargs={"kind": "verbatim"}))
        # rewrite the first subframe header: type verbatim (000001) ->
        # fixed order 2 (001010) lives in the byte after the 8-byte frame
        # header + crc; easier: encode an invalid stream directly
        w = MSBBitWriter()
        w.write(0b11111111111110, 14); w.write(0, 1); w.write(0, 1)
        w.write(7, 4); w.write(9, 4); w.write(1, 4); w.write(4, 3); w.write(0, 1)
        w.write(0, 8); w.write(0, 16)  # block size 1
        hdr = w.tobytes(); w.write(_crc8(hdr), 8)
        w.write(0, 1); w.write(8 + 2, 6); w.write(0, 1)  # fixed order 2
        w.write_signed(7, 16); w.write_signed(9, 16)
        w.align(); body = w.tobytes(); w.write(_crc16(body), 16)
        bad = streaminfo(44100, 2, 16, 1, 1) + w.tobytes()
        with pytest.raises(ValueError, match="order exceeds block size"):
            decode_flac_samples(bad)

    def test_header_crc8_detects_corruption(self):
        ch = rng_samples(32, 31)
        payload = bytearray(encode_flac(ch))
        # flip a bit inside the first frame header (after the 42-byte
        # streaminfo + 4-byte magic prefix = offset 50; +2 lands in the
        # header fields before the CRC)
        payload[52] ^= 0x10
        with pytest.raises(ValueError):
            decode_flac_samples(bytes(payload))

    def test_frame_crc16_detects_corruption(self):
        ch = rng_samples(32, 32)
        payload = bytearray(encode_flac(ch))
        payload[-20] ^= 0x01  # inside subframe data, not the header
        with pytest.raises(ValueError):
            decode_flac_samples(bytes(payload))

    def test_truncated_raises(self):
        ch = rng_samples(64, 33)
        payload = encode_flac(ch)
        with pytest.raises(ValueError):
            decode_flac_samples(payload[: len(payload) - 30])

    def test_non_flac_returns_none(self):
        assert decode_flac_samples(b"RIFFxxxxWAVE") is None
        assert decode_flac_samples(None) is None


class TestDispatchIntegration:
    def test_audio_features_route_flac(self, spark):
        from sat_bucket_spark.operators.multimodal import decode_audio_features

        ch = rng_samples(200, 44)
        payload = encode_flac(ch)
        df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
        row = decode_audio_features(df, strict=True).collect()[0]
        assert row["sample_rate"] == 44100
        assert row["n_samples"] == 200
        v = np.array(ch[0], dtype=np.float64) / 32768.0
        assert row["rms_energy"] == pytest.approx(
            float(np.sqrt(np.mean(v * v))), rel=1e-6
        )


class TestWavBridge:
    def test_transcode_then_segment(self, spark):
        """FLAC -> WAV transcode is lossless and feeds the existing WAV
        segmentation: segments re-parse as WAVs with the right counts."""
        from sat_bucket_spark.operators.flac import flac_to_wav_bytes
        from sat_bucket_spark.operators.multimodal import (
            parse_wav,
            segment_audio,
        )

        ch = rng_samples(100, 60, channels=2)
        payload = encode_flac(ch, stereo="mid_side")
        wav = flac_to_wav_bytes(payload)
        rate, n, _rms = parse_wav(wav)
        assert (rate, n) == (44100, 100)
        # interleaved PCM round trip
        pcm = np.frombuffer(wav[44:], dtype="<i2").reshape(-1, 2)
        np.testing.assert_array_equal(pcm, np.array(ch, dtype=np.int64).T)

        df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
        segs = segment_audio(df, seconds=30 / 44100, strict=True).collect()
        assert sum(s["n_samples"] for s in segs) == 100
        assert all(s["sample_rate"] == 44100 for s in segs)
        assert all(parse_wav(bytes(s["payload"])) is not None for s in segs)

    def test_non16bit_rejected(self):
        from sat_bucket_spark.operators.flac import flac_to_wav_bytes

        ch = [[1, -2, 3, -4]]
        # hand-build an 8-bit stream: bps code 001
        w = MSBBitWriter()
        w.write(0b11111111111110, 14); w.write(0, 1); w.write(0, 1)
        w.write(7, 4); w.write(9, 4); w.write(0, 4)
        w.write(1, 3)  # bps 8
        w.write(0, 1); w.write(0, 8); w.write(3, 16)
        hdr = w.tobytes(); w.write(_crc8(hdr), 8)
        w.write(0, 1); w.write(1, 6); w.write(0, 1)  # verbatim
        for s in ch[0]:
            w.write_signed(s, 8)
        w.align(); body = w.tobytes(); w.write(_crc16(body), 16)
        payload = streaminfo(44100, 1, 8, 4, 4) + w.tobytes()
        with pytest.raises(ValueError, match="16-bit"):
            flac_to_wav_bytes(payload)
        assert flac_to_wav_bytes(b"RIFF") is None


class TestCorruptionRobustness:
    def test_random_mutations_never_crash(self):
        """Arbitrary corruption must yield ValueError or a decoded array —
        never an unhandled exception or hang (CRCs catch most flips; the
        rest must fail structurally clean)."""
        rng = np.random.default_rng(77)
        ch = rng_samples(120, 77, channels=2)
        base = bytearray(encode_flac(ch, stereo="mid_side", block_size=48))
        for trial in range(300):
            data = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                out = decode_flac_samples(bytes(data))
                assert out is None or out[2].ndim == 2
            except ValueError:
                pass

    def test_every_truncation_point(self):
        ch = rng_samples(64, 78)
        base = encode_flac(ch)
        for cut in range(len(base)):
            try:
                out = decode_flac_samples(base[:cut])
                assert out is None or out[2].ndim == 2
            except ValueError:
                pass


class TestPropertyRoundTrips:
    def test_hypothesis_subframe_and_stereo_round_trips(self):
        """Property: arbitrary 16-bit sample blocks round-trip exactly
        through every (subframe kind, stereo mode, block size) shape."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            n=st.integers(1, 120),
            seed=st.integers(0, 10_000),
            kind=st.sampled_from(["verbatim", "fixed0", "fixed1", "fixed2"]),
            stereo=st.sampled_from(
                ["independent", "left_side", "right_side", "mid_side"]
            ),
            block=st.integers(8, 64),
        )
        def check(n, seed, kind, stereo, block):
            ch = rng_samples(n, seed, channels=2)
            if kind == "verbatim":
                kw = {"kind": "verbatim"}
            else:
                kw = {"kind": "fixed", "order": int(kind[-1]), "rice_param": 9}
            payload = encode_flac(
                ch, stereo=stereo, block_size=block, subframe_kwargs=kw
            )
            assert_round_trip(payload, ch)

        check()


class TestCorruptFlacInPipelines:
    """A corrupt FLAC payload must degrade like any other undecodable
    payload in NON-strict mode (fallback/NULL/drop), and raise in strict
    — previously it killed the job regardless (regression tests)."""

    def _corrupt(self):
        good = bytearray(encode_flac(rng_samples(64, 90)))
        good[-10] ^= 0xFF  # breaks the frame CRC
        return bytes(good)

    def test_audio_features_fallback_and_strict(self, spark):
        from sat_bucket_spark.operators.multimodal import decode_audio_features

        df = spark.createDataFrame(
            [(1, self._corrupt())], "doc_id long, payload binary"
        )
        row = decode_audio_features(df).collect()[0]  # non-strict: fake
        assert row["sample_rate"] == 16000  # the md5-derived fake rate
        with pytest.raises(Exception, match="ValueError|CRC"):
            decode_audio_features(df, strict=True).collect()

    def test_quality_features_null_and_strict(self, spark):
        from sat_bucket_spark.operators.audio import audio_quality_features

        df = spark.createDataFrame(
            [(1, self._corrupt())], "doc_id long, payload binary"
        )
        row = audio_quality_features(df).collect()[0]
        assert row["rms_db"] is None
        with pytest.raises(Exception, match="ValueError|CRC"):
            audio_quality_features(df, strict=True).collect()

    def test_segment_audio_drops_and_strict(self, spark):
        from sat_bucket_spark.operators.multimodal import segment_audio

        df = spark.createDataFrame(
            [(1, self._corrupt())], "doc_id long, payload binary"
        )
        assert segment_audio(df, seconds=0.1).count() == 0
        with pytest.raises(Exception):
            segment_audio(df, seconds=0.1, strict=True).collect()
