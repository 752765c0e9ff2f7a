"""Perceptual image hashing + banded near-dup join."""

from __future__ import annotations

import numpy as np
import pytest

from sat_bucket_spark.operators.imagehash import (
    ahash_bits,
    dhash_bits,
    image_hash_table,
    image_near_dup_pairs,
    phash_bits,
)


def bmp_bytes(px: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP from an (H, W, 3) uint8 RGB array."""
    h, w, _ = px.shape
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    data = b""
    for y in range(h - 1, -1, -1):
        data += px[y][:, ::-1].tobytes() + b"\x00" * (stride - row_bytes)
    off = 54
    hdr = (
        b"BM" + (off + len(data)).to_bytes(4, "little")
        + b"\x00" * 4 + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + dib + data


def rng_rgb(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


class TestHashFunctions:
    def test_dhash_hand_fixture(self):
        """2x3 grayscale grid IS the downscale at hash_size=2: bits are the
        four left>right comparisons, MSB-first row-major."""
        g = np.array([[10, 20, 5], [7, 7, 9]], dtype=np.uint8)
        px = np.stack([g, g, g], axis=-1)
        # row 0: 10>20 = 0, 20>5 = 1; row 1: 7>7 = 0, 7>9 = 0 -> 0b0100
        assert dhash_bits(px, hash_size=2) == 0b0100

    def test_ahash_hand_fixture(self):
        g = np.array([[0, 255], [255, 0]], dtype=np.uint8)
        px = np.stack([g, g, g], axis=-1)
        # mean 127.5: bits = (0>m, 255>m, 255>m, 0>m) = 0b0110
        assert ahash_bits(px, hash_size=2) == 0b0110

    def test_dhash_brightness_invariant(self):
        # values bounded away from 255 so the +10 shift never clips
        px = (rng_rgb(40, 40, 1) % 200).astype(np.uint8)
        brighter = (px.astype(np.int64) + 10).astype(np.uint8)
        assert dhash_bits(px) == dhash_bits(brighter)

    def test_exact_upscale_invariant(self):
        """2x nearest-neighbor upscale preserves block means exactly WHEN
        the hash grid divides the dimensions (ahash 8x8, dhash 8x9,
        phash 32x32 grids -> per-hash compatible dims)."""
        cases = [
            (ahash_bits, 16, 16),   # 8 | 16
            (dhash_bits, 16, 72),   # 8 | 16 rows, 9 | 72 cols
            (phash_bits, 32, 32),   # 32 | 32
        ]
        for fn, h, w in cases:
            px = rng_rgb(h, w, 2)
            up = px.repeat(2, axis=0).repeat(2, axis=1)
            assert fn(px) == fn(up), fn.__name__

    def test_inexact_upscale_small_distance_on_smooth_image(self):
        """When grids don't divide the dims, a 2x upscale of a NATURAL
        (spatially correlated) image still lands within a few bits —
        that's the robustness the hash exists for. (iid noise images
        legitimately diverge under misaligned pooling: no structure.)"""
        y, x = np.mgrid[0:15, 0:17]
        smooth = (
            100
            + 60 * np.sin(x / 4.0)
            + 50 * np.cos(y / 3.0)
        ).astype(np.uint8)
        px = np.stack([smooth, smooth, smooth], axis=-1)
        up = px.repeat(2, axis=0).repeat(2, axis=1)
        for fn in (ahash_bits, dhash_bits, phash_bits):
            assert hamming(fn(px), fn(up)) <= 6, fn.__name__

    def test_noise_flips_few_bits_random_flips_many(self):
        px = rng_rgb(64, 64, 3)
        noisy = px.copy()
        noisy[10, 10] = 255 - noisy[10, 10]  # one pixel
        other = rng_rgb(64, 64, 4)
        for fn in (ahash_bits, dhash_bits, phash_bits):
            near = hamming(fn(px), fn(noisy))
            far = hamming(fn(px), fn(other))
            assert near <= 4, (fn.__name__, near)
            assert far >= 16, (fn.__name__, far)

    def test_signed_64bit_range(self):
        """Hashes with the top bit set must fit Spark's signed long."""
        white = np.full((8, 9, 3), 255, np.uint8)
        white[:, 0] = 0  # dark first column -> first gradient bits 0...
        px = rng_rgb(32, 32, 5)
        for fn in (ahash_bits, dhash_bits, phash_bits):
            v = fn(px)
            assert -(1 << 63) <= v < (1 << 63)

    def test_invalid_args(self):
        px = rng_rgb(8, 8, 6)
        with pytest.raises(ValueError):
            from sat_bucket_spark.operators.imagehash import _block_mean, _to_gray

            _block_mean(_to_gray(px[:0]), 8, 8)


class TestCrossFormat:
    def test_same_pixels_same_hash_across_containers(self):
        """The whole point: one picture, three containers (BMP, PNG-less
        VP8L WebP), one hash."""
        import sys

        sys.path.insert(0, "tests")
        from test_vp8l import encode_vp8l, wrap_webp

        from sat_bucket_spark.operators.multimodal import decode_image_pixels

        px = rng_rgb(12, 10, 7)
        as_bmp = bmp_bytes(px)
        argb = [
            (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
            for r, g, b in px.reshape(-1, 3)
        ]
        as_webp = wrap_webp(encode_vp8l(argb, 10, 12))
        d_bmp = decode_image_pixels(as_bmp)
        d_webp = decode_image_pixels(as_webp)
        np.testing.assert_array_equal(d_bmp, d_webp)
        for fn in (ahash_bits, dhash_bits, phash_bits):
            assert fn(d_bmp) == fn(d_webp)


class TestSparkStages:
    def test_hash_table_and_null_fallback(self, spark):
        px = rng_rgb(9, 9, 8)
        df = spark.createDataFrame(
            [(1, bmp_bytes(px)), (2, b"not an image"), (3, None)],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r for r in image_hash_table(df).collect()}
        assert rows[1]["phash"] == dhash_bits(px)
        assert (rows[1]["width"], rows[1]["height"]) == (9, 9)
        assert rows[2]["phash"] is None and rows[3]["phash"] is None
        with pytest.raises(Exception, match="did not decode"):
            image_hash_table(df, strict=True).collect()

    def test_profile_table_equals_both_parents(self, spark):
        """image_profile_table is the fused decode: its feature columns
        must equal decode_and_featurize_images and its phash must equal
        image_hash_table, row for row, on decodable / header-only-ish /
        garbage / NULL payloads."""
        from sat_bucket_spark.operators.imagehash import image_profile_table
        from sat_bucket_spark.operators.multimodal import (
            decode_and_featurize_images,
        )

        px = rng_rgb(9, 9, 8)
        rows = [
            (1, bmp_bytes(px)),
            (2, b"not an image at all"),
            (3, None),
            (4, bmp_bytes(rng_rgb(16, 7, 5))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        fused = {r["doc_id"]: r for r in image_profile_table(df).collect()}
        feats = {r["doc_id"]: r for r in decode_and_featurize_images(df).collect()}
        hashes = {r["doc_id"]: r for r in image_hash_table(df).collect()}
        assert fused.keys() == feats.keys() == hashes.keys()
        for k in fused:
            for col in ("width", "height", "channels", "feature"):
                assert fused[k][col] == feats[k][col], (k, col)
            assert fused[k]["phash"] == hashes[k]["phash"], k
        assert fused[1]["phash"] == dhash_bits(px)
        with pytest.raises(Exception, match="not a parseable"):
            image_profile_table(df, strict=True).collect()

    def test_near_dup_pairs_exact_vs_brute_force(self, spark):
        """Planted near-dups (same picture cross-format + a noised copy)
        among distinct randoms: banded result == brute force, exactly."""
        import sys

        sys.path.insert(0, "tests")
        from test_vp8l import encode_vp8l, wrap_webp

        base = rng_rgb(32, 32, 10)
        noisy = base.copy()
        noisy[5, 5] = 255 - noisy[5, 5]
        argb = [
            (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
            for r, g, b in base.reshape(-1, 3)
        ]
        rows = [
            (1, bmp_bytes(base)),
            (2, wrap_webp(encode_vp8l(argb, 32, 32))),  # same pixels as 1
            (3, bmp_bytes(noisy)),                       # near 1 and 2
            (4, b"garbage"),                             # undecodable
        ] + [(10 + i, bmp_bytes(rng_rgb(32, 32, 20 + i))) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in image_near_dup_pairs(df, max_hamming=6).collect()
        }
        # brute force over the same hashes
        hs = {
            r["doc_id"]: r["phash"]
            for r in image_hash_table(df).collect()
            if r["phash"] is not None
        }
        want = {}
        ids = sorted(hs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                d = hamming(hs[a] & ((1 << 64) - 1), hs[b] & ((1 << 64) - 1))
                if d <= 6:
                    want[(a, b)] = d
        assert got == want
        assert got[(1, 2)] == 0  # cross-format exact duplicate
        assert (1, 3) in got or (2, 3) in got  # the noised copy surfaces

    def test_band_validation(self, spark):
        df = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
        with pytest.raises(ValueError, match="must exceed"):
            image_near_dup_pairs(df, max_hamming=8, n_bands=8)
        with pytest.raises(ValueError, match="divisible"):
            image_near_dup_pairs(df, hash_size=7, n_bands=8)


class TestImageDecontaminate:
    def test_leaked_benchmark_image_found_cross_format(self, spark):
        import sys

        sys.path.insert(0, "tests")
        from test_vp8l import encode_vp8l, wrap_webp

        from sat_bucket_spark.operators.imagehash import image_decontaminate

        bench = rng_rgb(24, 24, 50)
        leaked_noisy = bench.copy()
        leaked_noisy[2, 2] = 255 - leaked_noisy[2, 2]
        argb = [
            (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
            for r, g, b in bench.reshape(-1, 3)
        ]
        train = spark.createDataFrame(
            [
                (1, wrap_webp(encode_vp8l(argb, 24, 24))),  # re-encoded leak
                (2, bmp_bytes(leaked_noisy)),                # noised leak
                (3, bmp_bytes(rng_rgb(24, 24, 51))),         # clean
                (4, b"garbage"),                             # undecodable
            ],
            "doc_id long, payload binary",
        )
        eval_df = spark.createDataFrame(
            [(100, bmp_bytes(bench))], "doc_id long, payload binary"
        )
        got = {r["doc_id"]: r for r in image_decontaminate(train, eval_df).collect()}
        assert set(got) == {1, 2, 3}  # undecodable absent by contract
        assert got[1]["is_contaminated"] and got[1]["min_hamming"] == 0
        assert got[2]["is_contaminated"] and got[2]["min_hamming"] <= 4
        assert not got[3]["is_contaminated"] and got[3]["min_hamming"] is None

    def test_banded_equals_brute_force(self, spark):
        from sat_bucket_spark.operators.imagehash import (
            image_decontaminate,
            image_hash_table,
        )

        train = spark.createDataFrame(
            [(i, bmp_bytes(rng_rgb(24, 24, 60 + i))) for i in range(12)],
            "doc_id long, payload binary",
        )
        eval_df = spark.createDataFrame(
            [(100 + i, bmp_bytes(rng_rgb(24, 24, 60 + 3 * i))) for i in range(5)],
            "doc_id long, payload binary",
        )
        got = {
            r["doc_id"]: (r["is_contaminated"], r["min_hamming"])
            for r in image_decontaminate(
                train, eval_df, max_hamming=12, n_bands=16
            ).collect()
        }
        th = {r["doc_id"]: r["phash"] for r in image_hash_table(train).collect()}
        eh = [r["phash"] for r in image_hash_table(eval_df).collect()]
        for d, h in th.items():
            dists = [hamming(h, e) for e in eh]
            m = min(d2 for d2 in dists if d2 <= 12) if any(d2 <= 12 for d2 in dists) else None
            assert got[d] == (m is not None, m), d

    def test_validation(self, spark):
        from sat_bucket_spark.operators.imagehash import image_decontaminate

        df = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
        with pytest.raises(ValueError, match="must exceed"):
            image_decontaminate(df, df, max_hamming=8, n_bands=8)

    def test_plan_shape_broadcast_probe_one_smj(self, spark):
        """Scale gate: band probe and hash verify are BROADCAST joins;
        the only sort-merge join is the final per-image verdict attach
        (and AQE broadcasts that side in production when small)."""
        from sat_bucket_spark.operators.imagehash import image_decontaminate

        train = spark.createDataFrame(
            [(i, bmp_bytes(rng_rgb(8, 8, i))) for i in range(4)],
            "doc_id long, payload binary",
        )
        ev = spark.createDataFrame(
            [(9, bmp_bytes(rng_rgb(8, 8, 0)))], "doc_id long, payload binary"
        )
        plan = image_decontaminate(train, ev)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan       # band probe
        assert "BroadcastNestedLoopJoin" in plan  # hamming verify
        assert plan.count("SortMergeJoin") <= 1   # verdict attach only


class TestImageDedup:
    """Keep-first dedup: verdicts must equal the brute-force keep-min-id
    rule over the SAME hashes, and heavy clusters must collapse before
    the band join (the scale posture the pair list cannot offer)."""

    def _rows(self):
        base = rng_rgb(32, 32, 40)
        noisy = base.copy()
        noisy[3, 3] = 255 - noisy[3, 3]
        rows = []
        # a planted 5-copy exact cluster (ids 100..104), one near copy
        for i in range(5):
            rows.append((100 + i, bmp_bytes(base)))
        rows.append((200, bmp_bytes(noisy)))
        rows.append((201, b"not an image"))
        rows += [(300 + i, bmp_bytes(rng_rgb(32, 32, 60 + i))) for i in range(6)]
        return rows

    def test_matches_brute_force_keep_min_id(self, spark):
        from sat_bucket_spark.operators.imagehash import image_dedup

        df = spark.createDataFrame(self._rows(), "doc_id long, payload binary")
        got = {
            r["doc_id"]: (r["phash"], r["n_copies"], r["kept"])
            for r in image_dedup(df, max_hamming=6, n_bands=8).collect()
        }
        hs = {
            r["doc_id"]: r["phash"]
            for r in image_hash_table(df).collect()
            if r["phash"] is not None
        }
        assert set(got) == set(hs)  # undecodable 201 absent
        for x, hx in hs.items():
            want_kept = not any(
                a < x and hamming(hx & ((1 << 64) - 1), ha & ((1 << 64) - 1)) <= 6
                for a, ha in hs.items()
                if a != x
            )
            phash, n_copies, kept = got[x]
            assert phash == hx
            assert n_copies == sum(1 for h in hs.values() if h == hx)
            assert kept == want_kept, x
        # the planted cluster: only id 100 survives; the near copy 200
        # is within 6 bits of id 100 so it dies too
        assert got[100][2] is True
        for i in range(101, 105):
            assert got[i][2] is False
        assert got[100][1] == 5
        assert got[200][2] is False

    def test_survivor_set_consistent_with_pair_list(self, spark):
        """kept(x) == no pair (a, x) with a < x in image_near_dup_pairs."""
        from sat_bucket_spark.operators.imagehash import image_dedup

        df = spark.createDataFrame(self._rows(), "doc_id long, payload binary")
        kept = {
            r["doc_id"]: r["kept"]
            for r in image_dedup(df, max_hamming=6, n_bands=8).collect()
        }
        dominated = {
            r["id_b"] for r in image_near_dup_pairs(df, max_hamming=6).collect()
        }
        for doc_id, k in kept.items():
            assert k == (doc_id not in dominated), doc_id

    def test_band_join_sees_distinct_signatures_only(self, spark):
        """The scale claim, checked on the plan: both band-explode sides
        hang off the COLLAPSED group table (phash, __rep_id, n_copies) —
        never the row-level (doc_id, phash) table — so a 10^6-copy
        cluster enters the band self-join exactly once."""
        from sat_bucket_spark.operators.imagehash import image_dedup

        df = spark.createDataFrame(self._rows(), "doc_id long, payload binary")
        plan = image_dedup(df)._jdf.queryExecution().optimizedPlan().toString()
        # the neighbor subtree is everything under the min(__nbr_rep)
        # aggregate; doc_id must never appear inside it (rows would be
        # self-joining), and its two explode sides must read __rep_id
        idx = plan.find("min(__nbr_rep")
        assert idx > 0, plan
        neighbor_subtree = plan[idx:]
        assert "doc_id" not in neighbor_subtree, neighbor_subtree
        assert neighbor_subtree.count("Generate explode") == 2
        assert "__rep_id" in neighbor_subtree

    def test_validation(self, spark):
        from sat_bucket_spark.operators.imagehash import image_dedup

        df = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
        with pytest.raises(ValueError, match="must exceed"):
            image_dedup(df, max_hamming=8, n_bands=8)
        with pytest.raises(ValueError, match="divisible"):
            image_dedup(df, hash_size=7, n_bands=8)


class TestVideoHash:
    """Per-video signatures from real MJPEG-AVI frame decodes + majority
    pooling, and keep-first video dedup on top."""

    @staticmethod
    def _avi(frames, width=16, height=16, fps_us=33333):
        def chunk(cc, body):
            pad = b"\x00" if len(body) % 2 else b""
            return cc + len(body).to_bytes(4, "little") + body + pad

        avih = (
            fps_us.to_bytes(4, "little") + b"\x00" * 12
            + len(frames).to_bytes(4, "little") + b"\x00" * 12
            + width.to_bytes(4, "little") + height.to_bytes(4, "little")
            + b"\x00" * 16
        )
        hdrl = b"hdrl" + chunk(b"avih", avih)
        movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
        body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    @staticmethod
    def _jpeg_frames(seeds, shift=0):
        from sat_bucket_spark.operators.jpeg import encode_jpeg_baseline

        pxs = [
            (rng_rgb(16, 16, s)[..., 0] // 2 + 40 + shift).astype(np.uint8)
            for s in seeds
        ]
        return [
            encode_jpeg_baseline(p, np.ones((8, 8)), np.ones((8, 8)))
            for p in pxs
        ]

    def test_vhash_matches_manual_majority_pooling(self, spark):
        from sat_bucket_spark.operators.imagehash import (
            image_hash_table,
            video_hash_table,
        )

        jpegs = self._jpeg_frames([1, 2, 3])
        vdf = spark.createDataFrame(
            [(1, self._avi(jpegs))], "doc_id long, payload binary"
        )
        row = video_hash_table(vdf, every_n=1, n_frames=3).collect()[0]
        assert row["n_frames_sampled"] == 3
        # frame hashes must equal the image-stage hashes of the same bytes
        fdf = spark.createDataFrame(
            [(i, j) for i, j in enumerate(jpegs)], "doc_id long, payload binary"
        )
        want = [
            r["phash"] for r in sorted(
                image_hash_table(fdf).collect(), key=lambda r: r["doc_id"]
            )
        ]
        assert list(row["frame_hashes"]) == want
        # manual majority pooling over the 64 bit positions
        u = [h & ((1 << 64) - 1) for h in want]
        v = 0
        for j in range(64):
            if sum((h >> j) & 1 for h in u) * 2 > len(u):
                v |= 1 << j
        if v & (1 << 63):
            v -= 1 << 64
        assert row["vhash"] == v

    def test_brightness_shifted_copy_same_vhash(self, spark):
        """dhash is brightness-invariant per frame, so a globally
        brightened re-encode of the same footage pools identically."""
        from sat_bucket_spark.operators.imagehash import video_hash_table

        a = self._avi(self._jpeg_frames([5, 6, 7], shift=0))
        b = self._avi(self._jpeg_frames([5, 6, 7], shift=30))
        df = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, payload binary"
        )
        rows = {r["doc_id"]: r for r in video_hash_table(df, every_n=1).collect()}
        assert rows[1]["vhash"] == rows[2]["vhash"]

    def test_non_avi_null_and_strict(self, spark):
        from sat_bucket_spark.operators.imagehash import video_hash_table

        df = spark.createDataFrame(
            [(1, b"not a video"), (2, None)], "doc_id long, payload binary"
        )
        rows = {r["doc_id"]: r for r in video_hash_table(df).collect()}
        assert rows[1]["vhash"] is None and rows[2]["vhash"] is None
        with pytest.raises(Exception, match="not an AVI"):
            video_hash_table(
                spark.createDataFrame([(1, b"x")], "doc_id long, payload binary"),
                strict=True,
            ).collect()

    def test_video_dedup_keep_first(self, spark):
        from sat_bucket_spark.operators.imagehash import video_dedup

        same = self._jpeg_frames([10, 11, 12])
        rows = [
            (1, self._avi(same)),
            (2, self._avi(self._jpeg_frames([10, 11, 12], shift=25))),  # copy
            (3, self._avi(self._jpeg_frames([20, 21, 22]))),            # distinct
            (4, b"not a video"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {
            r["doc_id"]: (r["n_copies"], r["kept"])
            for r in video_dedup(df, every_n=1, max_hamming=0).collect()
        }
        assert set(got) == {1, 2, 3}  # undecodable absent
        assert got[1] == (2, True)
        assert got[2] == (2, False)
        assert got[3][1] is True
