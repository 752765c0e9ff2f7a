"""Perceptual image hashing + image near-duplicate detection.

The image-side complement of the text dedup suite: training corpora carry
the same picture re-encoded (PNG vs WebP vs BMP), resized, or slightly
recompressed; byte-level dedup misses all of it. Perceptual hashes map an
image's CONTENT to a small bit signature whose Hamming distance tracks
visual similarity — identical pixels hash identically across container
formats (the suite's real decoders make that literal here), and small
pixel perturbations flip few bits.

Three public-lineage hashes (aHash/dHash/pHash are folklore algorithms,
widely documented; pHash's DCT variant follows Zauner 2010):

- ``ahash``: mean-threshold bits of a block-mean downscale;
- ``dhash``: horizontal-gradient bits of an (N+1) x N downscale — the
  robust default (insensitive to global brightness shifts);
- ``phash``: sign-vs-median of the top-left AC block of a 2D DCT-II over
  a 32x32 downscale (captures low-frequency structure; survives mild
  recompression noise better).

Downscaling is deterministic block-mean pooling (integer bucket
boundaries ``i * dim // target``) — no interpolation library, identical
results everywhere.

Scale shape: hashing is Arrow-batched ``mapInPandas`` over payload bytes
(decode + hash per row, no shuffle). Near-dup pairs use the SAME
pigeonhole banding as SimHash (operators/dedup.py:635): pairs within
``max_hamming`` bits agree exactly on at least one of ``n_bands`` bit
bands, so candidates come from a band equi-join (ids only through the
shuffle), and a ``bit_count(xor)`` verify restores exact precision — no
quadratic pair scan at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.caching import stage_cache

__all__ = [
    "ahash_bits",
    "dhash_bits",
    "phash_bits",
    "image_decontaminate",
    "image_dedup",
    "image_hash_table",
    "image_near_dup_pairs",
    "image_profile_table",
    "video_dedup",
    "video_hash_table",
]


def _to_gray(px) -> "object":
    """ITU-R BT.601 integer luma from an (H, W, C) uint8 array."""
    import numpy as np

    a = np.asarray(px)
    if a.ndim == 2:
        return a.astype(np.int64)
    if a.shape[2] == 1:
        return a[..., 0].astype(np.int64)
    r = a[..., 0].astype(np.int64)
    g = a[..., 1].astype(np.int64)
    b = a[..., 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def _block_mean(gray, th: int, tw: int):
    """Deterministic block-mean downscale to (th, tw) float64.

    Vectorized with two ``np.add.reduceat`` passes (rows then columns)
    over integer bucket boundaries ``i * dim // target``. reduceat's
    degenerate-segment rule (``indices[i] >= indices[i+1]`` yields the
    single element at ``indices[i]``) matches the old per-block
    ``max(y1, y0 + 1)`` guard exactly, and int64 block sums divided by
    exact counts reproduce ``.mean()`` bit-for-bit — the hand fixtures
    in test_imagehash pin that.
    """
    import numpy as np

    h, w = gray.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ys = np.array([y * h // th for y in range(th + 1)], dtype=np.intp)
    xs = np.array([x * w // tw for x in range(tw + 1)], dtype=np.intp)
    sums = np.add.reduceat(
        np.add.reduceat(gray, ys[:-1], axis=0), xs[:-1], axis=1
    ).astype(np.float64)
    ny = np.maximum(np.diff(ys), 1).astype(np.float64)
    nx = np.maximum(np.diff(xs), 1).astype(np.float64)
    return sums / np.outer(ny, nx)

def _pack_bits(bits) -> int:
    """MSB-first bit sequence -> signed 64-bit-compatible Python int."""
    v = 0
    n = 0
    for bit in bits:
        v = (v << 1) | int(bool(bit))
        n += 1
    if n > 64:
        raise ValueError(f"hash wider than 64 bits ({n})")
    if n == 64 and v >= 1 << 63:
        v -= 1 << 64  # Spark LongType is signed
    return v


def ahash_bits(px, hash_size: int = 8) -> int:
    """Average hash: bit i,j = block mean > global mean."""
    g = _block_mean(_to_gray(px), hash_size, hash_size)
    m = g.mean()
    return _pack_bits(g.ravel() > m)


def dhash_bits(px, hash_size: int = 8) -> int:
    """Difference hash: bit i,j = left block brighter than its right
    neighbor (an (hash_size) x (hash_size+1) grid of column gradients)."""
    g = _block_mean(_to_gray(px), hash_size, hash_size + 1)
    return _pack_bits((g[:, :-1] > g[:, 1:]).ravel())


def phash_bits(px, hash_size: int = 8, highfreq_factor: int = 4) -> int:
    """DCT hash: sign-vs-median of the top-left AC coefficients of an
    orthonormal 2D DCT-II over the downscaled image (Zauner 2010)."""
    import numpy as np

    n = hash_size * highfreq_factor
    g = _block_mean(_to_gray(px), n, n)
    # orthonormal DCT-II matrix (numpy-only; n is tiny, e.g. 32)
    k = np.arange(n)
    dct = np.cos(np.pi * np.outer(k, 2 * k + 1) / (2 * n)) * np.sqrt(2.0 / n)
    dct[0] /= np.sqrt(2.0)
    coefs = dct @ g @ dct.T
    block = coefs[:hash_size, :hash_size].ravel()
    ac = block[1:]  # DC excluded from the median, per the standard recipe
    med = np.median(ac)
    bits = np.concatenate(([block[0] > med], ac > med))
    return _pack_bits(bits)


_HASHERS = {"ahash": ahash_bits, "dhash": dhash_bits, "phash": phash_bits}


def image_hash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "dhash",
    hash_size: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Per-image perceptual hash: ``(id, phash, width, height)``.

    Decodes each payload with the suite's real decoders
    (``multimodal.decode_image_pixels``: PNG/BMP/GIF/JPEG/VP8L) and hashes
    the PIXELS — so the same picture shipped in different containers gets
    the same hash. Undecodable payloads yield a NULL hash (``strict=True``
    raises). The id dtype follows the input schema.
    """
    if method not in _HASHERS:
        raise ValueError(f"method must be one of {sorted(_HASHERS)}, got {method!r}")
    if not 2 <= hash_size <= 8:
        raise ValueError("hash_size must be in [2, 8] (<= 64-bit signatures)")
    from pyspark.sql import types as T

    hasher = _HASHERS[method]
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("phash", T.LongType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def _hash(batches):
        import pandas as _pd

        from sat_bucket_spark.operators.multimodal import decode_image_pixels

        for pdf in batches:
            ids, hashes, widths, heights = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                px = decode_image_pixels(payload)
                if px is None:
                    if strict:
                        raise NotImplementedError(
                            "payload did not decode (lossy VP8/arithmetic "
                            "JPEG need a codec library)"
                        )
                    h = w_ = ht = None
                else:
                    h = hasher(px, hash_size=hash_size)
                    ht, w_ = int(px.shape[0]), int(px.shape[1])
                ids.append(doc_id)
                hashes.append(h)
                widths.append(w_)
                heights.append(ht)
            yield _pd.DataFrame(
                {
                    id_col: ids,
                    "phash": _pd.array(hashes, dtype="Int64"),
                    "width": _pd.array(widths, dtype="Int32"),
                    "height": _pd.array(heights, dtype="Int32"),
                }
            )

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # real decode work: single-file inputs otherwise run the whole batch
    # SERIALLY (one scan partition -> one Python worker); the repartition
    # is a no-op when the source is already split (measured 7x at sf0.1)
    return (
        ensure_parallelism(df.select(id_col, payload_col))
        .mapInPandas(_hash, schema=schema)
    )


def image_profile_table(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "dhash",
    hash_size: int = 8,
    strict: bool = False,
) -> DataFrame:
    """One decode, both signals: ``(id, width, height, channels,
    feature, phash)``.

    A curation pipeline wants a quality gate (pixel features) AND a
    keep-first dedup signature (perceptual hash) over the same corpus;
    composing ``multimodal.decode_and_featurize_images`` with
    :func:`image_hash_table` decodes every payload TWICE, and at scale
    the decode IS the cost. This fuses them into one Arrow-batched pass:
    ``feature`` follows decode_and_featurize_images exactly (real pixel
    stats when the pixels decode, the md5 stub when only the header
    parses, the deterministic fake otherwise), ``phash`` follows
    image_hash_table exactly (NULL when the pixels don't decode) —
    equality with both is pinned by test. ``strict=True`` raises where
    EITHER parent would (unparseable header or undecodable pixels).

    Compose with ``dedup.keep_first_by_signature`` on the gated rows for
    the dedup verdict — no second decode (see bench.py's media stage).
    """
    if method not in _HASHERS:
        raise ValueError(f"method must be one of {sorted(_HASHERS)}, got {method!r}")
    if not 2 <= hash_size <= 8:
        raise ValueError("hash_size must be in [2, 8] (<= 64-bit signatures)")
    from pyspark.sql import types as T

    hasher = _HASHERS[method]
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("width", T.LongType(), True),
            T.StructField("height", T.LongType(), True),
            T.StructField("channels", T.LongType(), True),
            T.StructField("feature", T.ArrayType(T.DoubleType()), True),
            T.StructField("phash", T.LongType(), True),
        ]
    )

    def _profile(batches):
        import hashlib as _hashlib

        import pandas as _pd

        from sat_bucket_spark.operators.multimodal import (
            _fake_decode,
            _pixel_features,
            decode_image_pixels,
            parse_image_header,
        )

        for pdf in batches:
            out = {
                id_col: [], "width": [], "height": [], "channels": [],
                "feature": [], "phash": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                px = decode_image_pixels(payload)
                hdr = parse_image_header(payload)
                if hdr is not None:
                    w, h, c = hdr
                    if px is not None:
                        h, w, c = (int(d) for d in px.shape)
                        feat = _pixel_features(px)
                    else:
                        if strict:
                            raise NotImplementedError(
                                "payload did not decode (lossy VP8/arithmetic "
                                "JPEG need a codec library)"
                            )
                        digest = _hashlib.md5(payload).digest()
                        feat = [b / 255.0 for b in digest[:8]]
                elif strict:
                    raise NotImplementedError(
                        "payload is not a parseable PNG/JPEG/GIF/WebP/BMP/TIFF; "
                        "other formats require a codec library (PIL/libvips), "
                        "unavailable here"
                    )
                else:
                    w, h, c, feat = _fake_decode(payload)
                out[id_col].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feature"].append(feat)
                out["phash"].append(
                    hasher(px, hash_size=hash_size) if px is not None else None
                )
            res = _pd.DataFrame(out)
            res["phash"] = _pd.array(res["phash"], dtype="Int64")
            yield res

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # real decode work: single-file inputs otherwise run serially (one
    # scan partition -> one Python worker); no-op when already split
    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        _profile, schema=schema
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "dhash",
    hash_size: int = 8,
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """All image pairs within ``max_hamming`` perceptual-hash bits — EXACT,
    computed over DISTINCT signatures. Undecodable images (NULL hash)
    never pair. Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``.

    Two disjoint pair classes, both cheaper than a row-level band join:

    - WITHIN a signature (hamming 0, the bulk of a duplicate-heavy
      corpus): a direct equi-self-join on the hash — each pair emitted
      exactly once, no banding, no candidate distinct, no verify rejoin
      (the row-level band join emitted these through ALL ``n_bands``
      bands and paid an ``n_bands``-fold distinct to undo it). AQE
      skew-split spreads a hot signature's partitions.
    - ACROSS signatures: the pigeonhole band join (``n_bands >
      max_hamming`` keeps recall exact, same argument as
      ``dedup.simhash_near_dup_pairs``) runs over the DISTINCT-signature
      table — bounded by signature cardinality, not row count — with the
      hash riding the explode so the ``bit_count`` verify is inline;
      surviving signature pairs expand to id pairs by two hash joins.

    The OUTPUT is still quadratic in cluster size (all-pairs semantics);
    :func:`image_dedup` is the posture that avoids materializing it.
    """
    n_bits = hash_size * hash_size
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands ({n_bands}) must exceed max_hamming ({max_hamming}) "
            "for the banding recall guarantee"
        )
    if n_bits % n_bands:
        raise ValueError(
            f"hash width ({n_bits}) must be divisible by n_bands ({n_bands})"
        )
    from sat_bucket_spark.operators.dedup import near_dup_pairs_by_signature

    sigs = (
        image_hash_table(
            df, id_col=id_col, payload_col=payload_col,
            method=method, hash_size=hash_size,
        )
        .where(F.col("phash").isNotNull())
        .select(id_col, "phash")
    )
    return near_dup_pairs_by_signature(
        sigs, id_col=id_col, sig_col="phash",
        n_bits=n_bits, max_hamming=max_hamming, n_bands=n_bands,
    )


def image_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "dhash",
    hash_size: int = 8,
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """Flag training images perceptually matching any eval/benchmark image.

    The image analog of n-gram/embedding decontamination: a benchmark
    image that leaked into the training set — possibly re-encoded,
    brightness-shifted, or mildly recompressed — must be found and
    dropped. Both sides hash with the same perceptual hash; a training
    image within ``max_hamming`` bits of ANY eval image is contaminated.

    Scale shape: the eval set is benchmark-sized, so its (band, bits)
    pairs AND its hash list BROADCAST; training hashes explode to their
    bands map-side, probe the broadcast band set, and the surviving
    candidates (hash riding along — no rejoin) verify against the
    broadcast eval hashes, all before the ONE exchange: the candidate
    groupBy that also absorbs multi-band duplicates. Banding keeps
    recall exact (pigeonhole, as in :func:`image_near_dup_pairs`); the
    final verdict join shuffles (id, long) sig rows only — AQE
    broadcasts the (contamination-rate-sized) verdict side when small.
    Returns ``(id, is_contaminated, min_hamming)`` for every DECODABLE
    training image (min_hamming NULL when no eval image is within the
    budget; undecodable images are absent — route them by metadata).
    """
    n_bits = hash_size * hash_size
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands ({n_bands}) must exceed max_hamming ({max_hamming})"
        )
    if n_bits % n_bands:
        raise ValueError(
            f"hash width ({n_bits}) must be divisible by n_bands ({n_bands})"
        )
    width = n_bits // n_bands
    mask = (1 << width) - 1

    def hashes(df: DataFrame) -> DataFrame:
        return (
            image_hash_table(
                df, id_col=id_col, payload_col=payload_col,
                method=method, hash_size=hash_size,
            )
            .where(F.col("phash").isNotNull())
            .select(id_col, "phash")
        )

    def bands(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            F.col(id_col),
            F.col("phash"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            (
                                F.shiftright(F.col("phash"), b * width)
                                .bitwiseAND(F.lit(mask))
                            ).alias("band_bits"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("band"),
        ).select(id_col, "phash", "band.band_idx", "band.band_bits")

    train_sigs = stage_cache(hashes(train))
    eval_sigs = hashes(eval_df)
    eval_bands = bands(eval_sigs).select("band_idx", "band_bits").distinct()
    # the hash RIDES the band explode, so candidates need no rejoin (and
    # therefore no shuffle): a train row matching several eval bands
    # reaches the verify up to n_bands times, and the min() aggregate
    # below absorbs the duplicates — cheaper than a distinct exchange
    cand = (
        bands(train_sigs)
        .join(F.broadcast(eval_bands), on=["band_idx", "band_bits"])
        .select(id_col, "phash")
    )
    verified = (
        cand.join(
            F.broadcast(
                eval_sigs.select(F.col("phash").alias("__eval_hash"))
            ),
            F.bit_count(
                F.col("phash").bitwiseXOR(F.col("__eval_hash"))
            ) <= F.lit(max_hamming),
        )
        .groupBy(id_col)
        .agg(
            F.min(
                F.bit_count(F.col("phash").bitwiseXOR(F.col("__eval_hash")))
            ).cast("int").alias("min_hamming")
        )
    )
    return (
        train_sigs.select(id_col)
        .join(verified, id_col, "left")
        .select(
            id_col,
            F.col("min_hamming").isNotNull().alias("is_contaminated"),
            "min_hamming",
        )
    )


def image_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "dhash",
    hash_size: int = 8,
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """Keep-first image dedup: one survivor per perceptual-duplicate set.

    The scale-safe posture for heavy duplicate clusters — a crawl's
    boilerplate image repeated 10^6 times makes the PAIR list
    (:func:`image_near_dup_pairs`) quadratic by definition, but the
    keep-first verdict never needs the pairs: identical hashes collapse
    FIRST (one groupBy bounded by distinct-signature count), the banded
    near-dup join runs over DISTINCT signatures only, and verdicts expand
    back to rows by a hash equi-join. A 10^6-copy cluster costs one
    aggregate row instead of ~5x10^11 pairs.

    Semantics (keep-min-id, SQL-checkable): a row is ``kept`` iff no row
    with a smaller id is within ``max_hamming`` perceptual-hash bits of
    it (identical hashes count: only the minimum id of each exact-hash
    group can survive). Because "exists a smaller-id row with signature
    s'" is exactly "min_id(s') < id", the whole verdict is computable on
    the collapsed signature table. Banding keeps the neighbor search
    exact (pigeonhole, as in :func:`image_near_dup_pairs`).

    Returns ``(id, phash, n_copies, kept)`` for every DECODABLE image:
    ``n_copies`` = rows sharing the exact hash, ``kept`` the verdict.
    Undecodable payloads are absent — route them by metadata.
    """
    from sat_bucket_spark.operators.dedup import keep_first_by_signature

    sigs = (
        image_hash_table(
            df, id_col=id_col, payload_col=payload_col,
            method=method, hash_size=hash_size,
        )
        .where(F.col("phash").isNotNull())
        .select(id_col, "phash")
    )
    return keep_first_by_signature(
        sigs, id_col=id_col, sig_col="phash",
        n_bits=hash_size * hash_size, max_hamming=max_hamming, n_bands=n_bands,
    )


def video_hash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "dhash",
    hash_size: int = 8,
    every_n: int = 10,
    n_frames: int = 3,
    strict: bool = False,
) -> DataFrame:
    """Per-video perceptual signature from REAL sampled-frame decodes.

    The video analog of :func:`image_hash_table`: MJPEG-in-AVI frames are
    extracted (multimodal.parse_avi_frames, same sampling rule as
    sample_video_frames: every ``every_n``-th chunk up to ``n_frames``),
    decoded by the suite's real JPEG decoder, and hashed per frame; the
    per-video ``vhash`` is MAJORITY-VOTE bit pooling over the frame
    hashes — bit j of vhash is 1 iff more than half the sampled frames
    have bit j set (temporal aggregation of frame perceptual hashes; a
    re-encoded or brightness-shifted copy of the same footage pools to
    the same signature under dhash's invariances). Ties (even frame
    counts) round DOWN to 0, so the pooling is deterministic.

    Output: ``(id, n_frames_sampled, frame_hashes array<long>, vhash)``.
    Non-AVI payloads and videos with no decodable frame yield NULL vhash
    (``strict=True`` raises — MP4/MKV frames are the ffmpeg plug-in
    point). Scale shape: Arrow-batched map-only, no shuffle.
    """
    if method not in _HASHERS:
        raise ValueError(f"method must be one of {sorted(_HASHERS)}, got {method!r}")
    if not 2 <= hash_size <= 8:
        raise ValueError("hash_size must be in [2, 8] (<= 64-bit signatures)")
    from pyspark.sql import types as T

    hasher = _HASHERS[method]
    n_bits = hash_size * hash_size
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("n_frames_sampled", T.IntegerType(), True),
            T.StructField("frame_hashes", T.ArrayType(T.LongType()), True),
            T.StructField("vhash", T.LongType(), True),
        ]
    )
    U64 = (1 << 64) - 1

    def _pool(hashes: list) -> int:
        n = len(hashes)
        v = 0
        for j in range(n_bits):
            ones = sum((h >> j) & 1 for h in hashes)
            if 2 * ones > n:
                v |= 1 << j
        return v - (1 << 64) if v & (1 << 63) else v

    def _hash(batches):
        import pandas as _pd

        from sat_bucket_spark.operators.multimodal import (
            decode_image_pixels,
            parse_avi_frames,
        )

        for pdf in batches:
            ids, counts, lists, vhashes = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else None
                parsed = parse_avi_frames(payload) if payload is not None else None
                ids.append(doc_id)
                if parsed is None:
                    if strict:
                        raise NotImplementedError(
                            "payload is not an AVI; MP4/MKV frame "
                            "extraction needs ffmpeg, unavailable here"
                        )
                    counts.append(None)
                    lists.append(None)
                    vhashes.append(None)
                    continue
                _info, frames = parsed
                hashes = []
                for i in range(n_frames):
                    idx = i * every_n
                    if idx >= len(frames):
                        break
                    px = decode_image_pixels(frames[idx])
                    if px is None:
                        if strict:
                            raise NotImplementedError(
                                "sampled frame did not decode (non-MJPEG "
                                "codec needs a library)"
                            )
                        continue
                    hashes.append(hasher(px, hash_size=hash_size) & U64)
                counts.append(len(hashes))
                if hashes:
                    lists.append(
                        [h - (1 << 64) if h & (1 << 63) else h for h in hashes]
                    )
                    vhashes.append(_pool(hashes))
                else:
                    lists.append(None)
                    vhashes.append(None)
            yield _pd.DataFrame(
                {
                    id_col: ids,
                    "n_frames_sampled": _pd.array(counts, dtype="Int32"),
                    "frame_hashes": lists,
                    "vhash": _pd.array(vhashes, dtype="Int64"),
                }
            )

    from sat_bucket_spark.operators.parallel import ensure_parallelism

    # real decode work: single-file inputs otherwise run the whole batch
    # SERIALLY (one scan partition -> one Python worker); the repartition
    # is a no-op when the source is already split (measured 7x at sf0.1)
    return (
        ensure_parallelism(df.select(id_col, payload_col))
        .mapInPandas(_hash, schema=schema)
    )


def video_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "dhash",
    hash_size: int = 8,
    every_n: int = 10,
    n_frames: int = 3,
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """Keep-first video dedup over pooled frame signatures.

    :func:`video_hash_table` -> ``dedup.keep_first_by_signature`` — the
    same distinct-signature collapse as :func:`image_dedup`, so a
    boilerplate clip repeated across a crawl costs one aggregate row.
    Keep-min-id semantics; returns ``(id, vhash, n_copies, kept)`` for
    every video with at least one decodable frame.
    """
    from sat_bucket_spark.operators.dedup import keep_first_by_signature

    sigs = (
        video_hash_table(
            df, id_col=id_col, payload_col=payload_col, method=method,
            hash_size=hash_size, every_n=every_n, n_frames=n_frames,
        )
        .where(F.col("vhash").isNotNull())
        .select(id_col, "vhash")
    )
    return keep_first_by_signature(
        sigs, id_col=id_col, sig_col="vhash",
        n_bits=hash_size * hash_size, max_hamming=max_hamming, n_bands=n_bands,
    )
