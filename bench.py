#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_sec", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "canary": {"pre_sec": ..., "post_sec": ..., "ref_sec": ...,
   "host_factor": ...}}

Queries are materialized with the noop sink (full execution, no driver
collect), so timings measure the engine, not result transfer. The canary
block is the host-factor reading (see the canary section below and
BASELINE.md "Bench notes"); it is NOT part of "value".
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as entry_mod  # noqa: E402
from sat_bucket_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family that matters at scale.
HEADLINE = [
    "scan_project",        # pushdown scan
    "pricing_summary",     # shuffle aggregation
    "revenue_by_nation",   # multi-join (broadcast dim)
    "lonlat_labels",       # binning expression throughput
    "zorder",              # Morton bit-interleave clustering index (added r3)
    "partition_pruning",   # label pruning + agg
    "point_radius",        # haversine filter
    "sessionize",          # window sessionization
    "session_count",       # windowed count
    "swath_offsets",       # agg + window + join
    "rolling_stats",       # rangeBetween event-time rolling features (added r2)
    "dense_grid",          # cross join + left join
    "interval_join",       # range join (broadcast small side)
    "asof_join",           # as-of join: union + single window pass (added r2)
    "interval_binned",     # large-large overlap join via grid binning (added r2)
    "token_count",         # text ops
    "quality_score",
    "repetition",          # Gopher repetition signals, row-local fold (added r2)
    "decontaminate",       # broadcast eval n-gram semi-probe (added r2)
    "pii_scan",            # regex detect + redact chain (added r2)
    "normalize",           # control/punct/whitespace normalization pass (added r2)
    "doc_chunks",          # 1->N chunk fan-out, map-only (added r2)
    "cdc_chunks",          # content-defined boundaries, edit-robust (added r3)
    "heavy_hitters",       # (group,value) count + bounded rank (added r2)
    "tf_idf",              # query-filtered token explode + keyed agg (added r2)
    "inverted_index",      # df-bounded posting lists (added r2)
    "cluster_sizes",       # literal-codebook assignment + count (added r2)
    "semantic_dedup",      # within-cluster cosine pruning, SemDeDup (added r2)
    "classifier_score",    # hashed linear model scoring, map-only (added r2)
    "nb_classifier",       # one-pass NB fit + broadcast-weight scoring (added r3)
    "mix_sources",         # target-mixture downsampling, map-only (added r2)
    "cap_per_source",      # domain cap: group-keyed bounded rank (added r3)
    "quality_filter",      # per-group percent_rank threshold (added r3)
    "embedding_decontaminate",  # broadcast eval set, map-side max cosine (added r3)
    "line_filter",         # C4 line rules, row-local rebuild (added r2)
    "paragraph_dedup",     # corpus-level boilerplate spans (added r2)
    "shard_assign",        # deterministic training-shard shuffle (added r2)
    "minhash",             # explode + groupBy min
    "simhash",             # row-local aggregate exprs
    "minhash_lsh_dedup",   # LSH candidates + exact verify (scale path)
    "dup_clusters",        # iterative star-round connected components (added r2)
    "seq_pack",            # applyInPandas greedy packing recurrence (added r2)
    "simhash_near_dup",    # banded hamming join, exact-recall scale path (added r2)
    "simhash_dedup",       # keep-first over collapsed distinct signatures (added r7)
    "embedding_topk",      # broadcast cross + window topk (exactness baseline)
    "ivf_topk",            # IVF ANN (scale path; added r2)
    "pq_topk",             # PQ ADC ANN: codes-only scan, LUT ranking (added r3)
    "ivfpq_topk",          # IVFADC: coarse pruning + ADC over codes (added r3)
    "lsh_near_dup",        # bucketed embedding near-dup + exact verify (added r2)
    "lsh_buckets",         # vector expression throughput
    "polygon_filter",      # unrolled ray-cast row filter (added r4)
    "points_in_polygons",  # cell-pruned broadcast spatial join (added r4)
    "idw_grid",            # 3x3 fan-out + one-shuffle weighted resample (added r4)
    "nearest_grid",        # min_by over the same fan-out (added r4)
    "decontaminate_bloom", # bounded-bitmap broadcast probe (added r4)
    "dedup_against_bloom", # bloom-routed incremental dedup (added r4)
    "dedup_against_bloom_index",  # persisted-index probe, VERIFIED posture (added r12)
    "bm25_index_topk",     # persisted BM25 retrieval index: build + term point-lookup (added r12)
    "mix_sources_tokens",  # token-mass mixture (added r4)
    "lm_score",            # bigram-LM perplexity-style scoring (added r4)
    "knn_join",            # large-large shuffled kNN join, no broadcast side (added r5)
    "edit_dedup",          # PassJoin signatures + exact Levenshtein verify (added r5)
    "profile_table",       # one-pass multi-column profiling agg (added r5)
    "mad_outliers",        # median/MAD robust z-score, one exchange (added r5)
    "key_skew",            # skew diagnosis: counts + broadcast total + top-N (added r5)
    "dup_spans",           # substring (token-window) dedup: groupBy + flag join + row-local rebuild (added r5)
    "gopher_quality",      # Gopher document-quality rules, row-local folds (added r5)
    "repetition_full",     # full Gopher repetition suite, row-local sorted folds (added r5)
    "url_filter",          # URL-level crawl rules, row-local regex flags (added r5)
    "image_dhash",         # in-plan BMP decode + perceptual hash, map-only (added r6)
    "image_near_dup",      # banded perceptual-hash join, ids-only shuffle (added r6)
    "image_dedup",         # keep-first: distinct-signature banding, cluster-size-proof (added r7)
    "audio_quality",       # real-PCM quality gate incl. FFT spectral shape (added r6)
    "exif_meta",           # JPEG APP1/TIFF walk, both byte orders, map-only (added r6)
    "html_extract",        # real HTML parse + boilerplate heuristic, map-only (added r7)
    "url_normalize",       # canonical-URL dedup: map-only normalize + one window (added r9)
    "cc_update",           # incremental cluster-map maintenance: contracted solve + one broadcast pass (added r12)
    "pagerank_update",     # warm-start rank refresh: seeded distributed rounds, mean-seeded new nodes (added r13)
    "host_rank",           # crawl host authority: link derivation + routed PageRank (added r9)
    "pagerank",            # order-graph PageRank: 298k edges -> distributed rounds (added r9)
    "image_profile",       # fused decode: features + perceptual hash in ONE pass (added r9)
]


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


# --- storage-state robustness (VERDICT r13 task #1) --------------------------
# These keys are FILE-COUNT-bound: they commit or open hundreds of small
# files (hive partition dirs, index posting/band/code files), so their
# single-shot timing tracks the host's metadata-storage state, not repo
# code — BENCH_r13.json recorded 5 band breaches (2.2-3.1x) on keys whose
# code had not changed, in a window its own smallfiles canary read 1.80.
# When the in-run smallfiles_factor exceeds STRESS_THRESHOLD, each of
# these keys is recorded as the MEDIAN of STRESS_REPS in-run reps with the
# per-rep readings kept in the artifact ("reps" field) — one metadata
# stall can no longer enter the permanent record as the key's number, and
# a reader of the JSON alone can see the spread that justified the median.
FILE_COUNT_BOUND = frozenset({
    "bucket_write", "bucket_read_extent", "bucket_read_polygon",
    "bucket_merge", "bucket_stream_ingest",
    "minhash_index_build", "minhash_index_probe",
    "bloom_index_build", "bloom_index_probe",
    "semantic_index_probe", "ann_index_search",
    "bm25_index_topk", "dedup_against_bloom_index",
})
STRESS_THRESHOLD = 1.4
STRESS_REPS = 3


def video_corpus(docs, n_clips: int = 24, subset_mod: int = 3):
    """Deterministic MJPEG-AVI corpus over the documents table.

    ``n_clips`` distinct 3-frame 16x16 clips are encoded ONCE driver-side
    and attached as binary literals via element_at(doc_id % n_clips) —
    every clip a planted duplicate cluster, the worst case for dedup.
    ``subset_mod`` thins the corpus (every Nth doc) to keep the bench's
    real-decode budget at ~60k frame decodes at sf0.1. Shared with
    probe_sf1.py so the bench and the scaling probe measure one fixture.
    """
    import numpy as np
    from pyspark.sql import functions as F

    from sat_bucket_spark.operators.jpeg import encode_jpeg_baseline
    from sat_bucket_spark.operators.multimodal import build_avi_bytes

    rng = np.random.default_rng(8)
    avis = []
    for _ in range(n_clips):
        frames = [
            encode_jpeg_baseline(
                rng.integers(0, 255, (16, 16)).astype(np.uint8),
                np.ones((8, 8)),
                np.ones((8, 8)),
            )
            for _f in range(3)
        ]
        avis.append(build_avi_bytes(frames, 16, 16))
    # index by the post-thinning ordinal (doc_id / subset_mod), not doc_id
    # itself: surviving ids are multiples of subset_mod, and any common
    # factor with n_clips would silently drop clips from the corpus
    payload = F.element_at(
        F.array(*[F.lit(a) for a in avis]),
        (F.floor(F.col("doc_id") / subset_mod) % n_clips + 1).cast("int"),
    )
    return (
        docs.where(F.col("doc_id") % subset_mod == 0)
        .select("doc_id")
        .withColumn("payload", payload)
    )


# --- host-factor canary (VERDICT r9 task #1) -------------------------------
# A FROZEN pure-Spark workload whose plan cannot drift with repo code: its
# timing moves only when the HOST does (co-tenant load, CPU contention).
# r9 burned four full bench runs on a uniform ~1.28x co-tenant shift that
# took a manual worktree re-bench of the r8 commit to attribute; with the
# canary, every BENCH_rN carries its own host reading and closing
# comparisons self-normalize (host_factor = canary median / pinned ref).
# DO NOT change the workload, rep count, or CANARY_REF_SEC without
# re-pinning the reference and noting it in BASELINE.md — the factor is
# only meaningful against a fixed definition.
#
# Workload: 32-partition hash aggregate over 20M synthetic rows (shuffle +
# whole-stage codegen arithmetic) + an 8-partition 2M-row parquet write
# (task scheduling + local I/O) — the two cost classes the query set pays.
# Pure pyspark.sql; no repo imports. The factor is comparable ONLY at the
# standard session shape (local[32], the driver default): fewer cores slow
# the canary exactly like they slow the queries, which is correct for
# within-run normalization but not against the 32-core reference pin.
# r11: raised 3 -> 5 per the r10 calibration finding (medians-of-3 of
# ±25% reps carry ~±15% factor noise — enough to overcorrect a same-day
# comparison; medians-of-5 tighten to ~±10% for +2 canary runs/bench).
# The WORKLOAD and reference are unchanged: the median estimates the same
# population quantity, so CANARY_REF_SEC stays comparable (noted in
# BASELINE.md "Bench notes").
CANARY_REPS = 5
# Pinned 2026-08-15 (r10 session): median of 6 warm reps on this host at
# 5/15-min load 2.6/2.4 (quiet by the r9 protocol's uptime check); reps
# spanned 1.75-2.80 s — single-rep jitter is ±25%, which is why the factor
# uses pre+post medians of CANARY_REPS each, not one shot.
CANARY_REF_SEC = 2.36


def _canary_sec(spark, out_dir: str) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    row = (
        spark.range(0, 20_000_000, 1, 32)
        .select(
            ((F.col("id") * 2654435761) % 1_000_003).alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum("s").alias("sv"),
            F.sum("c").alias("sc"),
            F.count(F.lit(1)).alias("nk"),
        )
        .collect()[0]
    )
    # fixed-output integrity pin: a changed result means the workload
    # definition drifted and the factor is no longer comparable
    assert (row["sc"], row["nk"]) == (20_000_000, 1_000_003), row
    (
        spark.range(0, 2_000_000, 1, 8)
        .selectExpr("id", "id * 3 as y")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "canary_write"))
    )
    return time.perf_counter() - t0


def _canary_median(spark, out_dir: str) -> float:
    import statistics

    return round(
        statistics.median(_canary_sec(spark, out_dir) for _ in range(CANARY_REPS)), 3
    )


# --- write canary (VERDICT r11 task #6) -------------------------------------
# The CPU canary above is BLIND to heavy-write disk contention: its workload
# is a CPU aggregate plus one small (~30 MB) parquet write, so an r11 final
# run carried a 39.7 s bucket_write I/O stall (band 2.3-4.6) at a benign CPU
# factor of 0.726 and the discard needed a manual 5-rep re-measure. This
# SEPARATE frozen workload writes ~100 MB of incompressible parquet (md5-hex
# strings defeat snappy) across 8 tasks — its timing moves with storage
# pressure, not repo code. Kept apart from _canary_sec so the established
# CPU factor stays comparable with every r9+ record; a wild bucket/ingest
# key with a benign CPU factor but an elevated WRITE factor is a
# storage-stall discard, receipted same-session.
WRITE_CANARY_REPS = 3
# Pinned 2026-08-15 (r12 session): median of 5 warm reps 1.31-1.60 s on
# this host at 5/15-min load 4.6/4.0 (~208 MB written per rep; cold first
# rep 5.64 s excluded — the median-of-3 absorbs one cold shot). See
# BASELINE.md "Bench notes" for the pin protocol and the load caveat.
WRITE_CANARY_REF_SEC = 1.50


def _write_canary_sec(spark, out_dir: str) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 3_000_000, 1, 8)
        .select(
            "id",
            F.md5(F.col("id").cast("string")).alias("a"),
            F.md5((F.col("id") + 7).cast("string")).alias("b"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "canary_write_io"))
    )
    return time.perf_counter() - t0


def _write_canary_median(spark, out_dir: str) -> float:
    import statistics

    return round(
        statistics.median(
            _write_canary_sec(spark, out_dir) for _ in range(WRITE_CANARY_REPS)
        ),
        3,
    )


# --- small-files write canary (VERDICT r12 task #2) --------------------------
# The bulk write canary above streams ~200 MB into 8 files — blind to
# FILE-COUNT-bound storage pressure, which is what the bucket family
# actually pays: bucket_write/merge/stream_ingest commit ~648 hive
# directories of small files each (one FileOutputCommitter rename + dir
# create per partition). The r12 verdict reproduced a 1.7-1.9x
# bucket-family drift across two independent full runs on bit-identical
# code with BOTH established canaries benign — exactly this blind spot.
# This third frozen workload writes 648 partition directories x 1 small
# (~25 KB) file from 8 tasks (the same repartition(8, col) +
# partitionBy shape as write_bucket), so metadata/rename-storm pressure
# is detectable in-run: a wild bucket key with benign CPU and bulk-write
# factors but an elevated SMALLFILES factor is a storage-metadata-stall
# discard, receipted same-session. Same comparability contract as the
# others: do not change the workload or reps without re-pinning.
SMALLFILES_CANARY_REPS = 3
# Pinned 2026-08-16 (r13 session): median of 5 warm reps on this host —
# see BASELINE.md "Bench notes" for the reps and load reading.
SMALLFILES_CANARY_REF_SEC = 1.65


def _smallfiles_canary_sec(spark, out_dir: str) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 648_000, 1, 8)
        .select(
            (F.col("id") % 648).alias("p"),
            "id",
            F.md5(F.col("id").cast("string")).alias("a"),
        )
        .repartition(8, "p")
        .write.mode("overwrite")
        .partitionBy("p")
        .parquet(os.path.join(out_dir, "canary_smallfiles"))
    )
    return time.perf_counter() - t0


def _smallfiles_canary_median(spark, out_dir: str) -> float:
    import statistics

    return round(
        statistics.median(
            _smallfiles_canary_sec(spark, out_dir)
            for _ in range(SMALLFILES_CANARY_REPS)
        ),
        3,
    )


def _release_state(spark) -> None:
    """Benchmark hygiene: measure every query from a clean executor state.

    Operators that break lineage (localCheckpoint in the LSH/SimHash paths,
    persist in the ingest routine) pin executor memory until the caller
    releases them; across 35+ sequential queries that accumulation degrades
    later queries 2-4x (GC pressure), which would charge query N for query
    N-1's retained state."""
    spark.catalog.clearCache()
    for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
        rdd.unpersist()


def main() -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark(
        app_name="sat-bucket-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if str(cpus).isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # JVM/codegen warmup on a tiny query so q1 isn't charged for startup
    _materialize(queries["distinct_sort"](spark, sf_dir))

    import shutil as _shutil
    import tempfile as _tempfile

    canary_dir = _tempfile.mkdtemp(prefix="bench_canary_")
    # a failed bench run (integrity-gate AssertionError, query error) exits
    # before the explicit rmtree below — don't leak the canary's parquet
    import atexit as _atexit

    _atexit.register(_shutil.rmtree, canary_dir, ignore_errors=True)
    canary_pre = _canary_median(spark, canary_dir)
    write_pre = _write_canary_median(spark, canary_dir)
    smallfiles_pre = _smallfiles_canary_median(spark, canary_dir)

    import statistics as _stats

    state = {
        "stressed": (
            smallfiles_pre / SMALLFILES_CANARY_REF_SEC > STRESS_THRESHOLD
            # opt-in forced reps: smoke-testing the rep machinery, or a
            # closing run that wants the median-of-3 posture regardless
            or os.environ.get("SPARK_GRAFT_FORCE_STRESS") == "1"
        )
    }
    timings: dict[str, float] = {}
    reps_recorded: dict[str, list[float]] = {}

    def _record(name: str, run_once) -> None:
        """Record one key. ``run_once()`` must be re-runnable (fresh temp
        dirs per rep where it writes) and return elapsed seconds. Under
        storage stress, file-count-bound keys take the median of
        STRESS_REPS reps; per-rep readings land in the artifact."""
        n = STRESS_REPS if (state["stressed"] and name in FILE_COUNT_BOUND) else 1
        secs = []
        for _ in range(n):
            secs.append(round(run_once(), 3))
            _release_state(spark)
        if n > 1:
            reps_recorded[name] = secs
        timings[name] = round(_stats.median(secs), 3)

    def _timed(fn, *a, **kw):
        t0 = time.perf_counter()
        fn(*a, **kw)
        return time.perf_counter() - t0

    for name in HEADLINE:
        fn = queries[name]
        _record(name, lambda fn=fn: _timed(lambda: _materialize(fn(spark, sf_dir))))

    # dup_spans production posture: hashed grams. NOT comparable to the
    # `dup_spans` headline key row-for-row in bytes shuffled: same operator,
    # same output shape, but grams exchange as 60-bit longs instead of exact
    # strings (~k-fold fewer shuffle bytes — the 100 TB posture;
    # equality-modulo-collisions is asserted in tests/test_operators.py).
    from pyspark.sql import functions as F

    from sat_bucket_spark.operators.dedup import remove_duplicate_spans

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    hashed = remove_duplicate_spans(
        docs, k=4, min_count=2, out="clean",
        removed_count_col="n_removed", hash_grams=True,
    )
    _materialize(
        hashed.select(
            "doc_id", "n_removed",
            F.length("clean").cast("long").alias("n_chars_clean"),
            F.md5("clean").alias("clean_md5"),
        )
    )
    timings["dup_spans_hashed"] = round(time.perf_counter() - t0, 3)
    _release_state(spark)

    # Video perceptual hashing + keep-first dedup over REAL MJPEG-AVI
    # decodes (the only operator family with neither a bench key nor a
    # probe row until r8). The fixture corpus is built OUTSIDE the timed
    # window: 24 distinct 3-frame clips encoded once driver-side
    # (jpeg.encode_jpeg_baseline -> multimodal.build_avi_bytes), mapped
    # over every 3rd document as binary literals — so the timed work is
    # the production path: AVI container walk -> 3 real JPEG frame
    # decodes -> per-frame dhash -> majority-vote bit pooling (and for
    # video_dedup, the distinct-signature keep-first collapse on top).
    from sat_bucket_spark.operators.imagehash import video_dedup, video_hash_table

    vcorpus = video_corpus(docs)
    t0 = time.perf_counter()
    _materialize(video_hash_table(vcorpus, every_n=1, n_frames=3))
    timings["video_hash"] = round(time.perf_counter() - t0, 3)
    _release_state(spark)
    t0 = time.perf_counter()
    vd = video_dedup(vcorpus, every_n=1, n_frames=3, max_hamming=6, n_bands=8)
    _materialize(vd)
    timings["video_dedup"] = round(time.perf_counter() - t0, 3)
    # integrity gates (outside the timed window): every clip decoded and
    # pooled (no NULL-vhash drops), and the keep-first collapse actually
    # collapsed — survivors are bounded by the 24 planted distinct clips
    n_corpus = vcorpus.count()
    n_distinct = vcorpus.select("payload").distinct().count()
    vd_rows = vd.groupBy("kept").count().collect()
    n_rows = sum(r["count"] for r in vd_rows)
    n_kept = sum(r["count"] for r in vd_rows if r["kept"])
    if n_rows != n_corpus:
        raise AssertionError(f"video_dedup dropped clips: {n_rows} != {n_corpus}")
    if n_kept != n_distinct:  # planted clips are >=21 hamming bits apart
        raise AssertionError(
            f"keep-first survivors {n_kept} != {n_distinct} distinct clips"
        )
    _release_state(spark)

    # Warm-start PageRank refresh, NIGHTLY posture (r13 verdict task #5):
    # the headline `pagerank_update` key builds its 6-round standing map
    # in-entry (required for the DuckDB oracle to replay the whole
    # derivation), so ~3/4 of that recorded number is standing-build cost
    # the nightly refresh never pays. This key times the refresh ALONE
    # against a PRE-MATERIALIZED standing map read back from parquet —
    # the cost update_pagerank exists to minimize, and the number the
    # operator's scale story should be judged on.
    import shutil as _shutil1
    import tempfile as _tempfile1

    from sat_bucket_spark.operators.graph import pagerank as _pr
    from sat_bucket_spark.operators.graph import update_pagerank as _upr

    pwork = _tempfile1.mkdtemp(prefix="bench_prw_")
    try:
        pr_old = entry_mod._pagerank_fixture_edges(spark, sf_dir)
        pr_full = pr_old.unionByName(
            entry_mod._pagerank_update_new_edges(spark, sf_dir)
        )
        standing_path = os.path.join(pwork, "standing")
        _pr(
            pr_old, damping=0.85, iterations=6, directed=False,
            driver_threshold=0,
        ).write.parquet(standing_path)
        standing = spark.read.parquet(standing_path)
        t0 = time.perf_counter()
        _materialize(
            _upr(
                standing, pr_full, damping=0.85, iterations=4,
                directed=False, driver_threshold=0,
            )
        )
        timings["pagerank_update_refresh"] = round(time.perf_counter() - t0, 3)
    finally:
        _shutil1.rmtree(pwork, ignore_errors=True)
    _release_state(spark)

    # ANN index search: the train-once/search-many production posture.
    # Index build (train + corpus encode + partitioned write) happens
    # OUTSIDE the timed window — it is paid once per corpus, not per
    # query batch; the timed number is what serving pays: LUT build +
    # probed-partition scan + ADC ranking. Gate: the search must read
    # only the probed cluster partitions, never the whole codes table.
    import shutil as _shutil0
    import tempfile as _tempfile0

    from sat_bucket_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    awork = _tempfile0.mkdtemp(prefix="bench_ann_")
    try:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).withColumn(
            "embedding", F.transform("embedding", lambda x: x.cast("double"))
        )
        aidx = os.path.join(awork, "index")
        build_ivfpq_index(emb, aidx, dim=64, n_clusters=16, m=4, ksub=16)
        queries = (
            emb.where(F.col("vec_id") % 97 == 0)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        )
        _record(
            "ann_index_search",
            lambda: _timed(
                lambda: _materialize(
                    ivfpq_index_topk(spark, aidx, queries, k=10, n_probe=2)
                )
            ),
        )
        res = ivfpq_index_topk(spark, aidx, queries, k=10, n_probe=2)
        plan = res._jdf.queryExecution().executedPlan().toString()
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        if not pf or "__cluster" not in pf.group(1):
            raise AssertionError("index search scan is not partition-pruned")
        n_q = queries.count()
        n_res = res.groupBy("query_id").count().count()
        if n_res != n_q:
            raise AssertionError(f"search lost queries: {n_res} != {n_q}")
        # recall gate (untimed): plan gates can't see a wrong centroid
        # assignment or stale-codebook encode — those stay partition-pruned
        # while returning near-chance neighbors (chance = k/N ~ 0.005 at
        # sf0.1). Floor pinned from the healthy index on this corpus
        # (uniform random vectors, the PQ worst case).
        from sat_bucket_spark.operators.similarity import (
            brute_force_topk,
            recall_at_k,
        )

        exact = brute_force_topk(emb, queries, k=10, metric="l2")
        rec = recall_at_k(res, exact)
        if not rec >= 0.10:
            raise AssertionError(f"ann_index_search recall@10 degraded: {rec:.3f}")
    finally:
        _shutil0.rmtree(awork, ignore_errors=True)
    _release_state(spark)

    # Persisted MinHash dedup index (added r10): the text analog of the
    # ANN index rows — build the standing corpus's band rows + 60-bit
    # shingle sets once, then probe a nightly batch WITHOUT touching
    # corpus text. Integrity gates: the probe drops some but not all of
    # the batch (half are planted near-dups), and its plan never scans
    # the corpus parquet.
    from sat_bucket_spark.operators.dedup import (
        build_minhash_index,
        minhash_dedup_against_index,
    )

    mwork0 = _tempfile0.mkdtemp(prefix="bench_mhidx_")
    try:
        corpus = docs.where(F.col("doc_id") % 3 != 0)
        batch_path = os.path.join(mwork0, "batch")
        docs.where(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.when(
                F.col("doc_id") % 6 == 0, F.concat(F.col("text"), F.lit(" tail"))
            )
            .otherwise(F.concat(F.lit("fresh "), F.col("doc_id"), F.lit(" unseen")))
            .alias("text"),
        ).write.parquet(batch_path)
        mh = {"i": 0}

        def _mh_build():
            # fresh dir per rep: a rebuild into an existing index would
            # measure append semantics, not the build
            mh["i"] += 1
            mh["midx"] = os.path.join(mwork0, f"index{mh['i']}")
            return _timed(
                build_minhash_index, corpus, mh["midx"],
                n_hashes=8, n_bands=4, shingle_size=8,
            )

        _record("minhash_index_build", _mh_build)
        batch = spark.read.parquet(batch_path)

        def _mh_probe():
            t0 = time.perf_counter()
            surv = minhash_dedup_against_index(batch, mh["midx"], min_jaccard=0.5)
            mh["surv"], mh["n_surv"] = surv, surv.count()
            return time.perf_counter() - t0

        _record("minhash_index_probe", _mh_probe)
        surv, n_surv = mh["surv"], mh["n_surv"]
        n_batch = batch.count()
        if not 0 < n_surv < n_batch:
            raise AssertionError(
                f"index probe vacuous: {n_surv}/{n_batch} survivors"
            )
        plan = surv._jdf.queryExecution().executedPlan().toString()
        if "documents.parquet" in plan:
            raise AssertionError("index probe scanned the corpus parquet")
    finally:
        _shutil0.rmtree(mwork0, ignore_errors=True)
    _release_state(spark)

    # Persisted Bloom exact-dedup index (added r11): the third persisted-
    # index leg (MinHash bands / IVFPQ codes / Bloom bitmap). Build the
    # standing corpus's bitmap once; the nightly probe's only inputs are
    # the batch and the few-MB bitmap — ZERO corpus access, gated on the
    # plan. Batch: 1/3 of docs re-keyed, half exact text dups of corpus
    # rows, half novel.
    from sat_bucket_spark.operators.dedup import (
        build_bloom_index,
        dedup_exact_against_bloom_index,
    )

    bwork0 = _tempfile0.mkdtemp(prefix="bench_bloomidx_")
    try:
        corpus_path = os.path.join(bwork0, "corpus")
        docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text").write.parquet(
            corpus_path
        )
        batch_path = os.path.join(bwork0, "batch")
        # dup half: corpus rows re-keyed (exact text duplicates by
        # construction at any SF); novel half: marked texts
        dups = docs.where(
            (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0)
        ).select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        novel = docs.where(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.lit("novel "), F.col("doc_id"), F.col("text")).alias("text"),
        )
        dups.unionByName(novel).write.parquet(batch_path)
        bl = {"i": 0}

        def _bloom_build():
            bl["i"] += 1
            bl["bidx"] = os.path.join(bwork0, f"index{bl['i']}")
            return _timed(
                build_bloom_index,
                spark.read.parquet(corpus_path), bl["bidx"], ["text"],
            )

        _record("bloom_index_build", _bloom_build)
        bidx = bl["bidx"]
        batch = spark.read.parquet(batch_path)

        def _bloom_probe():
            t0 = time.perf_counter()
            surv = dedup_exact_against_bloom_index(batch, bidx)
            bl["surv"], bl["n_surv"] = surv, surv.count()
            return time.perf_counter() - t0

        _record("bloom_index_probe", _bloom_probe)
        surv, n_surv = bl["surv"], bl["n_surv"]
        n_batch = batch.count()
        if not 0 < n_surv < n_batch:
            raise AssertionError(
                f"bloom index probe vacuous: {n_surv}/{n_batch} survivors"
            )
        plan = surv._jdf.queryExecution().executedPlan().toString()
        if "/corpus" in plan:
            raise AssertionError("bloom index probe scanned the corpus parquet")
        # exactness anchor (outside the timed window): the unverified
        # probe must agree with the corpus-verified one at this bit sizing
        n_verified = dedup_exact_against_bloom_index(
            batch, bidx, verify_corpus=spark.read.parquet(corpus_path)
        ).count()
        if n_surv != n_verified:
            raise AssertionError(
                f"unverified probe over-dropped: {n_surv} != {n_verified} "
                "(resize n_bits)"
            )
    finally:
        _shutil0.rmtree(bwork0, ignore_errors=True)
    _release_state(spark)

    # Persisted IVFPQ semantic-dedup gate (added r12): the embedding leg
    # of the standing-archive matrix. Index built OUTSIDE the timed
    # window (ann_index_build already prices the encode); the timed probe
    # is cluster-assign + probed-partition codes join + exact-cosine
    # verify over candidate pairs. Candidate-complete margin because the
    # test corpus (random unit vectors) is the PQ worst case — production
    # corpora with trained codebooks set a finite margin and the verify
    # is candidate-bounded. Batch: 1/5 of archive rows re-keyed (exact
    # embedding copies — dropped) + negated vectors (cosine -1 — kept).
    from sat_bucket_spark.operators.similarity import (
        build_ivfpq_index,
        semantic_dedup_against_index,
    )

    swork0 = _tempfile0.mkdtemp(prefix="bench_semidx_")
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        arch_path = os.path.join(swork0, "archive")
        emb.where(F.col("vec_id") % 3 != 0).write.parquet(arch_path)
        archive = spark.read.parquet(arch_path)
        dups = archive.where(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
        novel = emb.where(F.col("vec_id") % 3 == 0).select(
            (F.col("vec_id") + 2_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
        batch_path = os.path.join(swork0, "batch")
        dups.unionByName(novel).write.parquet(batch_path)
        sidx = os.path.join(swork0, "index")
        build_ivfpq_index(
            archive, sidx, dim=64, n_clusters=8, m=4, ksub=16,
            store_vectors=True,
        )
        batch = spark.read.parquet(batch_path)
        sm = {}

        def _sem_probe():
            t0 = time.perf_counter()
            surv = semantic_dedup_against_index(
                batch, sidx, min_cosine=0.9, n_probe=2, adc_margin=None,
                verify_vectors="index",
            )
            sm["surv"], sm["n_surv"] = surv, surv.count()
            return time.perf_counter() - t0

        _record("semantic_index_probe", _sem_probe)
        surv, n_surv = sm["surv"], sm["n_surv"]
        n_batch = batch.count()
        if not 0 < n_surv < n_batch:
            raise AssertionError(
                f"semantic index probe vacuous: {n_surv}/{n_batch} survivors"
            )
        # plan gate on the UNVERIFIED posture: the verified path eagerly
        # materializes its candidate cache at call time, so the codes scan
        # (where the pruning lives) is behind the cache in the final plan
        plan = (
            semantic_dedup_against_index(
                batch, sidx, min_cosine=0.9, n_probe=2
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re as _re0

        pfs = _re0.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if not any("__cluster" in pf and " IN " in pf for pf in pfs):
            raise AssertionError("semantic probe lost its partition pruning")
    finally:
        _shutil0.rmtree(swork0, ignore_errors=True)
    _release_state(spark)

    # WET end-to-end curation stage: the flagship LLM-pipeline story as ONE
    # measured number — WET ingest -> parquet staging -> (gopher quality +
    # URL gate + substring-span dedup) funnel -> JSONL shard export. NOT
    # comparable to per-operator keys (format ingest + two writes on the
    # ends); fixture archives are built OUTSIDE the timed window from the
    # documents table. Staging the ingest to parquet before the multi-pass
    # curation is the production posture: dup_spans self-joins its input,
    # and re-running a WARC parse per branch would charge ingest twice.
    import glob as _glob2
    import shutil as _shutil
    import tempfile as _tempfile

    from sat_bucket_spark.operators.metrics import observe_funnel
    from sat_bucket_spark.operators.text import gopher_quality_flags
    from sat_bucket_spark.operators.urls import url_quality_flags
    from sat_bucket_spark.warc import build_warc_bytes, read_wet
    from sat_bucket_spark.writers import write_jsonl_shards

    wwork = _tempfile.mkdtemp(prefix="bench_wet_")
    try:
        crawl = os.path.join(wwork, "crawl")
        os.makedirs(crawl)
        fixture = docs.select(
            "doc_id",
            # serial marker keeps every WET text unique (h64 content ids must
            # not collide on literal duplicate source docs)
            F.concat("text", F.lit(" wetdoc"), F.col("doc_id")).alias("text"),
            F.concat(
                F.lit("http://"),
                F.when(F.col("doc_id") % 7 == 0, F.lit("spam.example"))
                .otherwise(F.concat(F.lit("host"), F.col("doc_id") % 13, F.lit(".example"))),
                F.lit("/d"), "doc_id",
            ).alias("url"),
        ).collect()
        n_fixture = len(fixture)
        n_segments = 8
        for s in range(n_segments):
            recs = [
                {
                    "type": "conversion",
                    "payload": r["text"].encode(),
                    "WARC-Target-URI": r["url"],
                    "WARC-Date": "2026-08-01T00:00:00Z",
                }
                for i, r in enumerate(fixture)
                if i % n_segments == s
            ]
            with open(os.path.join(crawl, f"seg-{s}.warc.gz"), "wb") as fh:
                fh.write(build_warc_bytes(recs, gzip_members=True))

        staging = os.path.join(wwork, "staged")
        export = os.path.join(wwork, "export")
        sc = spark.sparkContext
        t0 = time.perf_counter()
        sc.setJobGroup("wet-curate", "ingest + funnel + export")
        read_wet(spark, crawl).write.parquet(staging)
        staged = spark.read.parquet(staging)
        funnel = observe_funnel(
            staged,
            [
                (
                    "quality",
                    lambda d: gopher_quality_flags(
                        d, min_words=20, min_stopword_hits=1,
                        passthrough=("url", "text"),
                    ).where("keep").select("doc_id", "url", "text"),
                ),
                (
                    "url",
                    lambda d: url_quality_flags(
                        d, blocked_domains=("spam.example",),
                        passthrough=("text",),
                    ).where("keep").select("doc_id", "url", "text"),
                ),
                (
                    "dup_spans",
                    lambda d: remove_duplicate_spans(
                        d, k=4, min_count=2, removed_count_col="n_removed"
                    ),
                ),
            ],
        )
        write_jsonl_shards(funnel.df, export, n_shards=8, compression=None)
        sc.setJobGroup("wet-curate-done", "")
        timings["wet_curate"] = round(time.perf_counter() - t0, 3)
        counts = funnel.counts()
        # integrity gates (outside the timed window): every fixture row
        # ingested; the funnel only narrows; the URL gate actually fired
        # (1/7 spam hosts); the export holds exactly the surviving rows
        if counts["input"] != n_fixture:
            raise AssertionError(f"wet ingest lost rows: {counts} != {n_fixture}")
        if not (counts["input"] >= counts["quality"] >= counts["url"]):
            raise AssertionError(f"funnel not monotone: {counts}")
        if counts["url"] >= counts["quality"]:
            raise AssertionError(f"URL gate vacuous: {counts}")
        # since the r9 writer fix (preimage-routed hash exchange, no
        # range-sampling pass) the dup_spans observation reads exactly 1x;
        # the >= comparison tolerates the historical 2x shape, and the
        # export read-back below stays the ground truth that span dedup
        # rebuilt rather than dropped rows
        if counts["dup_spans"] < counts["url"]:
            raise AssertionError(f"span dedup dropped rows (must rebuild): {counts}")
        n_exported = spark.read.json(os.path.join(export, "shard=*")).count()
        if n_exported != counts["url"]:
            raise AssertionError(
                f"export mismatch: {n_exported} != {counts['url']}"
            )
        # the funnel itself adds zero jobs: the group holds the two writes
        # plus AQE's per-exchange jobs for the span-dedup DAG (measured 14
        # at sf0.01) — a per-STAGE count() funnel would roughly double
        # this; the bound catches that regression class
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("wet-curate"))
        if n_jobs > 18:
            raise AssertionError(f"wet_curate launched {n_jobs} jobs (> 18)")
    finally:
        _shutil.rmtree(wwork, ignore_errors=True)
    _release_state(spark)

    # Dedup -> leakage-safe-split contract as ONE stage (r11): the near-dup
    # pairs the curation funnel produces anyway feed leakage_safe_splits,
    # so duplicate clusters can never straddle train/eval — the eval-set
    # contamination dedup exists to prevent, closed at split time. Timed:
    # pair engine + connected components + split assignment + materialize.
    # Gates (outside the window): pairs exist (straddle check non-vacuous),
    # ZERO pairs straddle split labels, every split non-empty with train
    # the majority.
    from sat_bucket_spark.operators.dedup import minhash_lsh_dedup_pairs
    from sat_bucket_spark.operators.sampling import leakage_safe_splits

    t0 = time.perf_counter()
    pairs = minhash_lsh_dedup_pairs(
        docs, n_hashes=16, n_bands=4, shingle_size=8, min_jaccard=0.1
    ).select("id_a", "id_b")
    split_df = leakage_safe_splits(
        docs, pairs, weights={"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split_group", "split")
    _materialize(split_df)
    timings["curate_and_split"] = round(time.perf_counter() - t0, 3)
    lab = split_df.select("doc_id", "split")
    straddle = (
        pairs.join(lab.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("split", "split_a")
        .join(lab.withColumnRenamed("doc_id", "id_b"), "id_b")
        .where(F.col("split_a") != F.col("split"))
        .count()
    )
    n_pairs = pairs.count()
    if n_pairs < 1:
        raise AssertionError("curate_and_split vacuous: no near-dup pairs")
    if straddle != 0:
        raise AssertionError(
            f"{straddle}/{n_pairs} near-dup pairs straddle split labels"
        )
    split_counts = {
        r["split"]: r["n"]
        for r in split_df.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    if set(split_counts) != {"train", "val", "test"} or (
        split_counts["train"] <= max(split_counts["val"], split_counts["test"])
    ):
        raise AssertionError(f"degenerate split assignment: {split_counts}")
    _release_state(spark)

    # Raw-archive HTML curation stage: the crawls-without-a-WET-sidecar
    # counterpart of wet_curate — response records with HTML bodies (1 in
    # 13 pages windows-1252 with an HTTP-header charset and curly-quote
    # bytes that are INVALID UTF-8) -> read_warc_html (HTTP head split,
    # charset-honoring decode, boilerplate removal, link extraction in
    # the SAME decode pass) -> quality gate -> canonical-URL keep-first
    # dedup (1 in 9 pages has a planted mirror: tracking params + case +
    # trailing-slash spelling of the same URL) -> host-authority gate
    # (host link graph -> directed PageRank; host h12 gets no inlinks by
    # construction, so its teleport-floor rank is the drop) -> span dedup
    # -> export. Gates: ingest completeness, non-UTF-8 survival (the
    # curly quotes must reach the export intact), funnel monotone, URL +
    # authority stages each actually fire, export read-back, job bound.
    from sat_bucket_spark.operators.graph import pagerank
    from sat_bucket_spark.operators.urls import host_link_edges, url_dedup, url_host_expr
    from sat_bucket_spark.warc import read_warc_html

    hwork = _tempfile.mkdtemp(prefix="bench_html_")
    try:
        hcrawl = os.path.join(hwork, "crawl")
        os.makedirs(hcrawl)
        hfixture = docs.select(
            "doc_id",
            F.concat("text", F.lit(" htmldoc"), F.col("doc_id")).alias("text"),
        ).collect()
        n_hfix = len(hfixture)
        n_mirror = sum(1 for r in hfixture if r["doc_id"] % 9 == 0)

        def _resp(doc_id, text):
            # cross-host nav link: target (doc_id*7+1) % 12 covers hosts
            # h0..h11 uniformly, so h12 never receives an inlink — the
            # authority gate's deterministic drop
            ref = f"http://h{(doc_id * 7 + 1) % 12}.example/x".encode()
            nav = (
                b"<div class='nav'><a href='/'>Home</a> <a href='/a'>A</a>"
                b" <a href='" + ref + b"'>Ref</a></div>"
            )
            if doc_id % 13 == 0:
                body = (
                    b"<p>\x93legacy\x94 "
                    + text.encode("cp1252", errors="replace")
                    + b"</p>"
                )
                ctype = "text/html; charset=windows-1252"
            else:
                body = b"<p>" + text.encode() + b"</p>"
                ctype = "text/html; charset=utf-8"
            head = f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
            return {
                "type": "response",
                "WARC-Target-URI": f"http://h{doc_id % 13}.example/d{doc_id}",
                "Content-Type": "application/http; msgtype=response",
                "payload": head + nav + body,
            }

        def _mirror(rec, doc_id):
            # the same page crawled under another spelling: upper-cased
            # host, trailing slash, tracking params, fragment — all of
            # which normalize_url_expr strips back to rec's URL; the body
            # differs (a mirror banner) so the content hash can't collapse
            # it — only the canonical-URL keep-first can
            out = dict(rec)
            out["WARC-Target-URI"] = (
                f"http://H{doc_id % 13}.EXAMPLE/d{doc_id}/"
                "?utm_source=probe&gclid=x#m"
            )
            out["payload"] = rec["payload"] + b"<p>mirror of this page</p>"
            return out

        n_hseg = 8
        for s in range(n_hseg):
            recs = []
            for i, r in enumerate(hfixture):
                if i % n_hseg != s:
                    continue
                rec = _resp(r["doc_id"], r["text"])
                recs.append(rec)
                if r["doc_id"] % 9 == 0:
                    recs.append(_mirror(rec, r["doc_id"]))
            with open(os.path.join(hcrawl, f"seg-{s}.warc.gz"), "wb") as fh:
                fh.write(build_warc_bytes(recs, gzip_members=True))

        hstaging = os.path.join(hwork, "staged")
        hexport = os.path.join(hwork, "export")
        t0 = time.perf_counter()
        sc.setJobGroup("html-curate", "html ingest + funnel + export")
        read_warc_html(spark, hcrawl, links=True).write.parquet(hstaging)
        hstaged = spark.read.parquet(hstaging)
        # crawl authority: host link graph (explode + DISTINCT, bounded by
        # host-pair cardinality) -> directed PageRank over 13 hosts; h12
        # never receives an inlink, so its rank is the teleport floor
        # (0.15/13 ~ 0.0115) while every linked host sits near 1/12
        hedges = host_link_edges(hstaged, url_col="url", links_col="links")
        hranks = pagerank(
            hedges, src="src_host", dst="dst_host",
            damping=0.85, iterations=4, directed=True,
        )
        keep_hosts = hranks.where(F.col("rank") >= 0.02).select(
            F.col("node").alias("__keep_host")
        )
        hfunnel = observe_funnel(
            hstaged.select("doc_id", "url", "text"),
            [
                (
                    # cheapest filter first: collapse crawl spellings of
                    # the same canonical URL before any text is scored
                    "url_dedup",
                    lambda d: url_dedup(d, url_col="url", id_col="doc_id")
                    .where("kept")
                    .select("doc_id", "url", "text"),
                ),
                (
                    "quality",
                    lambda d: gopher_quality_flags(
                        d, min_words=20, min_stopword_hits=1,
                        passthrough=("url", "text"),
                    ).where("keep").select("doc_id", "url", "text"),
                ),
                (
                    "authority",
                    lambda d: d.join(
                        F.broadcast(keep_hosts),
                        url_host_expr(F.col("url")) == F.col("__keep_host"),
                        "left_semi",
                    ),
                ),
                (
                    "dup_spans",
                    lambda d: remove_duplicate_spans(
                        d, k=4, min_count=2, removed_count_col="n_removed"
                    ),
                ),
            ],
        )
        write_jsonl_shards(hfunnel.df, hexport, n_shards=8, compression=None)
        sc.setJobGroup("html-curate-done", "")
        timings["warc_html_curate"] = round(time.perf_counter() - t0, 3)
        hcounts = hfunnel.counts()
        if hcounts["input"] != n_hfix + n_mirror:
            raise AssertionError(
                f"html ingest lost pages: {hcounts} != {n_hfix}+{n_mirror}"
            )
        # keep-first collapses each planted mirror pair to one survivor
        if hcounts["url_dedup"] != n_hfix:
            raise AssertionError(f"URL dedup vacuous/lossy: {hcounts} != {n_hfix}")
        if not (hcounts["url_dedup"] >= hcounts["quality"] >= hcounts["authority"]):
            raise AssertionError(f"html funnel not monotone: {hcounts}")
        if not 0 < hcounts["authority"] < hcounts["quality"]:
            raise AssertionError(f"authority gate vacuous: {hcounts}")
        back = spark.read.json(os.path.join(hexport, "shard=*"))
        n_hexp = back.count()
        if n_hexp != hcounts["authority"]:
            raise AssertionError(f"html export mismatch: {n_hexp} != {hcounts}")
        n_legacy = back.where(F.col("text").contains("“legacy”")).count()
        if n_legacy == 0:
            raise AssertionError("no windows-1252 page survived with intact quotes")
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("html-curate"))
        # the authority stage adds 3 jobs (edge-frame localCheckpoint,
        # route-gate count, driver-route collect — 13 hosts is far below
        # pagerank's driver_threshold) plus the URL window's AQE
        # exchanges: measured 20 at sf0.01; the bound catches
        # per-row/per-stage job growth, and a distributed-PageRank
        # routing regression (the eager rounds alone would add 7+)
        if n_jobs > 26:
            raise AssertionError(f"warc_html_curate launched {n_jobs} jobs (> 26)")
    finally:
        _shutil.rmtree(hwork, ignore_errors=True)
    _release_state(spark)

    # Multimodal end-to-end curation stage: the media flagship as ONE
    # measured number, mirroring wet_curate's shape — payload staging ->
    # per-modality REAL-decode quality gates (pixel mean/std for images,
    # PCM silence for audio) -> keep-first perceptual dedup (images,
    # videos) -> survivor export. NOT comparable to the per-operator keys
    # (it pays the staging write, the decode passes, and the export; the
    # image decode runs ONCE — image_profile_table emits the gate
    # features and the dedup hash from the same pass). Payload
    # fixtures are the entry file's in-plan BMP/WAV derivations plus the
    # shared AVI corpus; thresholds are non-vacuous by construction
    # (pixel mean <104 passes ~half the brightness shifts, std >=57.5
    # passes 30/50 pattern classes, silence v<=32 is ~1/8 of clips) and
    # the gates assert they actually fired.
    from sat_bucket_spark.operators.audio import audio_quality_features
    from sat_bucket_spark.operators.dedup import keep_first_by_signature
    from sat_bucket_spark.operators.imagehash import image_profile_table

    mwork = _tempfile.mkdtemp(prefix="bench_media_")
    try:
        images = docs.select(
            "doc_id", F.lit("image").alias("kind"),
            entry_mod._bmp_payload_expr().alias("payload"),
        )
        audio = docs.select(
            "doc_id", F.lit("audio").alias("kind"),
            entry_mod._wav_payload_expr().alias("payload"),
        )
        videos = vcorpus.select(
            "doc_id", F.lit("video").alias("kind"), "payload"
        )
        mstage = os.path.join(mwork, "staged")
        mexport = os.path.join(mwork, "export")
        sc = spark.sparkContext
        t0 = time.perf_counter()
        sc.setJobGroup("media-curate", "stage + gates + dedup + export")
        images.unionByName(audio).unionByName(videos).write.parquet(mstage)
        staged = spark.read.parquet(mstage)

        img = staged.where(F.col("kind") == "image")
        # ONE decode pass emits both the quality features and the dedup
        # signature (image_profile_table) — the r8 shape paid a second
        # full decode (featurize for the gate, hash for the dedup)
        prof = image_profile_table(img)
        # features are [mean, std, min, max] scaled by 1/255
        img_pass = prof.where(
            (F.element_at("feature", 1) < 104.0 / 255)
            & (F.element_at("feature", 2) >= 57.5 / 255)
        ).select("doc_id", "phash")
        img_kept = (
            keep_first_by_signature(
                img_pass.where(F.col("phash").isNotNull()),
                id_col="doc_id", sig_col="phash",
                n_bits=64, max_hamming=6, n_bands=8,
            )
            .where("kept")
            .select("doc_id", F.lit("image").alias("kind"))
        )
        aud_kept = (
            audio_quality_features(staged.where(F.col("kind") == "audio"))
            .where(
                (F.col("silence_frac") < 0.5) & (F.col("duration_s") >= 0.08)
            )
            .select("doc_id", F.lit("audio").alias("kind"))
        )
        vid_kept = (
            video_dedup(
                staged.where(F.col("kind") == "video"),
                every_n=1, n_frames=3, max_hamming=6, n_bands=8,
            )
            .where("kept")
            .select("doc_id", F.lit("video").alias("kind"))
        )
        survivors = img_kept.unionByName(aud_kept).unionByName(vid_kept)
        survivors.write.partitionBy("kind").parquet(mexport)
        sc.setJobGroup("media-curate-done", "")
        timings["media_curate"] = round(time.perf_counter() - t0, 3)

        # integrity gates (outside the timed window)
        n_docs = docs.count()
        n_videos = vcorpus.count()
        if staged.count() != 2 * n_docs + n_videos:
            raise AssertionError("media staging lost rows")
        n_img_pass = img_pass.count()
        if not 0 < n_img_pass < n_docs:
            raise AssertionError(f"image quality gate vacuous: {n_img_pass}/{n_docs}")
        n_aud = aud_kept.count()
        if not 0 < n_aud < n_docs:
            raise AssertionError(f"audio silence gate vacuous: {n_aud}/{n_docs}")
        back = spark.read.parquet(mexport).groupBy("kind").count().collect()
        by_kind = {r["kind"]: r["count"] for r in back}
        if by_kind.get("image", 0) > 30:  # <=30 surviving dhash classes
            raise AssertionError(f"image keep-first did not collapse: {by_kind}")
        if not 1 <= by_kind.get("video", 0) <= 24:
            raise AssertionError(f"video keep-first did not collapse: {by_kind}")
        if by_kind.get("audio") != n_aud:
            raise AssertionError(f"export mismatch: {by_kind} vs audio {n_aud}")
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("media-curate"))
        # 2 writes + 4 eager stage-cache materializations (sigs + distinct
        # sigs in each keep-first dedup) + AQE per-exchange jobs: measured
        # 19 at sf0.01; the bound catches a per-row/per-stage job
        # regression class, not AQE jitter
        if n_jobs > 24:
            raise AssertionError(f"media_curate launched {n_jobs} jobs (> 24)")
    finally:
        _shutil.rmtree(mwork, ignore_errors=True)
    _release_state(spark)

    # Bucket pipeline: the reference's core workload (ingest -> query -> merge)
    import shutil
    import tempfile

    from sat_bucket_spark import LonLatPartitioning, merge_granule_buckets, read, write_bucket

    work = tempfile.mkdtemp(prefix="bench_bucket_")
    try:
        # mid-run stress re-check: the pre-run gauge can't see pressure
        # that arrives mid-bench, and the bucket family (the most
        # file-count-bound section) runs LAST. One canary rep is cheap
        # (~1.7 s quiet); single-shot noise is ±25%, so the one-shot
        # trigger uses a slightly higher bar than the median-based pre
        # check. Once stressed, stays stressed (reps are the safe side).
        if not state["stressed"]:
            mid = _smallfiles_canary_sec(spark, canary_dir)
            state["mid_check_sec"] = round(mid, 3)
            if mid / SMALLFILES_CANARY_REF_SEC > 1.5:
                state["stressed"] = True

        ev = entry_mod._with_coords(entry_mod._events(spark, sf_dir)).withColumnRenamed(
            "ts", "time"
        )
        p = LonLatPartitioning(size=(10, 10))
        bk = {"i": 0}

        def _bucket_write():
            bk["i"] += 1
            bk["bucket"] = f"{work}/bucket{bk['i']}"
            return _timed(write_bucket, ev, bk["bucket"], p, x="lon", y="lat")

        _record("bucket_write", _bucket_write)
        bucket = bk["bucket"]
        _record(
            "bucket_read_extent",
            lambda: _timed(
                lambda: read(spark, bucket, extent=[-20, 40, 0, 30]).count()
            ),
        )
        # polygon query: cell-exact pruning keeps ~the diagonal band's cells,
        # not its bbox cross product (non-vacuous at every SF: the dart sits
        # in the events table's southern latitude band)
        poly = [(-120.0, -88.0), (0.0, -64.0), (120.0, -88.0), (0.0, -76.0)]
        _record(
            "bucket_read_polygon",
            lambda: _timed(lambda: read(spark, bucket, polygon=poly).count()),
        )

        def _bucket_merge():
            bk["i"] += 1
            bk["merged"] = f"{work}/merged{bk['i']}"
            return _timed(
                merge_granule_buckets, spark, bucket, bk["merged"],
                temporal_partitioning="month",
            )

        _record("bucket_merge", _bucket_merge)

        # Streaming ingest -> compaction round trip: N micro-batches through
        # the exactly-once file sink, then the batch merge. NOT comparable to
        # bucket_write (per-micro-batch commit + sink-log overhead is the
        # price of exactly-once; see BASELINE.md bench notes) — benched so a
        # regression in the stream-then-compact path is visible.
        import glob as _glob

        from sat_bucket_spark.streaming.ingest import stream_write_bucket

        src = f"{work}/stream_src"
        ev.repartition(4).write.parquet(src)
        n_src = spark.read.parquet(src).count()

        def _stream_ingest():
            # fresh sink/checkpoint/merge dirs per rep: the exactly-once
            # sink log would otherwise no-op a replayed source
            bk["i"] += 1
            sbucket = bk["sbucket"] = f"{work}/stream_bucket{bk['i']}"
            smerged = bk["smerged"] = f"{work}/stream_merged{bk['i']}"
            t0 = time.perf_counter()
            stream = (
                spark.readStream.schema(spark.read.parquet(src).schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            # repartition=8: micro-batches here are small (one source file),
            # so a handful of label-keyed tasks beats both the single-task
            # write (sequential directory creation) and a full-width shuffle
            # (per-task dispatch for near-empty tasks). Measured 27s -> 5s
            # at sf0.1.
            q = stream_write_bucket(
                stream, sbucket, p, checkpoint_dir=f"{work}/ckpt{bk['i']}",
                x="lon", y="lat", trigger={"availableNow": True}, repartition=8,
            )
            q.awaitTermination()
            merge_granule_buckets(
                spark, sbucket, smerged, temporal_partitioning="month"
            )
            return time.perf_counter() - t0

        _record("bucket_stream_ingest", _stream_ingest)
        smerged = bk["smerged"]
        # integrity gate: streamed + compacted must equal the batch path
        n_stream = spark.read.parquet(bk["sbucket"]).count()
        n_merged = spark.read.option("pathGlobFilter", "*.parquet").parquet(smerged).count()
        n_batch = spark.read.option("pathGlobFilter", "*.parquet").parquet(bucket).count()
        if not (n_stream == n_merged == n_batch == n_src):
            raise AssertionError(
                f"stream-ingest round trip diverged: src={n_src} stream={n_stream} "
                f"merged={n_merged} batch={n_batch}"
            )
        if not _glob.glob(f"{smerged}/**/*.parquet", recursive=True):
            raise AssertionError("stream merge produced no files")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    canary_post = _canary_median(spark, canary_dir)
    write_post = _write_canary_median(spark, canary_dir)
    smallfiles_post = _smallfiles_canary_median(spark, canary_dir)
    _shutil.rmtree(canary_dir, ignore_errors=True)
    canary_med = round((canary_pre + canary_post) / 2, 3)
    write_med = round((write_pre + write_post) / 2, 3)
    smallfiles_med = round((smallfiles_pre + smallfiles_post) / 2, 3)
    canary = {
        "pre_sec": canary_pre,
        "post_sec": canary_post,
        "ref_sec": CANARY_REF_SEC,
        # >1 means the host ran SLOWER than the pinned quiet-host
        # reference; divide recorded timings by this to compare rounds
        "host_factor": (
            round(canary_med / CANARY_REF_SEC, 3) if CANARY_REF_SEC else None
        ),
        # storage-pressure reading (r12): a wild bucket/ingest key with a
        # benign host_factor but elevated write_factor is an I/O-stall
        # discard — re-measure, don't adjust
        "write_pre_sec": write_pre,
        "write_post_sec": write_post,
        "write_ref_sec": WRITE_CANARY_REF_SEC,
        "write_factor": (
            round(write_med / WRITE_CANARY_REF_SEC, 3)
            if WRITE_CANARY_REF_SEC
            else None
        ),
        # file-count-bound storage reading (r13): the bucket family's
        # ~648-dir commits pay metadata/rename costs the bulk write canary
        # can't see — a wild bucket key with benign host/write factors but
        # an elevated smallfiles_factor is a metadata-stall discard
        "smallfiles_pre_sec": smallfiles_pre,
        "smallfiles_post_sec": smallfiles_post,
        "smallfiles_ref_sec": SMALLFILES_CANARY_REF_SEC,
        "smallfiles_factor": (
            round(smallfiles_med / SMALLFILES_CANARY_REF_SEC, 3)
            if SMALLFILES_CANARY_REF_SEC
            else None
        ),
        # in-run storage-stress adjudication (r13 task #1): True means the
        # file-count-bound keys above were recorded as medians of
        # STRESS_REPS in-run reps (per-rep readings in "reps"); a band
        # breach on those keys in a stressed artifact is storage-
        # attributed by bench_compare --bands, not a bare breach
        "storage_stressed": state["stressed"],
        "stress_threshold": STRESS_THRESHOLD,
        **(
            {"smallfiles_mid_sec": state["mid_check_sec"]}
            if "mid_check_sec" in state
            else {}
        ),
    }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "canary": canary,
    }
    if reps_recorded:
        out["reps"] = reps_recorded
    line = json.dumps(out)
    print(line)
    # Truncation-proof copy of the SAME one-line record (VERDICT r16 task
    # #2): the driver's BENCH_rN artifact stores only a 2000-char stdout
    # tail, which truncated BENCH_r15 mid-JSON and broke the r16 PERF
    # round-over-round comparison (n_common: 0). Purely additive — the
    # stdout contract ($SPARK_GRAFT_CPUS/$SPARK_GRAFT_SF_DIR in, one JSON
    # line out) is unchanged; a failed write must not fail the bench.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json"),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    sys.exit(main())
