#!/usr/bin/env python
"""Bench-fixture replica for minhash_index_build / minhash_index_probe.

Builds the index exactly as bench.py does (corpus = docs with doc_id%3!=0,
batch = re-keyed remainder with planted near-dups), then reports for the
probe: wall seconds (warm reps), job count, and the executed-plan census —
plus writes the executed probe plan to plans/r17/minhash_index_probe_<tag>.txt.

Usage: python tools/minhash_probe_ab.py <tag> [reps]
"""
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import tempfile

    from pyspark.sql import functions as F

    from sat_bucket_spark.operators.dedup import (
        build_minhash_index,
        minhash_dedup_against_index,
    )
    from sat_bucket_spark.session import get_spark

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="minhash-probe-ab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def _release():
        spark.catalog.clearCache()
        for _id, rdd in sc._jsc.getPersistentRDDs().items():
            rdd.unpersist()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    work = tempfile.mkdtemp(prefix="mh_ab_")
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    batch_path = os.path.join(work, "batch")
    docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 6 == 0, F.concat(F.col("text"), F.lit(" tail")))
        .otherwise(F.concat(F.lit("fresh "), F.col("doc_id"), F.lit(" unseen")))
        .alias("text"),
    ).write.parquet(batch_path)

    # --- interleaved build A/B: r16 two-pass shape (verbatim) vs HEAD ---
    def build_old(docs, index_dir):
        """The r16 _write_minhash_index_rows body, mode=overwrite: bands
        from a full-corpus signature pass (explode + groupBy min), sets
        from a separate dedup + second shingle pass."""
        from pyspark.sql import functions as F

        from sat_bucket_spark.operators.dedup import (
            _band_rows,
            _ensure_parallelism,
            _hashed_shingles_expr,
            minhash_signatures,
        )
        from sat_bucket_spark.writers import write_partitioned_dataset

        keyed = _ensure_parallelism(docs).select(
            F.xxhash64(F.col("text")).alias("__content_id"), F.col("text")
        )
        sigs = minhash_signatures(
            keyed, id_col="__content_id", text_col="text",
            n_hashes=8, shingle_size=8, seed=42,
        )
        bands = _band_rows(sigs, "__content_id", 4, 8).select(
            F.col("__content_id").alias("content_id"),
            "band_idx",
            F.xxhash64(F.col("band_sig")).alias("band_sig"),
        )
        write_partitioned_dataset(
            bands, os.path.join(index_dir, "bands"), partitions=["band_idx"],
            mode="overwrite", sort_within_by=["band_sig"],
            repartition_by_levels=False,
        )
        n_tasks = docs.sparkSession.sparkContext.defaultParallelism
        sets = (
            keyed.dropDuplicates(["__content_id"])
            .repartition(n_tasks)
            .sortWithinPartitions("__content_id")
            .select(
                F.col("__content_id").alias("content_id"),
                _hashed_shingles_expr("text", 8).alias("shingle_set"),
            )
        )
        sets.write.mode("overwrite").parquet(os.path.join(index_dir, "shingles"))

    old_s, new_s = [], []
    bi = {"i": 0}

    def one(shape_fn, label, bucket):
        bi["i"] += 1
        g = f"build{bi['i']}"
        sc.setJobGroup(g, label)
        t0 = time.perf_counter()
        shape_fn(corpus, os.path.join(work, f"index_{label}{bi['i']}"))
        dt = time.perf_counter() - t0
        bucket.append(dt)
        print(f"  {label}: {dt:.2f}s jobs="
              f"{len(sc.statusTracker().getJobIdsForGroup(g))}")
        _release()

    def build_new(docs, index_dir):
        build_minhash_index(docs, index_dir, n_hashes=8, n_bands=4,
                            shingle_size=8)

    one(build_new, "warmup_new", [])
    one(build_old, "warmup_old", [])
    for r in range(3):
        if r % 2 == 0:
            one(build_old, "old", old_s); one(build_new, "new", new_s)
        else:
            one(build_new, "new", new_s); one(build_old, "old", old_s)
    print(f"build A/B: old median {statistics.median(old_s):.3f}s "
          f"new median {statistics.median(new_s):.3f}s")
    midx = os.path.join(work, f"index_new{bi['i']}" if bi['i'] % 2 == 1 else "index")
    # rebuild a canonical index for the probe reps below
    midx = os.path.join(work, "index")
    build_minhash_index(corpus, midx, n_hashes=8, n_bands=4, shingle_size=8)
    _release()
    batch = spark.read.parquet(batch_path)

    secs, n_surv = [], None
    for i in range(reps):
        sc.setJobGroup(f"probe{i}", "probe")
        t0 = time.perf_counter()
        surv = minhash_dedup_against_index(batch, midx, min_jaccard=0.5)
        n_surv = surv.count()
        secs.append(time.perf_counter() - t0)
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"probe{i}"))
        if i == reps - 1:
            # collect() executes THIS frame's QueryExecution, so the
            # captured plan is the AQE-final one (isFinalPlan=true) — a
            # count() runs a different QE and leaves this one unexecuted
            surv.collect()
            plan = surv._jdf.queryExecution().executedPlan().toString()
            out = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", "r17", f"minhash_index_probe_{tag}.txt",
            )
            with open(out, "w") as fh:
                fh.write(plan)
            hist = {}
            for m in re.finditer(
                r"\b(Exchange|ReusedExchange|BroadcastHashJoin|SortMergeJoin|"
                r"Generate|HashAggregate|SortAggregate|Scan parquet)\b", plan
            ):
                hist[m.group(1)] = hist.get(m.group(1), 0) + 1
            print("final-plan census:", hist)
        _release()
        print(f"rep{i}: {secs[-1]:.2f}s jobs={jobs} survivors={n_surv}")
    print(f"{tag}: median {statistics.median(secs):.3f}s over {reps} reps, "
          f"survivors={n_surv}")


if __name__ == "__main__":
    main()
