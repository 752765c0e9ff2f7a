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

    t0 = time.perf_counter()
    midx = os.path.join(work, "index")
    build_minhash_index(corpus, midx, n_hashes=8, n_bands=4, shingle_size=8)
    print(f"build: {time.perf_counter() - t0:.2f}s")
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
