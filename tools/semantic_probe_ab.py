#!/usr/bin/env python
"""Bench-fixture replica for semantic_index_probe (VERDICT r16 #7).

Rebuilds bench.py's semantic-index fixture exactly (archive = vec_id%3!=0,
batch = exact-copy dups + negated novels, IVFPQ store_vectors=True, probe
with min_cosine=0.9, n_probe=2, adc_margin=None, verify_vectors="index"),
times warm probe reps, prints the job count and executed-plan census, and
writes the finalized probe plan to plans/r17/semantic_index_probe_<tag>.txt.

Usage: python tools/semantic_probe_ab.py <tag> [reps]
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

    from sat_bucket_spark.operators.similarity import (
        build_ivfpq_index,
        semantic_dedup_against_index,
    )
    from sat_bucket_spark.session import get_spark

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="semantic-probe-ab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def _release():
        spark.catalog.clearCache()
        for _id, rdd in sc._jsc.getPersistentRDDs().items():
            rdd.unpersist()

    work = tempfile.mkdtemp(prefix="sem_ab_")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    arch_path = os.path.join(work, "archive")
    emb.where(F.col("vec_id") % 3 != 0).write.parquet(arch_path)
    archive = spark.read.parquet(arch_path)
    dups = archive.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    novel = emb.where(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    batch_path = os.path.join(work, "batch")
    dups.unionByName(novel).write.parquet(batch_path)
    sidx = os.path.join(work, "index")
    build_ivfpq_index(
        archive, sidx, dim=64, n_clusters=8, m=4, ksub=16, store_vectors=True,
    )
    batch = spark.read.parquet(batch_path)
    _release()

    secs, n_surv = [], None
    for i in range(reps):
        sc.setJobGroup(f"probe{i}", "probe")
        t0 = time.perf_counter()
        surv = semantic_dedup_against_index(
            batch, sidx, min_cosine=0.9, n_probe=2, adc_margin=None,
            verify_vectors="index",
        )
        n_surv = surv.count()
        secs.append(time.perf_counter() - t0)
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"probe{i}"))
        if i == reps - 1:
            surv.collect()  # finalize THIS frame's QE through AQE
            plan = surv._jdf.queryExecution().executedPlan().toString()
            out = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", "r17", f"semantic_index_probe_{tag}.txt",
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
