#!/usr/bin/env python
"""Interleaved warm A/B: pagerank fuse_rounds=1 (r15 shape) vs =8 (r16).

Replicates the bench's q_pagerank conditions exactly (same fixture,
driver_threshold=0, noop sink, _release_state between reps) in ONE
process so host drift hits both shapes equally. Interleaves shapes so a
storm burst cannot bias one side. Also verifies output equality across
the two shapes on the first rep pair.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from sat_bucket_spark.session import get_spark
    from sat_bucket_spark.operators.graph import pagerank

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="pagerank-fuse-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _release():
        spark.catalog.clearCache()
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()

    def run(fuse):
        # time construction + action: pagerank() is EAGER (round caches
        # materialize inside it), exactly what the bench key measures
        t0 = time.perf_counter()
        pr = pagerank(
            entry_mod._pagerank_fixture_edges(spark, sf_dir),
            damping=0.85,
            iterations=10,
            directed=False,
            driver_threshold=0,
            fuse_rounds=fuse,
        )
        out = pr.select("node", F.round("rank", 9).alias("pr")).orderBy("node")
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        _release()
        return dt

    # output-equality check (collected rows, not just a hash)
    def rows(fuse):
        pr = pagerank(
            entry_mod._pagerank_fixture_edges(spark, sf_dir),
            damping=0.85,
            iterations=10,
            directed=False,
            driver_threshold=0,
            fuse_rounds=fuse,
        )
        r = (
            pr.select("node", F.round("rank", 9).alias("pr"))
            .orderBy("node")
            .collect()
        )
        _release()
        return r

    eq = rows(1) == rows(8)
    print(json.dumps({"outputs_equal": eq}), flush=True)

    # warmup both shapes once
    run(1)
    run(8)
    t = {1: [], 8: []}
    for i in range(reps):
        order = (1, 8) if i % 2 == 0 else (8, 1)
        for f in order:
            t[f].append(round(run(f), 3))
            print(json.dumps({"fuse": f, "rep": t[f][-1]}), flush=True)
    print(
        "SUMMARY "
        + json.dumps(
            {
                "fuse1": {"reps": t[1], "median": round(statistics.median(t[1]), 3), "min": min(t[1])},
                "fuse8": {"reps": t[8], "median": round(statistics.median(t[8]), 3), "min": min(t[8])},
            }
        )
    )


if __name__ == "__main__":
    main()
