#!/usr/bin/env python
"""Warm-rep per-key timing harness (the repo's A/B protocol).

Usage: python tools/warmbench.py KEY[,KEY...] [reps]
Times each registered query with the bench's methodology (noop sink,
_release_state between reps), printing every rep and the median. Host
noise on this box is ±25% single-shot; medians of >=5 warm reps are the
attribution standard (BASELINE.md bench notes).
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    keys = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import __spark_entry__ as entry_mod
    from sat_bucket_spark.session import get_spark

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="warmbench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    def _release():
        spark.catalog.clearCache()
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()

    # warmup
    queries["distinct_sort"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for key in keys:
        fn = queries[key]
        secs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
            _release()
        out[key] = {"reps": secs, "median": round(statistics.median(secs), 3)}
        print(json.dumps({key: out[key]}), flush=True)
    print("SUMMARY " + json.dumps({k: v["median"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
