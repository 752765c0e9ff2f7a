#!/usr/bin/env python
"""Matched-window core-count scaling receipt (VERDICT r16 #8).

The driver's 8-vs-32-core block reads ~1 for every key because sf0.1 is
scheduling-bound and the two runs see different storage weather. This
tool makes the parallelism question answerable: it replicates the sf0.1
tables R times (probe_sf1's id-shift scheme) so the CPU-bound keys have
real work, then runs the probe keys at 32 and 8 cores in ABBA-interleaved
SUBPROCESSES (master is per-process) with the bench's frozen CPU canary
bracketing each leg, and reports per-key medians + the t8/t32 ratio.
A parallel key should read ratio >> 1 (ideal 4); ~1 means
scheduling/IO-bound at this scale.

Usage:
  python tools/scaling_receipt.py               # driver mode
  python tools/scaling_receipt.py --leg CPUS SF_DIR KEYS_CSV   # internal
"""
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = ["image_dhash", "repetition_full", "simhash", "lm_score",
        "knn_join", "pagerank"]
REPLICAS = 5


def leg(cpus: str, sf_dir: str, keys: list[str]) -> None:
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    import __spark_entry__ as entry_mod
    from sat_bucket_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-leg-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def _release():
        spark.catalog.clearCache()
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()

    # bench-identical CPU canary (bench.py pin: ref 2.36 s at 32 cores;
    # at 8 cores the canary itself slows ~like the queries — recorded so
    # the two legs' ambient can be compared WITHIN a core count)
    import bench as bench_mod

    canary = bench_mod._canary_sec(spark, "/tmp/scaling_canary")
    out = {"cpus": cpus, "canary_sec": round(canary, 3), "queries": {}}
    for name in keys:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        _release()  # warm the code path, then time 2 reps
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
            _release()
        out["queries"][name] = reps
    print("LEG_RESULT " + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        leg(sys.argv[2], sys.argv[3], sys.argv[4].split(","))
        return
    import shutil
    import tempfile

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    src = os.environ["SPARK_GRAFT_SF_DIR"]
    work = tempfile.mkdtemp(prefix="scaling_rep_")
    try:
        # replicate via probe_sf1's scheme (id-shifted copies)
        from probe_sf1 import replicate_table
        from sat_bucket_spark.session import get_spark

        spark = get_spark(app_name="scaling-replicate", master="local[32]",
                          shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        for table, id_col in (
            ("documents", "doc_id"), ("orders", "o_orderkey"),
            ("embeddings", "vec_id"), ("events", None),
            ("lineitem", None), ("customer", None), ("nation", None),
            ("region", None), ("supplier", None), ("part", None),
        ):
            if id_col:
                replicate_table(spark, src, work, table, id_col, REPLICAS)
            else:
                import shutil as _sh

                _sh.copytree(
                    os.path.join(src, f"{table}.parquet"),
                    os.path.join(work, f"{table}.parquet"),
                )
        spark.stop()

        legs = []
        for cpus in ("32", "8", "8", "32"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", cpus,
                 work, ",".join(KEYS)],
                capture_output=True, text=True, cwd=REPO, timeout=3600,
            )
            for line in p.stdout.splitlines():
                if line.startswith("LEG_RESULT "):
                    legs.append(json.loads(line[len("LEG_RESULT "):]))
                    break
            else:
                print("leg failed:", p.stderr[-2000:])
                return
            print(f"leg local[{cpus}] done: canary {legs[-1]['canary_sec']}s")

        report = {"replicas": REPLICAS, "keys": {}, "legs": legs}
        for k in KEYS:
            t32 = [r for leg_ in legs if leg_["cpus"] == "32"
                   for r in leg_["queries"][k]]
            t8 = [r for leg_ in legs if leg_["cpus"] == "8"
                  for r in leg_["queries"][k]]
            report["keys"][k] = {
                "t32_median": round(statistics.median(t32), 3),
                "t8_median": round(statistics.median(t8), 3),
                "ratio_t8_over_t32": round(
                    statistics.median(t8) / statistics.median(t32), 2
                ),
            }
        out_path = os.path.join(REPO, "plans", "r17", "scaling_receipt.json")
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1)
        print(json.dumps(report["keys"], indent=1))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
