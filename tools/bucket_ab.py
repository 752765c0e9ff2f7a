#!/usr/bin/env python
"""Interleaved A/B of the bucket family between two checkouts — the
r8/r9-style receipt that convicts or exculpates the CODE for a bench
drift. Alternates fresh-process runs A,B,A,B,... so host drift within the
session hits both sides equally; reports per-key medians and the B/A
ratio.

Usage: python tools/bucket_ab.py <repo_a> <repo_b> [pairs] [sf_dir]
"""
import json
import statistics
import subprocess
import sys

a, b = sys.argv[1], sys.argv[2]
pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
runner = __file__.replace("bucket_ab.py", "bucket_ab_runner.py")

results = {a: [], b: []}
for i in range(pairs):
    for repo in (a, b):
        proc = subprocess.run(
            [sys.executable, runner, repo, sf_dir],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            # preserve the receipt: the measurements already taken and the
            # failing side's actual error, not a bare CalledProcessError
            print(f"pair {i} {repo} FAILED (rc={proc.returncode}); "
                  f"completed so far: {json.dumps(results)}", flush=True)
            sys.stderr.write(proc.stderr[-4000:])
            sys.exit(1)
        out = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(out)
        results[repo].append(rec)
        print(f"pair {i} {repo}: {rec}", flush=True)

keys = ["bucket_write", "bucket_read_extent", "bucket_merge", "bucket_stream_ingest"]
summary = {}
for k in keys:
    med_a = statistics.median(r[k] for r in results[a])
    med_b = statistics.median(r[k] for r in results[b])
    summary[k] = {"a_median": round(med_a, 3), "b_median": round(med_b, 3),
                  "b_over_a": round(med_b / med_a, 3)}
print(json.dumps({"pairs": pairs, "a": a, "b": b, "summary": summary}))
