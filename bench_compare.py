#!/usr/bin/env python
"""Host-adjusted cross-round bench comparison (companion to the canary).

Usage: python bench_compare.py BENCH_rA.json BENCH_rB.json [--flag 1.4]

Loads two bench artifacts (either the driver's wrapper format, whose
per-query JSON lives in a "tail" string, or bench.py's raw one-line
output), divides each side's timings by its recorded canary
``host_factor`` when present (r10+; older artifacts carry no canary and
pass through raw, flagged as such), and prints:

- shared-key totals, raw and host-adjusted, with the overall ratio;
- per-key ratios beyond ``--flag`` (default 1.4x), the review threshold
  BASELINE.md's noise protocol uses, sorted worst-first;
- keys present on only one side (added/removed between rounds).

This is the comparison the r9 round burned four full bench runs doing by
hand (and finally settled with a worktree re-bench of the prior commit);
with per-run canaries it is one command. Single-shot per-key ratios are
still noisy (~3x envelope on this host) — treat flagged keys as a list
to re-measure with interleaved warm medians, not as verdicts.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_bench(path: str) -> dict:
    """{"queries": {...}, "host_factor": float|None, "label": path}"""
    with open(path) as fh:
        raw = fh.read()
    doc = json.loads(raw)
    if "queries" not in doc and "tail" in doc:
        # driver wrapper: the bench line is truncated into a "tail" string.
        # All regexes must run on the DECODED tail — in the raw file the
        # tail's quotes are JSON-escaped (\"host_factor\") and never match.
        body = doc["tail"]
        m = re.search(r'"queries"\s*:\s*(\{.*?\})(?=,\s*"(?:sf|recall|canary)")',
                      body, re.S)
        queries = json.loads(m.group(1)) if m else {}
        if not queries:
            # tail may START mid-dict; reconstruct from key-value pairs
            queries = {
                k: float(v)
                for k, v in re.findall(r'"([a-z0-9_]+)"\s*:\s*([0-9.]+)', body)
                if k not in ("sf", "pre_sec", "post_sec", "ref_sec", "host_factor",
                             "value", "n", "rc", "cpus")
            }
        hf = None
        hm = re.search(r'"host_factor"\s*:\s*([0-9.]+)', body)
        if hm:
            hf = float(hm.group(1))
        # the wrapper's "tail" string truncates the HEAD of the bench line,
        # so the first few registry keys may be unrecoverable — mark the
        # side truncated so the key-diff below doesn't misreport them as
        # added/removed between rounds
        return {
            "queries": queries,
            "host_factor": hf,
            "label": path,
            "truncated": "queries" not in doc,
        }
    canary = doc.get("canary") or {}
    return {
        "queries": {k: float(v) for k, v in doc.get("queries", {}).items()},
        "host_factor": canary.get("host_factor"),
        "label": path,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.4)
    args = ap.parse_args()

    a, b = load_bench(args.old), load_bench(args.new)
    for side in (a, b):
        side["adj"] = side["host_factor"] or 1.0
        if side["host_factor"] is None:
            print(f"note: {side['label']} has no canary (pre-r10) — raw timings")

    shared = sorted(set(a["queries"]) & set(b["queries"]))
    only_a = sorted(set(a["queries"]) - set(b["queries"]))
    only_b = sorted(set(b["queries"]) - set(a["queries"]))

    tot_a = sum(a["queries"][k] for k in shared)
    tot_b = sum(b["queries"][k] for k in shared)
    adj_a, adj_b = tot_a / a["adj"], tot_b / b["adj"]
    print(f"shared keys: {len(shared)}")
    print(f"raw totals:  {tot_a:.1f} -> {tot_b:.1f}  (ratio {tot_b / tot_a:.3f})")
    print(
        f"adjusted:    {adj_a:.1f} -> {adj_b:.1f}  (ratio {adj_b / adj_a:.3f}; "
        f"factors {a['adj']:.3f} / {b['adj']:.3f})"
    )

    flagged = []
    for k in shared:
        ra = a["queries"][k] / a["adj"]
        rb = b["queries"][k] / b["adj"]
        if ra > 0 and (rb / ra >= args.flag or ra / rb >= args.flag):
            flagged.append((rb / ra, k, ra, rb))
    if flagged:
        print(f"\nper-key host-adjusted ratios beyond {args.flag}x "
              "(re-measure with warm medians before concluding):")
        for ratio, k, ra, rb in sorted(flagged, key=lambda t: -t[0]):
            print(f"  {ratio:5.2f}x  {k}: {ra:.2f} -> {rb:.2f}")
    else:
        print(f"\nno per-key drift beyond {args.flag}x")
    trunc_note = (
        " (one side is a truncated driver wrapper — head keys may be "
        "missing there, not genuinely added/removed)"
        if a.get("truncated") or b.get("truncated")
        else ""
    )
    if only_a:
        print(f"\nremoved keys{trunc_note}: {', '.join(only_a)}")
    if only_b:
        print(f"added keys{trunc_note}: {', '.join(only_b)}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` closed stdout — not an error
        sys.exit(0)
