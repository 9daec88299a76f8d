#!/usr/bin/env python3
"""Assemble BENCH_LOCAL_r12.json (per-query median of the three quiet
closing runs) in the BENCH_LOCAL_r10.json format, from the three full-map
artifacts of `sbt "runMain graft.Bench"` runs.

Usage: baseline_r12.py run1.json run2.json run3.json > BENCH_LOCAL_r12.json
"""
import sys, json, statistics

runs = [json.load(open(p))["queries"] for p in sys.argv[1:4]]
# a query missing from any run must not silently fall out of the
# regression baseline (ADVICE r12): fail loudly instead
union = set(runs[0]) | set(runs[1]) | set(runs[2])
inter = set(runs[0]) & set(runs[1]) & set(runs[2])
if union != inter:
    sys.exit(f"key sets differ across runs; missing somewhere: {sorted(union - inter)}")
keys = sorted(inter)
med = {k: statistics.median([r[k] for r in runs]) for k in keys}
out = {
    "metric": "total",
    "value": sum(med.values()),
    "unit": "sec",
    "queries": med,
    "method": ("per-query MEDIAN of BENCH_LOCAL_r12_run{1,2,3}.json (three "
               "quiet sf0.1 local[8] full-suite runs at r12 HEAD, 184 "
               "queries, 0 failed each)"),
    "sf": "/root/testdata/sf0.1",
}
print(json.dumps(out, indent=1))
