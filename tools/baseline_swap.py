#!/usr/bin/env python3
"""Generate the Bench.baselinePrev Scala map from the round's closing
quiet recordings. Baseline = per-query MEDIAN of the runs (the r9 ADVICE:
a min-of-three over a drifting host is untraceable; the median of three
COMMITTED artifacts is reproducible from history).

Usage: baseline_swap.py BENCH_LOCAL_rN_run1.json [run2.json run3.json ...]
Prints the Scala map body (caller pastes into Bench.scala).
"""
import sys, json, statistics

runs = []
for p in sys.argv[1:]:
    with open(p) as f:
        runs.append(json.load(f)["queries"])
keys = sorted(runs[0])
entries = []
for k in keys:
    vals = [r[k] for r in runs if k in r]
    entries.append((k, statistics.median(vals)))
out = []
for i in range(0, len(entries), 2):
    chunk = entries[i:i + 2]
    out.append("    " + ", ".join(f'"{k}" -> {v:.3f}' for k, v in chunk) + ",")
body = "\n".join(out).rstrip(",")
print(body)
total = sum(v for _, v in entries)
print(f"// {len(entries)} queries, median total {total:.1f} s", file=sys.stderr)
