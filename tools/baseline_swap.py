#!/usr/bin/env python3
"""Generate the Bench.baselinePrev and Bench.baselineShuffle Scala map
bodies from the round's closing quiet recordings. Baseline = per-query
MEDIAN of the runs (the r9 ADVICE: a min-of-three over a drifting host is
untraceable; the median of three COMMITTED artifacts is reproducible from
history). The shuffle map (r16, VERDICT r15 #2) is the bytes side of the
bytes-aware regression gate.

Usage: baseline_swap.py BENCH_LOCAL_rN_run1.json [run2.json run3.json ...]
Prints both Scala map bodies (caller pastes into Bench.scala).
"""
import sys, json, statistics

full = []
for p in sys.argv[1:]:
    with open(p) as f:
        full.append(json.load(f))
runs = [j["queries"] for j in full]
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
print("// ---- baselinePrev ----")
print(body)
total = sum(v for _, v in entries)
print(f"// {len(entries)} queries, median total {total:.1f} s", file=sys.stderr)

shuf = [j.get("shuffle_write", {}) for j in full]
if all(shuf):
    # same loud key-set check as the wall medians (ADVICE r16): a key
    # missing from one run's shuffle map must not silently contribute 0
    # to the median — that deflates the bytes baseline and makes future
    # clean runs classify Regressed
    missing = {k for k in keys for s in shuf if k not in s}
    if missing:
        sys.exit(f"shuffle_write key sets differ across runs; "
                 f"missing somewhere: {sorted(missing)}")
    sentries = [(k, int(statistics.median([s[k] for s in shuf])))
                for k in keys]
    out = []
    for i in range(0, len(sentries), 2):
        chunk = sentries[i:i + 2]
        out.append("    " + ", ".join(f'"{k}" -> {v}L' for k, v in chunk) + ",")
    print("// ---- baselineShuffle ----")
    print("\n".join(out).rstrip(","))
else:
    print("// no shuffle_write maps in all runs -> baselineShuffle unchanged",
          file=sys.stderr)
