#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate (dev tool only; the
shipped Scala library does not depend on this).

Usage: python3 tools/verify_local.py [sfdir] [outdir] [oracle_timeout_sec]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run
  2. loads each <outdir>/<name> parquet and runs the matching oracle_sql.json
     entry in DuckDB over <sfdir>'s tables
  3. compares: row count, column names (sorted), and values (rows sorted,
     columns sorted by name) — reports per-query PASS/FAIL with diffs.

With oracle_timeout_sec set (scale probes: a handful of oracles are the
documented all-pairs baselines and are quadratic in DUCKDB even where the
Spark operator is bucketed), an oracle exceeding the budget is interrupted
and reported as TIMEOUT — listed separately, never counted as PASS.
"""
import sys, json, glob, os, threading
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
timeout_sec = float(sys.argv[3]) if len(sys.argv) > 3 else None

def fresh_connection():
    c = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        # driver testdata is one parquet FILE per table; Spark-written scale
        # corpora (tools.ScaleUp) are part-file DIRECTORIES - glob those
        path = f"{sfdir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return c

con = fresh_connection()

class OracleTimeout(Exception):
    pass

def run_oracle(sql):
    """Run oracle SQL; under a timeout budget, interrupt from a watchdog.

    Race closed (r10): the watchdog could fire in the window between the
    query returning and `done.set()`, leaving a pending `con.interrupt()`
    that aborts the NEXT oracle and misreports it as FAIL. The watchdog
    now records that it fired; if it fired, the (possibly poisoned)
    connection is torn down and rebuilt before the next query, and a
    query that actually completed despite a late interrupt is still
    returned as its real result."""
    global con
    if timeout_sec is None:
        return con.sql(sql).df()
    done = threading.Event()
    fired = threading.Event()
    def watchdog():
        if not done.wait(timeout_sec):
            fired.set()
            con.interrupt()
    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        result = con.sql(sql).df()
        return result
    except duckdb.InterruptException:
        raise OracleTimeout()
    finally:
        done.set()
        if fired.is_set():
            # interrupt may still be pending on this connection — rebuild
            con.close()
            con = fresh_connection()

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# VERIFY_ONLY="a b c": restrict the compare to these queries (dev iteration
# on a subset without re-grinding every oracle)
only = set(os.environ.get("VERIFY_ONLY", "").split()) or None
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = []
timeouts = []
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir"); fails.append(name); continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails.append(name); continue
    try:
        ora_df = run_oracle(sql)
    except OracleTimeout:
        print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s budget")
        timeouts.append(name); continue
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails.append(name); continue

    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = ora_df.reindex(sorted(ora_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); fails.append(name); continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fails.append(name); continue
    a = a.sort_values(by=list(a.columns), ignore_index=True) if len(a) else a
    b = b.sort_values(by=list(b.columns), ignore_index=True) if len(b) else b
    # normalize: stringify everything (approximates the driver's value hash)
    astr = a.astype(str); bstr = b.astype(str)
    if astr.equals(bstr):
        print(f"PASS {name} ({len(a)} rows)")
    else:
        diff = (astr != bstr)
        ncell = int(diff.values.sum())
        print(f"FAIL {name}: {ncell} differing cells")
        idx = diff.any(axis=1)
        print("  spark:", astr[idx].head(3).to_dict("records"))
        print("  oracle:", bstr[idx].head(3).to_dict("records"))
        fails.append(name)

npass = len(oracle) - len(fails) - len(timeouts)
print(f"\n{npass}/{len(oracle)} PASS"
      + (f"; ORACLE TIMEOUTS ({len(timeouts)}): {timeouts}" if timeouts else "")
      + (f"; FAILED: {fails}" if fails else ""))
# Machine-readable totals: the single source every round artifact
# (COVERAGE.md, SCALING.md, VERIFY_SF1_r*) must quote — the r9 tally
# drift (141/159 vs 142/160, neither summing) came from hand-copied
# counts across partial reruns. Invariant enforced here: pass+fail+
# timeout == total, always.
totals = {"sfdir": sfdir, "total": len(oracle), "pass": npass,
          "fail": len(fails), "timeout": len(timeouts),
          "failed_names": sorted(fails), "timeout_names": sorted(timeouts)}
if only:
    totals["subset"] = True  # dev-iteration run; not the round tally
assert totals["pass"] + totals["fail"] + totals["timeout"] == totals["total"]
with open(f"{outdir}/verify_totals.json", "w") as f:
    json.dump(totals, f, indent=1)
print("TOTALS " + json.dumps(totals, separators=(",", ":")))
# exit 0 = all pass; 1 = hard fails; 2 = no fails but timeouts occurred
# (a budgeted run where every oracle timed out must NOT look green)
sys.exit(1 if fails else (2 if timeouts else 0))
