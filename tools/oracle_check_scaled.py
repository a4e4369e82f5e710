#!/usr/bin/env python3
"""Per-query oracle check with a timeout — the stress-scale gate.

Usage: python3 tools/oracle_check_scaled.py <verify_out> <sf_dir> [timeout_s]

Wraps tools/oracle_check.py one query at a time (a symlinked
single-dump dir per query) so one intractable oracle cannot stall the
whole sweep.

The dedup/CC family's rebuild oracles state their candidate set as an
all-pairs self-join — O(n^2) in DuckDB, which timed every family
member out at x8 in round 11 (19 TIMEOUTS, 0 mismatches). This sweep
now restates that ONE join as the equivalent band-keyed equi-join
(see tools/build_cand1.py: the r=1 candidate superset is materialized
once per sweep from the oracles' own signature CTEs, and each query's
WHERE predicate still re-verifies its exact banding over it), leaving
every other character of every oracle untouched. A TIMEOUT therefore
still means "oracle too expensive at this scale", never "engine
wrong"; a BAD is a real scale-sensitivity bug.

Driver-side tooling only, like oracle_check.py.
"""
import json
import os
import shutil
import subprocess
import sys

src, sf = sys.argv[1], sys.argv[2]
limit = float(sys.argv[3]) if len(sys.argv) > 3 else 90.0
work = src.rstrip("/") + "_one"
names = sorted(d for d in os.listdir(src)
               if os.path.isdir(os.path.join(src, d)))
here = os.path.dirname(os.path.abspath(__file__))
oracle = json.load(open(os.path.join(src, "oracle_sql.json")))

# ---- the all-pairs -> banded-equi-join restatement (one join source,
# ---- predicates untouched; see module docstring) ----
MARKER = "FROM sig a JOIN sig b ON a.doc_id < b.doc_id"
cand1 = None
if any(MARKER in oracle.get(n, "") for n in names):
    cand1 = os.path.abspath(src.rstrip("/") + "_cand1.parquet")
    try:
        r = subprocess.run(
            ["python3", os.path.join(here, "build_cand1.py"),
             os.path.join(src, "oracle_sql.json"), sf, cand1],
            capture_output=True, text=True, timeout=900)
        if r.returncode != 0:
            print(f"cand1 build failed, falling back to all-pairs "
                  f"oracles: {r.stderr[-300:]}", flush=True)
            cand1 = None
        else:
            print(r.stdout.strip(), flush=True)
    except subprocess.TimeoutExpired:
        print("cand1 build timed out, falling back to all-pairs oracles",
              flush=True)
        cand1 = None


def rewritten(sql: str) -> str:
    if cand1 is None or MARKER not in sql:
        return sql
    return sql.replace(
        MARKER,
        f"FROM (SELECT ia, ib FROM read_parquet('{cand1}')) c "
        "JOIN sig a ON a.doc_id = c.ia "
        "JOIN sig b ON b.doc_id = c.ib")


ok, bad, timeout = [], [], []
for n in names:
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    os.symlink(os.path.abspath(os.path.join(src, n)),
               os.path.join(work, n))
    with open(os.path.join(work, "oracle_sql.json"), "w") as f:
        json.dump({k: rewritten(v) for k, v in oracle.items()}, f)
    try:
        r = subprocess.run(
            ["python3", os.path.join(here, "oracle_check.py"), work, sf],
            capture_output=True, text=True, timeout=limit)
        lines = [l for l in r.stdout.splitlines() if n in l]
        if any(l.startswith("OK") for l in lines):
            ok.append(n)
            print(f"OK   {n}", flush=True)
        else:
            bad.append(n)
            print(f"BAD  {n}  {(lines or [r.stdout[-200:]])[0]}", flush=True)
    except subprocess.TimeoutExpired:
        timeout.append(n)
        print(f"TIME {n}  (oracle exceeded {limit:.0f}s — see docstring)",
              flush=True)
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({"ok": len(ok), "bad": bad, "timeout": timeout}))
sys.exit(1 if bad else 0)
