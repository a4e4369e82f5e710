#!/usr/bin/env python3
"""Per-query oracle check with a timeout — the stress-scale gate.

Usage: python3 tools/oracle_check_scaled.py <verify_out> <sf_dir> [timeout_s]

Wraps tools/oracle_check.py one query at a time (a symlinked
single-dump dir per query) so one intractable oracle cannot stall the
whole sweep. Exists because the full-rebuild dedup/CC oracles (banded
self-joins + recursive-CTE connected components) are superlinear in
DuckDB: at x8 corpus scale each grinds >10 minutes while every other
oracle answers in seconds. A TIMEOUT therefore means "oracle too
expensive at this scale", never "engine wrong" — those queries stay
proven at the driver's sf0.01 gate; a BAD here is a real
scale-sensitivity bug.

Round-11 reference result on /tmp/stress_x8: 196/215 OK, 0 BAD,
19 timeouts (all in the rebuild-oracle class). Driver-side tooling
only, like oracle_check.py.
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
ok, bad, timeout = [], [], []
for n in names:
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    os.symlink(os.path.abspath(os.path.join(src, n)),
               os.path.join(work, n))
    shutil.copy(os.path.join(src, "oracle_sql.json"), work)
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
