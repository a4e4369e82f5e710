#!/usr/bin/env python3
"""Stated-vs-restated oracle equivalence gate.

Usage: python3 tools/restatement_check.py <verify_out> <sf_dir> [timeout_s]

The x64 sweep (tools/oracle_check_scaled.py) rewrites the intractable
oracle kernels — all-pairs minhash self-joins, OR-of-band-equality LSH
joins, Hamming-ball joins, transitive-closure CC recursions — into
materialized-candidate / union-find forms whose equivalence arguments
live in the rewriting modules' docstrings. Those arguments were
spot-checked in-session when each rewrite landed; THIS tool makes the
check standing and exhaustive: at a small scale factor where the STATED
form is tractable, it runs both the stated and the rewritten SQL for
EVERY rewritten query in DuckDB and asserts identical result sets under
oracle_check.py's own normalization (columns sorted by name, floats
rounded to 6, rows sorted). A NE here means a rewrite changed an
oracle's SET — a bug in the sweep tooling that could mask (or
manufacture) an engine mismatch at x64 — and fails the gate loudly.

Run it at sf0.001 (seconds) or sf0.01 each round before trusting an
x64 sweep that used the same rewrite modules.

Driver-side tooling only, like oracle_check.py.
"""
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

src, sf = sys.argv[1], sys.argv[2]
limit = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
here = os.path.dirname(os.path.abspath(__file__))

stated = json.load(open(os.path.join(src, "oracle_sql.json")))
dump = os.path.join(src, "restated_sql.json")
r = subprocess.run(
    ["python3", os.path.join(here, "oracle_check_scaled.py"),
     src, sf, "90", f"--dump-sql={dump}"],
    capture_output=True, text=True, timeout=3600)
sys.stdout.write(r.stdout)
if r.returncode != 0:
    sys.stderr.write(r.stderr)
    sys.exit(f"--dump-sql run failed ({r.returncode})")
restated = json.load(open(dump))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


eq, ne, err = [], [], []
targets = sorted(n for n in stated if restated.get(n, stated[n]) != stated[n])
print(f"{len(targets)} rewritten oracles to equivalence-check "
      f"(of {len(stated)})", flush=True)
for n in targets:
    try:
        # DuckDB has no per-query timeout; the small-SF stated forms
        # are the tractable ones by construction, so a wall here is a
        # wrong choice of sf_dir, not a class to tolerate.
        a = norm(con.execute(stated[n]).df())
        b = norm(con.execute(restated[n]).df())
    except Exception as e:
        err.append(n)
        print(f"ERR  {n}  {e}", flush=True)
        continue
    if list(a.columns) != list(b.columns):
        ne.append(n)
        print(f"NE   {n}  schema {list(a.columns)} vs {list(b.columns)}",
              flush=True)
    elif len(a) != len(b):
        ne.append(n)
        print(f"NE   {n}  rowcount {len(a)} vs {len(b)}", flush=True)
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        ne.append(n)
        print(f"NE   {n}  first diff at sorted row {i}: "
              f"stated={a.loc[i].tolist()} restated={b.loc[i].tolist()}",
              flush=True)
    else:
        eq.append(n)
        print(f"EQ   {n}  {len(a)} rows", flush=True)

print(json.dumps({"eq": len(eq), "ne": ne, "err": err}))
sys.exit(1 if (ne or err) else 0)
