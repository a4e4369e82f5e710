#!/usr/bin/env python3
"""Materialize one memoized `pairs` prefix for the stress-scale oracle
sweep (see tools/pairsplice.py for why this is pure memoization).

Usage: build_pairs.py <sf_dir> <out.parquet> <build_sql_file> [threads]

Runs the verbatim prefix chain (typically sig -> cand over a
materialized candidate superset -> Jaccard-scored pairs) in DuckDB and
writes the pairs CTE's full output. Driver-side tooling only.
"""
import os
import sys

import duckdb

sfdir, out = sys.argv[1], sys.argv[2]
build_sql = open(sys.argv[3]).read()
con = duckdb.connect()
if len(sys.argv) > 4:
    con.execute(f"SET threads TO {int(sys.argv[4])}")
# optional cap so concurrent builds cannot OOM-kill each other
# (unset = DuckDB default, the single-build behavior unchanged)
if os.environ.get("DUCKDB_MEMORY_LIMIT"):
    con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
con.execute(f"COPY ({build_sql}) TO '{out}' (FORMAT PARQUET)")
n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
print(f"materialized {n} rows -> {out}")
