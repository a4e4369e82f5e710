#!/usr/bin/env python3
"""Materialize one CC label table for the stress-scale oracle sweep
(see tools/ccsplice.py for the equivalence argument).

Usage: build_cc_labels.py <sf_dir> <out.parquet> <edge_sql_file> \
           <domain_sql_file>

Evaluates the oracle's own edge/domain SQL in DuckDB, computes
min-label connected components with union-find in Python, writes
(node BIGINT, root BIGINT). Driver-side tooling only.
"""
import sys

import duckdb

import ccsplice

sfdir, out = sys.argv[1], sys.argv[2]
edge_sql = open(sys.argv[3]).read()
domain_sql = open(sys.argv[4]).read()

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
edges = con.execute(edge_sql).fetchall()
nodes = [r[0] for r in con.execute(domain_sql).fetchall()]
labels = ccsplice.union_find_min_labels(nodes, edges)
import pandas as pd  # noqa: E402
lab = pd.DataFrame(sorted(labels.items()), columns=["node", "root"])
lab = lab.astype({"node": "int64", "root": "int64"})
con.register("labdf", lab)
con.execute(f"COPY (SELECT node, root FROM labdf) TO '{out}' "
            "(FORMAT PARQUET)")
print(f"cc_labels: {len(labels)} nodes, {len(edges)} edge rows -> {out}")
