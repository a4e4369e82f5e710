#!/usr/bin/env python3
"""Materialize one banded-join candidate group (see tools/banded.py).

Usage: build_banded.py <oracle_sql.json> <sf_dir> <out.parquet> \
           <query> <site_index>

Extracts join site <site_index> (0-based, in document order) of
<query>'s oracle SQL and materializes its UNION-of-band-equi-joins
candidate set. The signature CTE prefix is the query's own SQL,
verbatim. Driver-side tooling only.
"""
import duckdb
import json
import sys

import banded

oracle_json, sfdir, out = sys.argv[1], sys.argv[2], sys.argv[3]
qname, site = sys.argv[4], sys.argv[5]
sql = json.load(open(oracle_json))[qname]
if site == "hamming":
    j = banded.find_hamming_join(sql)
    if j is None:
        sys.exit(f"build_banded: {qname} has no Hamming-ball join")
    copy_sql = banded.hamming_build_sql(j, out)
else:
    sites = banded.find_banded_joins(sql)
    if int(site) >= len(sites):
        sys.exit(f"build_banded: {qname} has {len(sites)} banded join "
                 f"sites, asked for #{site}")
    j = sites[int(site)]
    copy_sql = banded.build_sql(j, out)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
con.execute(copy_sql)
n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
print(f"cand_banded[{qname}#{site} {j['table']}]: {n} pairs -> {out}")
