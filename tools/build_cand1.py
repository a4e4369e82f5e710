#!/usr/bin/env python3
"""Materialize the r=1 banded MinHash candidate superset for the
stress-scale oracle sweep.

The dedup/CC family's rebuild oracles define their candidate set as
"document pairs agreeing on >= 1 MinHash signature position" and state
it as an all-pairs self-join (`FROM sig a JOIN sig b ON a.doc_id <
b.doc_id WHERE <band predicate>`) — the clearest possible derivation,
but O(n^2) in DuckDB: fine at the driver's sf0.01 gate, >10 minutes
per query at x8 (the 19 round-11 gate timeouts). This script restates
the SAME set as a band-keyed equi-join — explode each signature to
(doc_id, position, value) rows and join on (position, value) — which
is the textbook LSH index form and linear in collisions. It is a pure
reformulation, not a different oracle: "exists i: a.sig[i] = b.sig[i]"
IS the equi-join's match condition, and every coarser banding config
(q164's 4x2 / 2x4 / 1x8) requires agreement on all positions of some
band, hence on >= 1 position — so this set is a SUPERSET for every
family member, and each query's own WHERE predicate still re-verifies
its exact banding over it (oracle_check_scaled.py only swaps the join
SOURCE, never the predicate).

The `sh`/`sig` CTE prefix is extracted verbatim from the family's own
oracle SQL, so the signature definition cannot drift from what the
oracles state.

Usage: build_cand1.py <oracle_sql.json> <sf_dir> <out.parquet> [query]
With no [query], every marker-bearing oracle must share one sig CTE
prefix (the drift guard); with [query], that query's own prefix is
used — the per-group mode oracle_check_scaled drives when the family
legitimately splits into prefix groups (same sig definition, extra
surrounding CTEs).
Driver-side tooling only, like oracle_check.py.
"""
import duckdb
import json
import sys

oracle_json, sfdir, out = sys.argv[1], sys.argv[2], sys.argv[3]
oracle = json.load(open(oracle_json))
MARKER = "FROM sig a JOIN sig b ON a.doc_id < b.doc_id"
srcs = {name: sql for name, sql in oracle.items()
        if MARKER in sql and "cand AS (" in sql}
if not srcs:
    sys.exit("build_cand1: no marker-bearing oracle found")
# Every marker-bearing oracle is rewritten against the SAME cand1
# superset, so they must all define the SAME signature (width, seed,
# shingle rule). If one family member's sig CTE ever drifts, its
# rewritten oracle would silently compute over the wrong candidate
# set and the sweep would report a false BAD that reads as an engine
# bug (advisor find, round 12) — assert identity up front instead.
prefixes = {name: sql[:sql.index("cand AS (")].rstrip().rstrip(",")
            for name, sql in srcs.items()}
if len(sys.argv) > 4:
    # per-group mode: build THIS query's candidate superset from its
    # own prefix (oracle_check_scaled builds one cand1 per distinct
    # prefix group and routes each query to its group's file)
    qname = sys.argv[4]
    if qname not in prefixes:
        sys.exit(f"build_cand1: {qname} is not a marker-bearing oracle")
    prefix = prefixes[qname]
elif len(set(prefixes.values())) != 1:
    by_prefix = {}
    for name, p in prefixes.items():
        by_prefix.setdefault(p, []).append(name)
    sys.exit("build_cand1: marker-bearing oracles disagree on the sig "
             "CTE prefix — one cand1 cannot serve them all; pass a "
             "query name to build per-group. Groups: "
             + "; ".join(sorted(",".join(sorted(g))
                                for g in by_prefix.values())))
else:
    prefix = next(iter(prefixes.values()))

import re

# the signature WIDTH comes from the same extracted SQL as the sig
# definition itself ("[... FOR s IN range(K)]"), so a future K change
# cannot silently shrink the superset and turn the gate's hash
# mismatches into wrong-oracle noise
m = re.search(r"FOR s IN range\((\d+)\)", prefix)
if not m:
    sys.exit("build_cand1: could not find the signature width "
             "('FOR s IN range(K)') in the extracted sig CTE")
k = int(m.group(1))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
con.execute(f"""COPY ({prefix},
  bexp AS (SELECT doc_id, t.range AS band, sig[t.range] AS mh
           FROM sig, range(1, {k + 1}) t)
  SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
  FROM bexp x JOIN bexp y
    ON x.band = y.band AND x.mh = y.mh AND x.doc_id < y.doc_id)
  TO '{out}' (FORMAT PARQUET)""")
n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
print(f"cand1: {n} candidate pairs -> {out}")
