#!/usr/bin/env python3
"""Build the x8/x64 stress corpora used by BENCH_NOTES' scaling rungs.

Usage: python3 tools/make_stress.py <sf_dir> <out_dir> <mult>

Copies every sf table verbatim except documents / embeddings / part,
which are replaced by <mult> exact copies with shifted ids (stride =
max(id)+1) — the crawl-shaped worst case where every item has mult-1
exact siblings. Matches the construction documented in BENCH_NOTES
"r8 64x stress rungs".

Driver-side tooling only (duckdb), not part of the library.
"""
import duckdb, os, shutil, sys

sf_dir, out_dir, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out_dir, exist_ok=True)
MULTIPLIED = {"documents": "doc_id", "embeddings": "vec_id", "part": "p_partkey"}
# --with-facts (v2 corpora): also multiply the fact tables, for rungs
# of events/lineitem-grain operators (q183 PSI, q184 z-order, ...).
# Off by default so the documented r8/r9 rung corpora stay exactly
# reproducible. NOTE: shifted l_orderkey/event_id break joins against
# the UN-multiplied orders/customer dims — v2 dirs are for
# fact-table-local rungs only.
if "--with-facts" in sys.argv:
    MULTIPLIED = dict(MULTIPLIED,
                      events="event_id", lineitem="l_orderkey")
con = duckdb.connect()
for f in sorted(os.listdir(sf_dir)):
    if not f.endswith(".parquet"):
        continue
    t = f[: -len(".parquet")]
    src, dst = os.path.join(sf_dir, f), os.path.join(out_dir, f)
    if t not in MULTIPLIED:
        shutil.copyfile(src, dst)
        print(f"copied  {t}")
        continue
    key = MULTIPLIED[t]
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
    proj = ", ".join(
        f"CAST({c} + k.range * s.stride AS BIGINT) AS {c}" if c == key else c
        for c in cols)
    con.execute(f"""
        COPY (
          SELECT {proj}
          FROM read_parquet('{src}'),
               (SELECT max({key}) + 1 AS stride
                FROM read_parquet('{src}')) s,
               range({mult}) k
        ) TO '{dst}' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
    print(f"x{mult}    {t}: {n} rows")
