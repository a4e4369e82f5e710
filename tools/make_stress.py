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
# --layout (r16): the warehouse-layout family's rung corpus. Multiply
# ONLY orders + lineitem, shifting BOTH orderkeys by one SHARED stride
# so referential integrity survives (copy k of a lineitem row joins
# copy k of its order) — q212's bucketed orders-lineitem join then
# scales honestly instead of probing an 8x orphan side. l_partkey is
# left unshifted: the z-order probes (q192/q203/q211) range over
# (ok, pk) VALUES, and 8x rows over the same pk domain is exactly the
# densified-cluster case a recluster decision must price.
if "--layout" in sys.argv:
    MULTIPLIED = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
con = duckdb.connect()
shared_stride = None
if "--layout" in sys.argv:
    shared_stride = con.execute(
        f"""SELECT greatest(
              (SELECT max(o_orderkey) FROM
                 read_parquet('{sf_dir}/orders.parquet')),
              (SELECT max(l_orderkey) FROM
                 read_parquet('{sf_dir}/lineitem.parquet'))) + 1"""
    ).fetchone()[0]
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
    stride_src = (str(shared_stride) if shared_stride is not None
                  else f"(SELECT max({key}) + 1 FROM read_parquet('{src}'))")
    con.execute(f"""
        COPY (
          SELECT {proj}
          FROM read_parquet('{src}'),
               (SELECT {stride_src} AS stride) s,
               range({mult}) k
        ) TO '{dst}' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
    print(f"x{mult}    {t}: {n} rows")
