import duckdb, json, sys, glob, os
import pandas as pd


# Knife-edge fallback: round(x, 6)+string-compare already tolerates
# ~1e-6 float drift EXCEPT when the true value sits exactly on a 6dp
# round-half boundary, where two engines' accumulation orders
# legitimately round opposite ways (seen at stress scale: an avg of
# 2000 4dp cosines landing exactly on .xxxxx95). Re-align rows on the
# non-float columns (stable under the knife edge, unlike the float
# sort keys) and accept ONLY if every float cell agrees within
# 1e-6 + 1e-9*|value| (atol + rtol — see the inline rationale) and
# every other cell is string-equal — strictly narrower than the
# rounding tolerance the comparator already grants off-boundary.
# Returns the max observed float delta on acceptance, None on reject
# (so the caller can log tolerance creep).
def tol_equal(sdf, ddf):
    fcols = [c for c in sdf.columns if sdf[c].dtype.kind == 'f']
    kcols = [c for c in sdf.columns if c not in fcols]
    # Structural conservatism: the re-alignment is only sound when
    # there ARE non-float columns to align on — sorting by the float
    # columns themselves is exactly what the knife edge destabilizes.
    # All-float frames stay BAD.
    if not kcols or not fcols:
        return None
    # Both engines must agree the column is float-typed; a spark-float
    # vs duck-int dtype drift ('1.0' vs '1') was BAD under the strict
    # comparator and must stay BAD here.
    for c in fcols:
        if ddf[c].dtype.kind != 'f':
            return None
    def snorm(df):
        df = df.copy()
        for c in kcols:
            df[c] = df[c].astype(str)
        # Secondary sort on the 6dp-ROUNDED floats (r15 advisory):
        # with non-unique key columns, key-only sorting pairs
        # duplicate-key rows in each engine's arbitrary output order,
        # falsely rejecting legitimately-within-1e-6 frames. Rounding
        # keeps the secondary keys stable off the knife edge; ON the
        # knife edge a duplicate-key frame can still misalign and
        # reject — the conservative direction, same as before.
        order = list(kcols)
        for c in fcols:
            df["_r6_" + c] = df[c].round(6)
            order.append("_r6_" + c)
        return df.sort_values(order).reset_index(drop=True)
    x, y = snorm(sdf), snorm(ddf)
    if not x[kcols].equals(y[kcols]):
        return None
    maxd = 0.0
    for c in fcols:
        dx = (x[c] - y[c]).abs()
        # atol + rtol, numpy.isclose-style. The absolute 1e-6 term is
        # the original knife-edge grant; the 1e-9 RELATIVE term exists
        # for large-magnitude aggregates, where absolute 1e-6 demands
        # more agreement than float64 summation can deliver: q58's x64
        # sum of ~6e7 Jaccard addends is ~3.6e7, so 1e-6 absolute asks
        # the two engines' different accumulation orders to agree to
        # 13.5 significant digits (observed cross-engine noise: ~1e-4
        # absolute = 3e-12 relative). rtol=1e-9 still requires 9
        # significant digits — far below any real divergence (test 4's
        # 1e-5-relative drift stays rejected) and above worst-case
        # linear accumulation error n*eps only for n >~ 1e7 sums whose
        # per-element error is already random-walk cancelled.
        tol = 1e-6 + 1e-9 * y[c].abs()
        if not ((dx <= tol) | (x[c].isna() & y[c].isna())).all():
            return None
        m = dx.max()
        if pd.notna(m):
            maxd = max(maxd, float(m))
    return maxd


def main():
    outdir = sys.argv[1]; sfdir = sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    # optional resource caps for stress-scale sweeps (unset = DuckDB
    # defaults, i.e. the driver-gate behavior is unchanged)
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads TO {int(os.environ['DUCKDB_THREADS'])}")
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    ok, bad = [], []
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d): continue
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")], ignore_index=True)
        if name not in oracle:
            ok.append((name, f"rows-only {len(spark_df)}"))
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {e}")); continue
        s = spark_df[sorted(spark_df.columns)]
        dd = duck_df[sorted(duck_df.columns)] if sorted(spark_df.columns)==sorted(duck_df.columns) else None
        if dd is None:
            bad.append((name, f"schema mismatch spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")); continue
        if len(s) != len(dd):
            bad.append((name, f"rowcount spark={len(s)} duck={len(dd)}")); continue
        # normalize: sort rows, stringify with rounding
        def norm(df):
            df = df.copy()
            for c in df.columns:
                if df[c].dtype.kind == 'f': df[c] = df[c].round(6)
                df[c] = df[c].astype(str)
            return df.sort_values(list(df.columns)).reset_index(drop=True)
        a, b = norm(s), norm(dd)
        if a.equals(b): ok.append((name, f"{len(s)} rows"))
        else:
            try: tol = tol_equal(s, dd)
            except Exception: tol = None
            if tol is not None:
                ok.append((name, f"{len(s)} rows (float cells within 1e-6, "
                                 f"max delta {tol:.2e}; 6dp knife-edge)"))
                continue
            diff = (a != b).any(axis=1)
            i = diff.idxmax()
            bad.append((name, f"value mismatch at sorted row {i}: spark={a.loc[i].tolist()} duck={b.loc[i].tolist()}"))
    for n, m in ok: print("OK  ", n, m)
    for n, m in bad: print("BAD ", n, m)
    print(f"\n{len(ok)} ok, {len(bad)} bad")


if __name__ == "__main__":
    main()
