#!/usr/bin/env python3
"""Memoize the Jaccard-scored `pairs` CTE shared by the minhash-family
oracles.

Every member of the dedup family (q56/q58/q88/q12x/q149/q150/q16x/q174/
q19x/q200/q204/q213/q215 and the composed q197/q221) states the same
expensive kernel: a `pairs AS (...)` CTE that scores ~C(n,2)-scale
candidate pairs (band-restated to the cand1 superset — 247M pairs at
x64) with an exact shingle-set Jaccard. The surrounding query differs;
the kernel text is IDENTICAL across whole sub-families. Evaluating it
once per distinct verbatim (enclosing-prefix + pairs) text and splicing
a parquet read back in is pure memoization — the materialized table IS
the result of the oracle's own SQL, computed by the same DuckDB engine;
no restatement, no equivalence argument needed beyond "same text, same
engine, same input". tools/restatement_check.py still re-verifies the
spliced form equals the stated form end-to-end at small SF.

The splice replaces ONLY the pairs CTE's body; every other CTE in the
chain stays defined verbatim, so downstream references to prefix CTEs
(q150 reads its quality CTE after pairs; q164 re-reads sig) keep
working, and CTEs made unreferenced by the splice (sh/sig/cand in most
of the family) are pruned by DuckDB's optimizer, never evaluated. The
build SQL is the site's own enclosing WITH chain up to and including
pairs — the nearest preceding WITH, which in composed oracles is the
embedded block's own chain, i.e. exactly the scope the pairs CTE
resolves against.

Driver-side tooling only, like oracle_check.py.
"""
import re

# Two memoizable kernel shapes share the mechanics:
# - `pairs AS (...)`: the minhash family's Jaccard-scored candidates
# - `ed AS (...)`: the kNN-graph family's top-k edge set (cand join
#   back to two vector sides + per-src window — tens of GB of join/
#   sort spill at x64, re-derived by q138/q145/q152/q168/q177/q181/
#   q198/q202/q207 and q102's beam arm)
PAIRS_RE = re.compile(r"\b(pairs|ed) AS \(")


def _close_paren(sql, open_idx):
    depth, i = 0, open_idx
    while i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def find_pairs_site(sql, from_idx=0):
    """First memoizable kernel CTE at/after from_idx, or None.

    Returns ("site", name, start, close, build_sql, next_idx) where
    sql[start:close+1] is the full `<name> AS (...)` CTE text and
    build_sql is the runnable enclosing chain + SELECT * FROM <name> —
    or ("skip", next_idx) for sites with nothing expensive to memoize
    (no cand CTE in the enclosing prefix, e.g. an already-spliced
    site's parquet-read body).
    """
    m = PAIRS_RE.search(sql, from_idx)
    if m is None:
        return None
    name = m.group(1)
    close = _close_paren(sql, m.end() - 1)
    w = sql.rfind("WITH ", 0, m.start())
    nxt = m.end()
    if close < 0 or w < 0:
        return ("skip", nxt)
    prefix = sql[w:close + 1]
    if "cand AS (" not in prefix:
        return ("skip", nxt)
    build_sql = prefix + f"\nSELECT * FROM {name}"
    return ("site", name, m.start(), close, build_sql, nxt)


def splice(sql, name, start, close, parquet_path):
    """Replace the kernel CTE's body with a parquet read; the rest of
    the WITH chain — including CTEs the splice leaves unreferenced —
    is untouched."""
    return (sql[:start]
            + f"{name} AS (SELECT * FROM read_parquet('{parquet_path}'))"
            + sql[close + 1:])
