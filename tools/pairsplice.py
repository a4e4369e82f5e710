#!/usr/bin/env python3
"""Memoize the Jaccard-scored `pairs` CTE shared by the minhash-family
oracles.

Every member of the dedup family (q56/q58/q88/q12x/q149/q150/q16x/q174/
q19x/q200/q204/q213/q215 and the composed q197/q221) states the same
expensive kernel: a `pairs AS (...)` CTE that scores ~C(n,2)-scale
candidate pairs (band-restated to the cand1 superset — 247M pairs at
x64) with an exact shingle-set Jaccard. The surrounding query differs;
the kernel text is IDENTICAL across whole sub-families. Evaluating it
once per distinct verbatim prefix and splicing a parquet read back in
is pure memoization — the materialized table IS the result of the
oracle's own SQL, computed by the same DuckDB engine; no restatement,
no equivalence argument needed beyond "same text, same engine, same
input". tools/restatement_check.py still re-verifies the spliced form
equals the stated form end-to-end at small SF.

A site is only spliced when it is provably closed: the prefix chain up
to and including `pairs` is dropped, so if ANY dropped CTE name is
referenced after the pairs CTE (composed oracles re-use names like
`sig` in later embedded blocks under their own WITH scope — the
conservative text check cannot see scope), the site is left as stated.

Driver-side tooling only, like oracle_check.py.
"""
import re

PAIRS_RE = re.compile(r"\bpairs AS \(")
CTE_NAME_RE = re.compile(r"(\w+) AS \(")


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
    """First spliceable `pairs AS (...)` at/after from_idx, or None.

    Returns (with_start, close_idx, build_sql, next_idx):
    - sql[with_start:close_idx+1] is the verbatim WITH chain ending at
      the pairs CTE's close paren,
    - build_sql is that chain + a SELECT * FROM pairs (runnable),
    - next_idx is where to resume scanning if the caller skips/applies.
    Sites whose dropped CTE names leak into the remainder, or whose
    prefix lacks a `cand AS (` (nothing expensive to memoize), return
    to the scan loop rather than splicing.
    """
    m = PAIRS_RE.search(sql, from_idx)
    if m is None:
        return None
    close = _close_paren(sql, m.end() - 1)
    w = sql.rfind("WITH ", 0, m.start())
    nxt = m.end()
    if close < 0 or w < 0:
        return ("skip", nxt)
    prefix = sql[w:close + 1]
    if "cand AS (" not in prefix:
        return ("skip", nxt)
    dropped = [n for n in CTE_NAME_RE.findall(sql[w:m.start()])]
    remainder = sql[close + 1:]
    # `pairs` itself must survive; every other prefix CTE must be dead
    for n in dropped:
        if re.search(rf"\b{re.escape(n)}\b", remainder):
            return ("skip", nxt)
    build_sql = prefix + "\nSELECT * FROM pairs"
    return ("site", w, close, build_sql, nxt)


def splice(sql, w, close, parquet_path):
    """Replace sql[w:close+1] with a parquet-backed pairs CTE. Keeps
    the WITH RECURSIVE keyword if the original chain carried it (a
    later CTE — e.g. the reach recursion — may still need it)."""
    kw = "WITH RECURSIVE" if sql[w:].startswith("WITH RECURSIVE") else "WITH"
    repl = (f"{kw} pairs AS (SELECT * FROM "
            f"read_parquet('{parquet_path}'))")
    return sql[:w] + repl + sql[close + 1:]
