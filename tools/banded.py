#!/usr/bin/env python3
"""Shared extraction/rewrite logic for the embedding-LSH banded-join
oracle restatement (the graph/ANN family's analogue of build_cand1).

The kNN-graph family's rebuild oracles state their candidate set as a
self-join whose ON clause is an OR of band equalities over a 60-bit
hyperplane signature:

    FROM b a JOIN b b
      ON (((a.sig >> 0) & 4095) = ((b.sig >> 0) & 4095) OR ... )
     AND a.vec_id != b.vec_id        -- (or < for undirected pairs)

An OR of equalities cannot hash-join, so DuckDB executes this as a
nested loop — O(n^2) pair evaluations, which walled every family
member at x64 (round-13 sweep: zero mismatches, 13 oracle-side
timeouts in this class). The textbook LSH-index restatement is

    UNION over k of (equi-join on band k's value, same inequality)

which is the SAME set, not even a superset: `(A1 OR ... OR Am) AND
ineq` holds for a pair iff the pair appears in at least one band's
equi-join with that inequality. The sweep materializes that union once
per distinct (signature-CTE prefix, table, band arms) group — the
prefix is extracted VERBATIM from the oracle's own SQL, so the
signature definition cannot drift from what the oracle states — and
each query's rewritten form re-verifies the ENTIRE original ON clause
as a WHERE over the materialized pairs. A BAD after this rewrite is a
real engine bug; the rewrite only changes the join's execution
strategy, never its set.

Driver-side tooling only, like oracle_check.py.
"""
import re

# one OR arm: ((a.sig >> S) & M) = ((b.sig >> S) & M)
ARM_RE = re.compile(
    r"\(\(a\.(\w+) >> (\d+)\) & (\d+)\) = \(\(b\.\1 >> \2\) & \3\)")


def find_banded_joins(sql):
    """Yield dicts describing each OR-of-band-equalities self-join.

    Each dict: table, join_start, join_end (the full `FROM T a JOIN T b
    ON <cond>` text span, inequality included), cond (the ON text),
    ineq ('!=' or '<'), key_col (vec_id/doc_id), arms [(col, shift,
    mask)...], prefix (runnable WITH chain defining T, extracted
    verbatim, ending at T's definition close).
    """
    out = []
    for m in re.finditer(r"FROM (\w+) a JOIN \1 b\s+ON ", sql):
        t = m.group(1)
        cond_start = m.end()
        # the ON operand is one balanced paren group (the OR chain),
        # then `AND a.<key> (!=|<) b.<key>`
        depth, i = 0, cond_start
        if sql[i] != "(":
            continue
        while i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        or_chain = sql[cond_start:i + 1]
        arms = ARM_RE.findall(or_chain)
        if not arms:
            continue
        mm = re.match(r"\s+AND a\.(\w+) (!=|<) b\.\1", sql[i + 1:])
        if not mm:
            continue
        join_end = i + 1 + mm.end()
        out.append({
            "table": t,
            "join_start": m.start(),
            "join_end": join_end,
            "cond": sql[cond_start:join_end],
            "ineq": mm.group(2),
            "key_col": mm.group(1),
            "arms": [(c, int(s), int(k)) for (c, s, k) in arms],
            "prefix": _prefix_for(sql, t, m.start()),
        })
    return out


def _prefix_for(sql, table, join_pos):
    """Runnable `WITH ...` chain from the nearest enclosing WITH up to
    and including `table`'s CTE definition — verbatim, so the signature
    definition is exactly what the oracle states. Unreferenced sibling
    CTEs in the chain are never executed (DuckDB plans only reachable
    CTEs), so a chain that happens to include another (expensive) CTE
    costs nothing here."""
    tdef = sql.rfind(f"{table} AS (", 0, join_pos)
    if tdef < 0:
        raise ValueError(f"no CTE definition found for {table}")
    start = sql.rfind("WITH ", 0, tdef)
    if start < 0:
        raise ValueError(f"no WITH before {table}'s definition")
    # T's definition ends at the close of its `... AS sig FROM <src>)`
    e = sql.find(" AS sig FROM", tdef)
    if e < 0 or e > join_pos:
        raise ValueError(f"{table}'s definition has no `AS sig FROM` close")
    e2 = sql.find(")", e)
    return sql[start:e2 + 1]


def group_key(j):
    """Two join sites with the same key share one candidate file."""
    return (j["prefix"], j["table"], tuple(j["arms"]), j["key_col"])


def build_sql(j, out_path):
    """The COPY statement materializing the banded candidate set for
    join site `j` (undirected `ia < ib`; a directed consumer expands
    both orientations at rewrite time)."""
    t, key = j["table"], j["key_col"]
    unions = "\n  UNION\n".join(
        f"  SELECT a.{key} AS ia, b.{key} AS ib FROM {t} a JOIN {t} b"
        f" ON ((a.{col} >> {s}) & {m}) = ((b.{col} >> {s}) & {m})"
        f" AND a.{key} < b.{key}"
        for (col, s, m) in j["arms"])
    return (f"COPY ({j['prefix']},\n cbands AS (\n{unions})\n"
            f" SELECT DISTINCT ia, ib FROM cbands)"
            f" TO '{out_path}' (FORMAT PARQUET)")


def rewrite(sql, j, cand_path):
    """Swap join site `j`'s nested-loop OR join for the materialized
    candidate pairs, re-verifying the ENTIRE original ON clause."""
    t, key = j["table"], j["key_col"]
    if j["ineq"] == "<":
        src = f"SELECT ia, ib FROM read_parquet('{cand_path}')"
    else:  # directed consumer: both orientations of the undirected set
        src = (f"SELECT ia, ib FROM read_parquet('{cand_path}') "
               f"UNION ALL SELECT ib AS ia, ia AS ib "
               f"FROM read_parquet('{cand_path}')")
    repl = (f"FROM ({src}) cband"
            f" JOIN {t} a ON a.{key} = cband.ia"
            f" JOIN {t} b ON b.{key} = cband.ib"
            f" WHERE {j['cond']}")
    return sql[:j["join_start"]] + repl + sql[j["join_end"]:]


# ---------------------------------------------------------------------
# SimHash Hamming-ball self-join (q57's shape): an all-pairs join whose
# WHERE keeps pairs within Hamming distance H of a W-bit signature.
# Pigeonhole restatement: split the W bits into H+1 contiguous bands —
# a pair differing in <= H bits has at least one band with ZERO
# differing bits, so the union of per-band equi-joins is a SUPERSET of
# the Hamming ball; the original bit_count predicate is re-verified
# over it verbatim. This is the classic multi-index Hamming search
# (Norouzi et al.), stated as a join-source swap.
# ---------------------------------------------------------------------

def find_hamming_join(sql):
    """Detect `FROM T a JOIN T b ON a.K < b.K ... WHERE
    bit_count(xor(a.C, b.C)) <= H` with C built over `range(0, W)`.
    Returns None or a dict: table, key_col, sig_col, h, width,
    join_start, join_end (the FROM..ON span), prefix."""
    m = re.search(r"FROM (\w+) a JOIN \1 b ON a\.(\w+) < b\.\2", sql)
    if not m:
        return None
    w = re.search(
        r"bit_count\(xor\(a\.(\w+), b\.\1\)\) <= (\d+)", sql[m.end():])
    if not w:
        return None
    width = re.search(r"range\(0, (\d+)\)", sql[:m.start()])
    if not width:
        return None
    consumer = sql.rfind("SELECT", 0, m.start())
    if consumer < 0:
        return None
    return {
        "table": m.group(1), "key_col": m.group(2),
        "sig_col": w.group(1), "h": int(w.group(2)),
        "width": int(width.group(1)),
        "join_start": m.start(), "join_end": m.end(),
        "prefix": sql[:consumer].rstrip().rstrip(","),
    }


def hamming_group_key(j):
    return (j["prefix"], j["table"], j["sig_col"], j["h"], j["width"])


def hamming_build_sql(j, out_path):
    t, key, sig = j["table"], j["key_col"], j["sig_col"]
    bands = j["h"] + 1
    per = -(-j["width"] // bands)  # ceil
    unions = []
    for k in range(bands):
        lo = k * per
        w = min(per, j["width"] - lo)
        mask = (1 << w) - 1
        unions.append(
            f"  SELECT a.{key} AS ia, b.{key} AS ib FROM {t} a JOIN {t} b"
            f" ON ((a.{sig} >> {lo}) & {mask}) = ((b.{sig} >> {lo}) & {mask})"
            f" AND a.{key} < b.{key}")
    u = "\n  UNION\n".join(unions)
    return (f"COPY ({j['prefix']},\n cbands AS (\n{u})\n"
            f" SELECT DISTINCT ia, ib FROM cbands)"
            f" TO '{out_path}' (FORMAT PARQUET)")


def hamming_rewrite(sql, j, cand_path):
    t, key = j["table"], j["key_col"]
    repl = (f"FROM (SELECT ia, ib FROM read_parquet('{cand_path}')) cband"
            f" JOIN {t} a ON a.{key} = cband.ia"
            f" JOIN {t} b ON b.{key} = cband.ib AND a.{key} < b.{key}")
    return sql[:j["join_start"]] + repl + sql[j["join_end"]:]
