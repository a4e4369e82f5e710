#!/usr/bin/env python3
"""Connected-components restatement for the stress-scale oracle sweep.

The dedup-cluster family's rebuild oracles state CC labels as a
recursive transitive closure:

    reach(n, r) AS (SELECT doc_id, doc_id FROM <domain>
                    UNION
                    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.n),
    lab AS (SELECT n AS node, min(r) AS root FROM reach GROUP BY 1)

`reach` materializes EVERY (node, reachable-node) pair — within a
near-duplicate cluster of size c that is Theta(c^2) rows and the
per-iteration join generates Theta(E * c) candidates. At x64 the
corpus carries 64-copy clusters, so one iteration emits ~10^9 rows:
the r13 sweep's CC-class timeouts were exactly this, with the edge
set itself computing fine.

The restatement: evaluate the ORACLE'S OWN edge CTE `e` in DuckDB
(after the cand1/banded join-source swaps; every Jaccard/banding
predicate is the oracle's verbatim), then compute min-label connected
components with a textbook union-find in Python, and splice the
resulting (node, root) table in as `lab`. Equivalence is provable, not
probabilistic: `e` is symmetric by construction (the oracles UNION
both orientations), so "min r reachable from n" IS "min doc_id in n's
component", which is what union-find with min-label election computes;
isolated domain nodes label themselves via the recursion's base row,
mirrored by seeding every domain node as a singleton. The engine has
no hand in any of it — edges come from DuckDB evaluating the oracle's
SQL, labels from an independent algorithm over those edges.

Driver-side tooling only, like oracle_check.py.
"""
import re

IDIOM = re.compile(
    r"reach\(n, r\) AS \(\s*"
    r"SELECT (\w+), \1 FROM (\w+)\s*"
    r"UNION\s*"
    r"SELECT e\.u, reach\.r FROM e JOIN reach ON e\.v = reach\.n\s*\),\s*"
    r"(\w+) AS \(SELECT n AS node, min\(r\) AS root FROM reach GROUP BY 1\)")


def find_cc_site(sql):
    """First remaining reach/lab idiom in `sql`, or None. Returns
    (match, edge_sql, domain_sql): the two extraction SQLs are runnable
    WITH chains built from the idiom's own enclosing scope, verbatim."""
    m = IDIOM.search(sql)
    if m is None:
        return None
    # the chain from the nearest enclosing WITH up to (excluding) the
    # recursive CTE: ends with `e AS (...),` — strip the trailing comma
    start = sql.rfind("WITH ", 0, m.start())
    if start < 0:
        raise ValueError("reach idiom with no enclosing WITH")
    prefix = sql[start:m.start()].rstrip().rstrip(",")
    # RECURSIVE may be the keyword right where the chain starts; with
    # the recursion gone the keyword is harmless, keep the text as-is
    edge_sql = f"{prefix}\nSELECT u, v FROM e"
    domain_sql = f"{prefix}\nSELECT {m.group(1)} AS n FROM {m.group(2)}"
    return m, edge_sql, domain_sql


def splice(sql, m, labels_path):
    """Replace the matched reach+lab pair with a parquet-backed lab."""
    lab_name = m.group(3)
    repl = (f"{lab_name} AS (SELECT node, root FROM "
            f"read_parquet('{labels_path}'))")
    return sql[:m.start()] + repl + sql[m.end():]


def union_find_min_labels(nodes, edges):
    """Min-label connected components: returns {node: min id in its
    component}. Plain union-find with path halving; union by the
    smaller ROOT VALUE so the representative is always the component
    minimum (which makes the final labels exactly `min(r)`)."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            parent[r] = parent.get(parent[r], parent[r])  # halving
            r = parent[r]
        return r

    for n in nodes:
        parent.setdefault(n, n)
    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {n: find(n) for n in parent}
