#!/usr/bin/env python3
"""Set-preserving column-prune restatements for the two remaining
x64 oracle walls (r15 diagnosis, BENCH_NOTES):

1. IVF assignment stages (q132_semantic_dedup; also matches the
   cheaper IvfK-sized stages of q108/q193/q197/q214). The stated
   k-means iteration ranks every (vector, cell) pair with a window —
   and CARRIES the full 64-double vector list through that window
   sort (~27 GB per stage at x64's 128k vectors x ~358 cells). The
   restatement projects the window input to (vec_id, cell, ccos) and
   re-joins the vector table for the winners only. Equivalence:
   vec_id is the vector table's key (one row per vec_id at every
   scale by construction), so the join-back is 1:1 and attaches
   exactly the v/nrm the stated form carried; the rank expression,
   tie-break and rc filter are verbatim.

2. q58_ngram_jaccard's per-pair `list_intersect`. The stated scored
   stage materializes both kB-sized trigram lists per candidate pair
   (~247M pairs at x64). The restatement counts shared grams
   relationally: explode grams once per doc into (doc_id, gram)
   postings and count matches per candidate pair via a gram-keyed
   equi-join — the classic unnest form. Equivalence: the gram lists
   are `list_distinct(...)` sets (guarded below), so each shared gram
   contributes exactly one joined row and count(*) == len(
   list_intersect(...)); pairs with an empty intersection get 0 via
   the LEFT JOIN + coalesce, exactly the stated len() == 0. The
   size-ratio prune and Jaccard predicate keep their stated text,
   evaluated on the same (na, nb, inter) triples. The intersection
   join runs over DISTINCT candidate pairs, so the rewrite is
   insensitive to (impossible-by-construction, but cheap to not
   assume) duplicate candidates.

Both are text rewrites only — no materialization — so the whole-
oracle memoization tail picks them up unchanged. tools/
restatement_check.py proves stated == restated end-to-end at small
SF for every query the rewrites touch, the standing gate.

Driver-side tooling only, like oracle_check.py.
"""
import re

# ---------------------------------------------------------------------
# 1. IVF assignment stages
# ---------------------------------------------------------------------

# k-means iteration stage: `<name> AS (SELECT cell, v, row_number()
# ... FROM (SELECT <src>.vec_id, <src>.v, c.cell, <ccos> FROM <src>,
# <prev> c))`. Whitespace is matched exactly as generated (a drifted
# oracle simply stops matching and stays stated — never mis-spliced).
KMEANS_RE = re.compile(
    r"(\w+) AS \(\n"
    r"  SELECT cell, v,\n"
    r"    row_number\(\) OVER \(PARTITION BY vec_id\n"
    r"      ORDER BY ccos DESC, cell ASC\) AS rc\n"
    r"  FROM \(SELECT (\w+)\.vec_id, \2\.v, c\.cell,\n"
    r"          round\(list_dot_product\(c\.cv, \2\.v\)\n"
    r"            / \(sqrt\(list_dot_product\(c\.cv, c\.cv\)\) \* \2\.nrm\), 4\)\n"
    r"            AS ccos\n"
    r"        FROM \2, (\w+) c\)\)")


def _kmeans_repl(m):
    name, src, prev = m.group(1), m.group(2), m.group(3)
    return (
        f"{name} AS (\n"
        f"  SELECT w.cell, {src}.v, w.rc\n"
        f"  FROM (SELECT vec_id, cell,\n"
        f"    row_number() OVER (PARTITION BY vec_id\n"
        f"      ORDER BY ccos DESC, cell ASC) AS rc\n"
        f"  FROM (SELECT {src}.vec_id, c.cell,\n"
        f"          round(list_dot_product(c.cv, {src}.v)\n"
        f"            / (sqrt(list_dot_product(c.cv, c.cv)) * {src}.nrm), 4)\n"
        f"            AS ccos\n"
        f"        FROM {src}, {prev} c)) w\n"
        f"  JOIN {src} ON {src}.vec_id = w.vec_id)")


# q132's final assignment: sc carries (v, nrm) through the rk window;
# asg re-projects after rc = 1. One three-CTE unit.
ASSIGN_STATED = """sc AS (SELECT vec_id, v, nrm, cell,
         round(list_dot_product(cv, v) / (cn * nrm), 4) AS ccos
       FROM n, cb),
rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         ORDER BY ccos DESC, cell ASC) AS rc FROM sc),
asg AS (SELECT vec_id, v, nrm, cell, ccos FROM rk WHERE rc = 1),"""

ASSIGN_RESTATED = """sc AS (SELECT vec_id, cell,
         round(list_dot_product(cv, v) / (cn * nrm), 4) AS ccos
       FROM n, cb),
rk AS (SELECT vec_id, cell, ccos, row_number() OVER (PARTITION BY vec_id
         ORDER BY ccos DESC, cell ASC) AS rc FROM sc),
asg AS (SELECT rk.vec_id, n.v, n.nrm, rk.cell, rk.ccos
        FROM rk JOIN n ON n.vec_id = rk.vec_id WHERE rk.rc = 1),"""


def prune_ivf(sql):
    """Apply both IVF column-prune rewrites (no-ops where absent)."""
    sql = KMEANS_RE.sub(_kmeans_repl, sql)
    return sql.replace(ASSIGN_STATED, ASSIGN_RESTATED)


# ---------------------------------------------------------------------
# 2. q58 postings restatement
# ---------------------------------------------------------------------

JACCARD_STATED = """p AS (
  SELECT ga.lang, len(list_intersect(ga.grams, gb.grams)) * 1.0 AS inter,
    len(ga.grams) AS na, len(gb.grams) AS nb
  FROM cand JOIN g ga ON cand.ia = ga.doc_id
            JOIN g gb ON cand.ib = gb.doc_id
  WHERE len(ga.grams) > 0
   AND least(len(ga.grams), len(gb.grams)) * 2
       >= greatest(len(ga.grams), len(gb.grams)))"""

JACCARD_RESTATED = """gsz AS (SELECT doc_id, lang, len(grams) AS n FROM g),
pf AS (
  SELECT cand.ia, cand.ib, ga.lang, ga.n AS na, gb.n AS nb
  FROM cand JOIN gsz ga ON cand.ia = ga.doc_id
            JOIN gsz gb ON cand.ib = gb.doc_id
  WHERE ga.n > 0
   AND least(ga.n, gb.n) * 2
       >= greatest(ga.n, gb.n)),
gp AS (SELECT doc_id, unnest(grams) AS gram FROM g),
ic AS (
  SELECT pfd.ia, pfd.ib, count(*) AS inter
  FROM (SELECT DISTINCT ia, ib FROM pf) pfd
  JOIN gp pa ON pa.doc_id = pfd.ia
  JOIN gp pb ON pb.doc_id = pfd.ib AND pb.gram = pa.gram
  GROUP BY 1, 2),
p AS (
  SELECT pf.lang, coalesce(ic.inter, 0) * 1.0 AS inter, pf.na, pf.nb
  FROM pf LEFT JOIN ic ON ic.ia = pf.ia AND ic.ib = pf.ib)"""


def prune_jaccard(sql):
    """Apply the postings restatement. Guarded: only fires when the
    stated block is present verbatim, the gram lists are built with
    list_distinct (set semantics are what make count(*) == len(
    list_intersect)), and none of the introduced CTE names collide."""
    if JACCARD_STATED not in sql:
        return sql
    if "list_distinct(" not in sql:
        return sql
    if re.search(r"\b(gsz|pf|gp|ic|pfd) AS \(", sql):
        return sql
    return sql.replace(JACCARD_STATED, JACCARD_RESTATED)


def prune(sql):
    return prune_jaccard(prune_ivf(sql))
