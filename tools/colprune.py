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
   stage evaluates the intersect over every candidate pair (~247M at
   x64, both kB-sized trigram lists in flight per pair — the r15
   spill wall; a postings/unnest restatement is no better, because
   Sum(|grams|) over 247M pairs is ~1e11 joined rows). The winning
   observation: `len(list_intersect(a, b))` is a function of the two
   LISTS, not the doc ids — and a stress corpus of exact siblings
   (like any crawl with duplicates, which is the point of a dedup
   operator) has far fewer DISTINCT gram lists than docs. So: group
   docs by their exact grams list, map every doc to the minimal
   representative doc with the identical list, evaluate the intersect
   once per distinct (rep, rep) candidate pair, and join the scalar
   back. Equivalence is unconditional: rep-mapping is 1:1 per doc
   (grouped on exact list equality), ga.grams(rep(ia)) == ga.grams(ia)
   verbatim, and lang/na/nb still come from the doc's OWN row. With
   all-distinct docs it degrades to exactly the stated work — never
   worse, and at x64 it turns 247M intersects into ~60k. The
   size-ratio prune and Jaccard predicate keep their stated text over
   the same (na, nb, inter) triples.

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
    """Apply both IVF column-prune rewrites — SCOPED to oracles whose
    codebook is the dynamic sqrt(N)-sized one (q132's ~358 cells at
    x64, the only chain whose assignment stages are actually a scale
    wall). The fixed IvfK=16 chains (q108/q193/q197/q205/q214/q221 and
    the ANN ladder) never needed the prune, and rewriting them only
    invalidates their content-addressed whole-oracle builds — at x64
    the composed-daily rebuild is hours of DuckDB the cache already
    paid (the r16 q197 rebuild OOM'd where its cached r15 build was
    fine). A no-op rewrite with a real cache cost is a net harm."""
    if "ceil(sqrt(count(*)" not in sql:
        return sql
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

JACCARD_RESTATED = """grep AS (SELECT min(doc_id) AS rep_id, grams
        FROM g GROUP BY grams),
rmap AS (SELECT g.doc_id, g.lang, len(g.grams) AS n, r.rep_id
         FROM g JOIN grep r ON g.grams = r.grams),
prp AS (SELECT DISTINCT ma.rep_id AS ra, mb.rep_id AS rb
        FROM cand JOIN rmap ma ON cand.ia = ma.doc_id
                  JOIN rmap mb ON cand.ib = mb.doc_id),
icr AS (SELECT prp.ra, prp.rb,
          len(list_intersect(ga.grams, gb.grams)) * 1.0 AS inter
        FROM prp JOIN g ga ON prp.ra = ga.doc_id
                 JOIN g gb ON prp.rb = gb.doc_id),
p AS (SELECT ma.lang, icr.inter, ma.n AS na, mb.n AS nb
      FROM cand JOIN rmap ma ON cand.ia = ma.doc_id
                JOIN rmap mb ON cand.ib = mb.doc_id
                JOIN icr ON icr.ra = ma.rep_id AND icr.rb = mb.rep_id
      WHERE ma.n > 0
       AND least(ma.n, mb.n) * 2
       >= greatest(ma.n, mb.n))"""


def prune_jaccard(sql):
    """Apply the representative-pair restatement. Guarded: only fires
    when the stated block is present verbatim and none of the
    introduced CTE names collide."""
    if JACCARD_STATED not in sql:
        return sql
    if re.search(r"\b(grep|rmap|prp|icr) AS \(", sql):
        return sql
    return sql.replace(JACCARD_STATED, JACCARD_RESTATED)


def prune(sql):
    return prune_jaccard(prune_ivf(sql))
