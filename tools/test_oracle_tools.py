#!/usr/bin/env python3
"""Unit tests for the oracle-comparator edges (run: python3 tools/test_oracle_tools.py).

Covers the r14 verdict nit and the r14 advisory on tol_equal:
  1. all-float frames must NOT be accepted by the knife-edge fallback
     (no non-float alignment columns -> the re-sort is itself unstable);
  2. a spark-float vs duck-int dtype drift must stay rejected even when
     numerically equal ('1.0' vs '1' was BAD under the strict comparator);
  3. the genuine 6dp round-half knife edge IS accepted and the max
     delta is reported;
  4. a real value divergence (> 1e-6 + 1e-9*|v|) is rejected, while
     large-magnitude summation-order noise within the relative term
     is accepted (q58's x64 sum, r16);
  5. key-column misalignment is rejected.

Driver-side tooling only, like oracle_check.py.
"""
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import tol_equal  # noqa: E402

fails = []


def check(name, cond):
    print(("PASS " if cond else "FAIL ") + name)
    if not cond:
        fails.append(name)


# 1. all-float edge: no alignment columns -> must reject
s = pd.DataFrame({"a": [0.1234565, 2.0], "b": [1.5, 2.5]})
d = pd.DataFrame({"a": [0.1234575, 2.0], "b": [1.5, 2.5]})
check("all-float frame rejected", tol_equal(s, d) is None)

# 1b. all-key (no float columns) -> must also reject (nothing for the
# fallback to do; the strict comparator is the only authority)
s = pd.DataFrame({"k": ["x", "y"]})
check("no-float frame rejected", tol_equal(s, s.copy()) is None)

# 2. dtype drift: spark float vs duck int, numerically equal -> reject
s = pd.DataFrame({"k": ["x", "y"], "v": [1.0, 2.0]})
d = pd.DataFrame({"k": ["x", "y"], "v": [1, 2]})
check("spark-float/duck-int drift rejected", tol_equal(s, d) is None)

# 3. the genuine knife edge: same keys, floats within 1e-6 -> accept,
# and the returned max delta is the observed one
s = pd.DataFrame({"k": ["x", "y"], "v": [0.26245950, 1.0]})
d = pd.DataFrame({"k": ["y", "x"], "v": [1.0, 0.26245955]})
r = tol_equal(s, d)
check("6dp knife edge accepted", r is not None and 4e-8 < r < 6e-8)

# 3b. NaN agreement counts as equal
s = pd.DataFrame({"k": ["x", "y"], "v": [float("nan"), 1.0]})
d = pd.DataFrame({"k": ["x", "y"], "v": [float("nan"), 1.0]})
check("aligned NaNs accepted", tol_equal(s, d) is not None)

# 4. real divergence beyond 1e-6 -> reject
s = pd.DataFrame({"k": ["x", "y"], "v": [0.262459, 1.0]})
d = pd.DataFrame({"k": ["x", "y"], "v": [0.262482, 1.0]})
check("1e-5 divergence rejected", tol_equal(s, d) is None)

# 4b. large-magnitude summation-order noise (q58's x64 shape): a
# 1e-4 absolute delta on a ~3.6e7 sum is 3e-12 RELATIVE — accept
s = pd.DataFrame({"k": ["en"], "n": [60648096], "v": [36463655.0174]})
d = pd.DataFrame({"k": ["en"], "n": [60648096], "v": [36463655.0173]})
check("large-sum 3e-12-relative noise accepted", tol_equal(s, d) is not None)

# 4c. ...but a relative drift beyond 1e-9 on the same magnitude is a
# real divergence and must stay rejected (here 1.4e-7 relative)
s = pd.DataFrame({"k": ["en"], "n": [60648096], "v": [36463655.0]})
d = pd.DataFrame({"k": ["en"], "n": [60648096], "v": [36463660.0]})
check("large-sum 1e-7-relative drift rejected", tol_equal(s, d) is None)

# 5. key misalignment (different key multisets) -> reject
s = pd.DataFrame({"k": ["x", "y"], "v": [1.0, 2.0]})
d = pd.DataFrame({"k": ["x", "z"], "v": [1.0, 2.0]})
check("key misalignment rejected", tol_equal(s, d) is None)

# 6. duplicate-key frames (r15 advisory): rows sharing the key column
# pair by the 6dp-rounded float secondary sort, so a within-1e-6 frame
# whose engines emit duplicate-key rows in opposite orders is accepted
s = pd.DataFrame({"k": ["x", "x", "y"], "v": [1.0, 2.0, 3.0]})
d = pd.DataFrame({"k": ["x", "x", "y"], "v": [2.0, 1.0, 3.0]})
check("duplicate-key reorder accepted", tol_equal(s, d) is not None)

# 6b. ...including sub-1e-6 drift on the duplicated rows
s = pd.DataFrame({"k": ["x", "x"], "v": [1.00000001, 2.00000002]})
d = pd.DataFrame({"k": ["x", "x"], "v": [2.0, 1.0]})
r = tol_equal(s, d)
check("duplicate-key drifted accepted", r is not None and r < 1e-6)

# 6c. a real divergence hidden among duplicate keys must STAY rejected
s = pd.DataFrame({"k": ["x", "x"], "v": [1.0, 2.0]})
d = pd.DataFrame({"k": ["x", "x"], "v": [1.0, 2.5]})
check("duplicate-key divergence rejected", tol_equal(s, d) is None)

# ---- colprune (r16): guards and prefixed-variant generality ----
import colprune  # noqa: E402

# 7. the jaccard rewrite fires on the stated block and keeps the
# size-ratio prune + per-doc lang/n semantics in the rewritten p
fired = colprune.prune_jaccard("WITH x AS (SELECT 1),\n"
                               + colprune.JACCARD_STATED + "\nSELECT 1")
check("jaccard rep-pair rewrite fires",
      "GROUP BY grams" in fired and "icr.ra = ma.rep_id" in fired
      and "least(ma.n, mb.n) * 2" in fired)

# 7b. ...but NOT when an introduced CTE name already exists
collide = ("WITH rmap AS (SELECT 1)\n" + colprune.JACCARD_STATED)
check("jaccard guard: name collision -> stated",
      colprune.prune_jaccard(collide) == collide)

# 8. the k-means stage prune handles the PREFIXED naming variant and
# preserves the stated inner scoring text verbatim — but ONLY inside a
# dynamic-k (sqrt-sized codebook) oracle; fixed-IvfK chains stay
# stated so their content-addressed whole-oracle builds stay cached
pfx = """c0 AS (SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM n2),
rs1 AS (
  SELECT cell, v,
    row_number() OVER (PARTITION BY vec_id
      ORDER BY ccos DESC, cell ASC) AS rc
  FROM (SELECT n2.vec_id, n2.v, c.cell,
          round(list_dot_product(c.cv, n2.v)
            / (sqrt(list_dot_product(c.cv, c.cv)) * n2.nrm), 4)
            AS ccos
        FROM n2, rc0 c))"""
out = colprune.prune_ivf(pfx)
check("kmeans prune rewrites the prefixed variant",
      "JOIN n2 ON n2.vec_id = w.vec_id" in out
      and "FROM n2, rc0 c" in out and out != pfx)
# 8b. the same stage WITHOUT the dynamic-k marker stays stated
fixed_k = pfx.split("\n", 1)[1]
check("fixed-IvfK chain stays stated (cache-preserving scope)",
      colprune.prune_ivf(fixed_k) == fixed_k)

# ---- hopsplice (r16): chain detection, build threading, fallback ----
import hopsplice  # noqa: E402

HOP_SQL = """WITH nv AS (SELECT 1),
nb AS (SELECT * FROM nv),
reB AS (SELECT 1 AS src, 2 AS dst FROM nb),
q AS (SELECT 3 AS qid),
f0 AS (SELECT qid, 1 AS vec_id, 0.5 AS cos FROM q),
g1 AS (
  SELECT DISTINCT f.qid, reB.dst AS vec_id
  FROM f0 f JOIN reB ON f.vec_id = reB.src),
sc1 AS (SELECT qid, vec_id, 0.1 AS cos FROM g1),
f1 AS (SELECT qid, vec_id, cos FROM (SELECT * FROM f0 UNION SELECT * FROM sc1)),
vis AS (SELECT * FROM f0 UNION SELECT * FROM sc1)
SELECT * FROM vis"""

built = []


def fake_mat(bs):
    built.append(bs)
    return f"/fake/p{len(built)}.parquet"


spliced = hopsplice.apply(HOP_SQL, fake_mat)
check("hop chain detected and spliced",
      spliced != HOP_SQL
      and "f0 AS (SELECT * FROM read_parquet('/fake/p2.parquet'))" in spliced
      and "sc1 AS (SELECT * FROM read_parquet(" in spliced)
# build order: reB, f0, sc1, f1 — each later build reads the earlier
# stage's parquet, and the f1 build reads BOTH f0 and sc1
check("hop builds thread their parquets",
      len(built) == 4
      and built[0].endswith("SELECT * FROM reB")
      and "read_parquet('/fake/p1.parquet')" in built[1]
      and "read_parquet('/fake/p2.parquet')" in built[2]
      and "read_parquet('/fake/p3.parquet')" in built[3])
# vis and the final SELECT keep their stated text
check("hop splice leaves the consumer stated",
      "vis AS (SELECT * FROM f0 UNION SELECT * FROM sc1)" in spliced)

# 9b. a failed build falls back to the stated text, untouched
check("hop build failure -> stated",
      hopsplice.apply(HOP_SQL, lambda bs: None) == HOP_SQL)

# 9c. no chain -> untouched (never misfires on ordinary oracles)
plain = "WITH a AS (SELECT 1) SELECT * FROM a"
check("no chain -> untouched",
      hopsplice.apply(plain, fake_mat) == plain)

print(f"\n{21 - len(fails)}/21 pass")
sys.exit(1 if fails else 0)
