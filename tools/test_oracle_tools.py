#!/usr/bin/env python3
"""Unit tests for the oracle-comparator edges (run: python3 tools/test_oracle_tools.py).

Covers the r14 verdict nit and the r14 advisory on tol_equal:
  1. all-float frames must NOT be accepted by the knife-edge fallback
     (no non-float alignment columns -> the re-sort is itself unstable);
  2. a spark-float vs duck-int dtype drift must stay rejected even when
     numerically equal ('1.0' vs '1' was BAD under the strict comparator);
  3. the genuine 6dp round-half knife edge IS accepted and the max
     delta is reported;
  4. a real value divergence (> 1e-6) is rejected;
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

print(f"\n{10 - len(fails)}/10 pass")
sys.exit(1 if fails else 0)
