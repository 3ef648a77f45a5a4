"""API parity audit vs the reference's distribution inventory.

Scans ``/root/reference/stan/math/prim/{scal,mat,arr}/prob`` and requires a
same-named callable in ``math_tpu.dists`` for every public density/cdf/rng
(including deprecated ``*_log`` aliases).  The structural analog of the
reference's own meta-QA layer (SURVEY.md §4.6).
"""

import os

import pytest

import math_tpu.dists as d

REF = "/root/reference/stan/math/prim"


def _reference_functions():
    fns = set()
    for sub in ("scal/prob", "mat/prob", "arr/prob"):
        p = os.path.join(REF, sub)
        if os.path.isdir(p):
            fns.update(f[:-4] for f in os.listdir(p) if f.endswith(".hpp"))
    return sorted(fns)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_all_reference_prob_functions_exist():
    missing = [f for f in _reference_functions() if not callable(getattr(d, f, None))]
    assert not missing, f"missing {len(missing)}: {missing}"
