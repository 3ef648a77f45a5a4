#!/usr/bin/env python
"""One-command CI entry: lint + layering + tests + bench smoke.

The analog of the reference's check automation
(ref: runChecks.py:1-30 — cpplint + math-dependencies in one command) and
of its CI stage matrix (ref: Jenkinsfile:155-283 — linting, headers,
unit tests, benches as sequential gated stages).  A CI system calls ONE
of:

    python runchecks.py            # lint + layering + fast unit subset + smoke
    python runchecks.py --all      # ... with the FULL pytest suite (~25-30 min)
    python runchecks.py --no-smoke # skip the sampler smoke (lint/tests only)

Stages (each prints PASS/FAIL; first failure stops the run, like the
Jenkinsfile's gated stages):

  1. lint      — tests/test_style.py (line length / tabs / docstrings;
                 the in-repo cpplint analog) + tests/test_layering.py
                 (import-DAG check, the math-dependencies analog).
  2. imports   — tests/test_self_contained.py: every module imports on its
                 own (the include-what-you-use headers stage).
  3. unit      — fast subset (default) or the full suite (--all).
  4. smoke     — a tiny end-to-end NUTS run on the CPU backend: 8 chains of
                 eight-schools, asserts finite draws + acceptance.  The
                 bench-smoke stage a CI runs per commit; the real TPU
                 benches (bench.py, benches/*) run on hardware rounds.

Runs entirely on the CPU backend (the conftest forces it), so it works in
any CI container without a TPU attached.
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))

FAST_TESTS = [
    # meta-checks are stage 1/2; this is the fast unit gate: one file per
    # layer so a layering regression or API break fails within minutes.
    "tests/test_functional.py",
    "tests/test_transforms.py",
    "tests/test_ops.py",
    "tests/test_dists_continuous.py",
    "tests/test_diagnostics.py",
    "tests/test_nuts.py",
]


def _run(title, argv):
    print(f"--- {title}: {' '.join(argv)}", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(argv, cwd=ROOT)
    dt = time.perf_counter() - t0
    status = "PASS" if r.returncode == 0 else "FAIL"
    print(f"--- {title}: {status} ({dt:.1f}s)", flush=True)
    return r.returncode == 0


def _smoke():
    """Tiny end-to-end sampler run; returns True on success."""
    code = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from math_tpu.infer.sample import sample_nuts
from math_tpu.models import eight_schools

model = eight_schools.make()
res = sample_nuts(model.logp, jax.random.PRNGKey(0), model.dim,
                  num_chains=8, num_warmup=50, num_samples=50, max_depth=6,
                  dtype=jnp.float32)
pos = np.asarray(res.position)
assert pos.shape == (8, 50, model.dim), pos.shape
assert np.isfinite(pos).all(), "non-finite draws"
acc = float(np.asarray(res.stats.accept_prob).mean())
assert 0.4 < acc <= 1.0, f"acceptance {acc}"
print(f"smoke: 8x50 eight-schools draws finite, mean accept {acc:.2f}")
"""
    return _run("smoke", [sys.executable, "-c", code])


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--all", action="store_true",
                    help="run the full pytest suite instead of the fast subset")
    ap.add_argument("--no-smoke", action="store_true",
                    help="skip the end-to-end sampler smoke stage")
    args = ap.parse_args()

    py = [sys.executable, "-m", "pytest", "-x", "-q"]
    stages = [
        ("lint", py + ["tests/test_style.py", "tests/test_layering.py"]),
        ("imports", py + ["tests/test_self_contained.py"]),
        ("unit", py + (["tests/"] if args.all else FAST_TESTS)),
    ]
    for title, argv in stages:
        if not _run(title, argv):
            print(f"runchecks: {title} stage failed", flush=True)
            return 1
    if not args.no_smoke and not _smoke():
        print("runchecks: smoke stage failed", flush=True)
        return 1
    print("runchecks: all stages passed", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
