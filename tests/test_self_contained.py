"""Import self-containedness: the ``%.hpp-test`` analog (SURVEY.md §2.6).

The reference compiles every header standalone to prove it includes what
it uses; here every public subpackage/module must import in a FRESH
interpreter (no reliance on import order or siblings being pre-imported).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODULES = [
    "math_tpu",
    "math_tpu.special",
    "math_tpu.special.bessel",
    "math_tpu.special.hyper",
    "math_tpu.transforms",
    "math_tpu.ops",
    "math_tpu.ops.cholesky",
    "math_tpu.ops.chol_pallas",
    "math_tpu.ops.ode",
    "math_tpu.ops.solve",
    "math_tpu.dists",
    "math_tpu.model",
    "math_tpu.functional",
    "math_tpu.diagnostics",
    "math_tpu.io",
    "math_tpu.infer",
    "math_tpu.parallel",
    "math_tpu.utils.checks",
    "math_tpu.stan",
    "math_tpu.config",
]


@pytest.mark.slow
def test_each_module_imports_standalone():
    # one interpreter per batch of unrelated leaves would hide ordering
    # bugs between them, so import each module in its own process
    code = (
        "import importlib, sys\n"
        "import jax\n"
        'jax.config.update("jax_platforms", "cpu")\n'
        "importlib.import_module(sys.argv[1])\n"
        "print('OK', sys.argv[1])\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    failures = []
    for mod in MODULES:
        r = subprocess.run(
            [sys.executable, "-c", code, mod],
            capture_output=True,
            text=True,
            timeout=300,
            env=env,
        )
        if r.returncode != 0 or f"OK {mod}" not in r.stdout:
            failures.append((mod, r.stderr[-500:]))
    assert not failures, failures
