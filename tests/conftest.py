"""Test configuration: CPU backend with 8 virtual devices + float64.

Mirrors the reference's testing posture (SURVEY.md §4): finite-difference
ground truth needs f64, and "distributed without a cluster" runs on a
virtual device mesh (the analog of `mpirun -np N` on localhost,
ref: runTests.py:115-128).

Must run before any backend initialization, hence the env mutation at
import time.  The axon TPU plugin pins jax_platforms, so we override the
config knob directly as well.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
